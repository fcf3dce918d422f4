package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-math hot path.
  *
  * [[VectorOps]] builds cosine/dot from `zip_with` + `aggregate`, which
  * Catalyst evaluates as *interpreted* lambda calls per element. These
  * expressions generate a primitive Java loop inside whole-stage codegen
  * instead — no per-element boxing, no virtual dispatch — which is the
  * right cost model when scoring millions of candidate pairs.
  *
  * Numerics are deliberately IDENTICAL to [[VectorOps]]: a sequential
  * left-to-right double fold over per-element products, so swapping one
  * implementation for the other is bit-exact (asserted in
  * OperatorsSpec) and DuckDB-oracle parity is unaffected. That identity
  * includes the edge cases: a null element OR a length mismatch yields
  * NULL, exactly like the zip_with form (which null-pads the shorter
  * array and folds the null through).
  */
object NativeVector {

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def checkVecInputs(e: BinaryExpression): TypeCheckResult = {
    val ok = Seq(e.left, e.right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${e.prettyName} requires array<float>/array<double> inputs, " +
        s"got (${e.left.dataType.simpleString}, ${e.right.dataType.simpleString})")
  }

  /** dot(a, b): Σ a_i·b_i in double, sequential fold. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = checkVecInputs(this)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"
    // can return null on length mismatch / null elements even when both
    // inputs are non-null, so never advertise non-nullability
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val (fx, fy) = (elemIsFloat(left), elemIsFloat(right))
      // zip_with null-pads the shorter array and the fold returns NULL
      if (x.numElements() != y.numElements()) return null
      val n = x.numElements()
      var dot = 0.0
      var i = 0
      while (i < n) {
        // a null element yields NULL, matching the zip_with/aggregate form
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xv = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
        dot += xv * yv
        i += 1
      }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val getX = if (elemIsFloat(left)) "getFloat" else "getDouble"
      val getY = if (elemIsFloat(right)) "getFloat" else "getDouble"
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (n, dot, i) = (ctx.freshName("n"), ctx.freshName("dot"), ctx.freshName("i"))
        s"""
           |int $n = $a.numElements();
           |double $dot = 0.0;
           |if ($n != $b.numElements()) { ${ev.isNull} = true; }
           |else for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  $dot += (double) $a.$getX($i) * (double) $b.$getY($i);
           |}
           |${ev.value} = $dot;
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** cosine(a, b) = dot/(‖a‖·‖b‖), all three folds sequential in double
    * over one pass. */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = checkVecInputs(this)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_cosine"
    // see DotProduct.nullable
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val (fx, fy) = (elemIsFloat(left), elemIsFloat(right))
      // zip_with null-pads the shorter array and the fold returns NULL
      if (x.numElements() != y.numElements()) return null
      val n = x.numElements()
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < n) {
        // a null element yields NULL, matching the zip_with/aggregate form
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xv = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
        dot += xv * yv
        na += xv * xv
        nb += yv * yv
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val getX = if (elemIsFloat(left)) "getFloat" else "getDouble"
      val getY = if (elemIsFloat(right)) "getFloat" else "getDouble"
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val i = ctx.freshName("i")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
           |int $n = $a.numElements();
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |if ($n != $b.numElements()) { ${ev.isNull} = true; }
           |else for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  double $xv = (double) $a.$getX($i);
           |  double $yv = (double) $b.$getY($i);
           |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** All LSH band keys of one embedding in ONE codegen loop.
    *
    * The composed form — `bands·rows` separate [[DotProduct]] calls,
    * each carrying a 64-element plane literal — exceeds the JVM/codegen
    * method limits past ~16 planes and silently drops the WHOLE stage
    * to interpreted mode ("Expr codegen error and falling back" —
    * measured 13 s vs ~2 s on the same query). Here the plane matrix
    * rides along as one broadcast reference object and the generated
    * code is a tight nested loop.
    *
    * Semantics are IDENTICAL to the composed form, including its edge
    * cases: a null element or an embedding whose length differs from
    * the planes' dimension made every `when(dot >= 0, 1)` fall to its
    * `otherwise(0)`, so such rows get ALL-ZERO keys (not null). Output:
    * `array<int>` of length `bands`, key_b = Σ_i bit(b·rows+i) << i. */
  case class SignBandKeys(child: Expression, planes: Array[Array[Double]],
      bands: Int, rows: Int) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double> input, got ${other.simpleString}")
    }
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "vec_sign_band_keys"
    require(planes.length >= bands * rows && rows <= 31)

    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
      val n = x.numElements()
      val dim = planes(0).length
      val keys = new Array[Int](bands)
      var zero = n != dim
      var i = 0
      while (!zero && i < n) { if (x.isNullAt(i)) zero = true; i += 1 }
      if (!zero) {
        var h = 0
        while (h < bands * rows) {
          var d = 0.0
          var j = 0
          val p = planes(h)
          while (j < n) {
            d += (if (isFloat) x.getFloat(j).toDouble else x.getDouble(j)) * p(j)
            j += 1
          }
          if (d >= 0) keys(h / rows) |= 1 << (h % rows)
          h += 1
        }
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val get = if (child.dataType.asInstanceOf[ArrayType].elementType == FloatType)
        "getFloat" else "getDouble"
      val pRef = ctx.addReferenceObj("planes", planes, "double[][]")
      nullSafeCodeGen(ctx, ev, a => {
        val (n, keys, zero, h, d, j) = (ctx.freshName("n"), ctx.freshName("keys"),
          ctx.freshName("zero"), ctx.freshName("h"), ctx.freshName("d"), ctx.freshName("j"))
        s"""
           |int $n = $a.numElements();
           |int[] $keys = new int[$bands];
           |boolean $zero = ($n != $pRef[0].length);
           |if (!$zero) for (int $j = 0; $j < $n; $j++)
           |  if ($a.isNullAt($j)) { $zero = true; break; }
           |if (!$zero) for (int $h = 0; $h < ${bands * rows}; $h++) {
           |  double $d = 0.0;
           |  for (int $j = 0; $j < $n; $j++)
           |    $d += (double) $a.$get($j) * $pRef[$h][$j];
           |  if ($d >= 0) $keys[$h / $rows] |= 1 << ($h % $rows);
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  def cosine(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(GraftBridge.expression(a), GraftBridge.expression(b)))

  def signBandKeys(e: Column, planes: Array[Array[Double]],
      bands: Int, rows: Int): Column =
    GraftBridge.column(SignBandKeys(GraftBridge.expression(e), planes, bands, rows))
}
