package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5 hash — the codegen'd form of the engine's
  * portable hashing idiom `conv(substring(md5(s), 1, 15), 16, 10)`.
  *
  * The composed form computes the digest, hex-encodes it into a
  * 32-char string, substrings 15 chars, then PARSES them back base-16
  * — three string allocations per value on the hottest loops in the
  * library (shingle fingerprints, simhash token hashing, chunk
  * hashing, decontamination grams). This expression goes digest →
  * long directly: the first 15 hex chars are exactly the top 60 bits
  * of the first 8 digest bytes, i.e. `(first8BytesBigEndian >>> 4)`.
  * Values are BIT-IDENTICAL to the composed form (spec-asserted over
  * the corpus), so DuckDB oracle parity
  * (`('0x'||substr(md5(s),1,15))::BIGINT`) is unaffected.
  */
object NativeHash {

  // interpreted eval can run concurrently across tasks sharing the
  // expression tree — MessageDigest is not thread-safe
  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `md5_hash60(s)`: top 60 bits of md5(s), as a positive long. */
  case class Md5Hash60(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      // any collation (getBytes is collation-independent) and the bare
      // NULL literal (like the composed md5 idiom accepted) are fine
      case _: StringType | NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.simpleString}")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "md5_hash60"

    override protected def nullSafeEval(input: Any): Any =
      top60FromDigest(localMd.get().digest(input.asInstanceOf[UTF8String].getBytes))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }""".stripMargin)
      nullSafeCodeGen(ctx, ev, c => {
        val dg = ctx.freshName("dg")
        s"""
           |byte[] $dg = $md.digest($c.getBytes());
           |${ev.value} = graft.functions.NativeHash.top60FromDigest($dg);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Top 60 bits of the first 8 digest bytes (big-endian), `>>> 4` —
    * exactly the value of parsing the first 15 hex chars. Public +
    * JVM-static-reachable for the generated code. */
  def top60FromDigest(dg: Array[Byte]): Long =
    (((dg(0) & 0xffL) << 56) | ((dg(1) & 0xffL) << 48) |
      ((dg(2) & 0xffL) << 40) | ((dg(3) & 0xffL) << 32) |
      ((dg(4) & 0xffL) << 24) | ((dg(5) & 0xffL) << 16) |
      ((dg(6) & 0xffL) << 8) | (dg(7) & 0xffL)) >>> 4

  def md5Hash60(s: Column): Column =
    GraftBridge.column(Md5Hash60(GraftBridge.expression(s)))
}
