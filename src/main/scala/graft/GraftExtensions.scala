package graft

import graft.functions.NativeVector
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension installer: makes graft's native expressions part
  * of the session's function catalog at build time —
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)        // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * This is the deployment-grade packaging of what `Sql.register` does
  * per session: every session created with the extension sees
  * `vec_dot` / `vec_cosine` in SQL, with Catalyst free to
  * constant-fold them (BinaryExpression is foldable when its children
  * are — no custom Rule needed).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  /** Builders must reject wrong arity themselves — `es.head`/`es(1)`
    * on a wrong-arity call would silently DROP extra arguments (a
    * plausible-looking wrong result) or throw a raw
    * NoSuchElementException instead of an arity error. Raised as
    * Spark's standard WRONG_NUM_ARGS AnalysisException so SQL users
    * see the same error shape as a wrong-arity call to a built-in. */
  private def arity(name: String, n: Int, es: Seq[Expression]): Unit =
    if (es.length != n) throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> s"`$name`",
        "expectedNum" -> n.toString,
        "actualNum" -> es.length.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      info(NativeVector.getClass, "vec_dot",
        "vec_dot(a, b) - double dot product of two float/double arrays"),
      (es: Seq[Expression]) => {
        arity("vec_dot", 2, es); NativeVector.DotProduct(es.head, es(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      info(NativeVector.getClass, "vec_cosine",
        "vec_cosine(a, b) - cosine similarity of two float/double arrays"),
      (es: Seq[Expression]) => {
        arity("vec_cosine", 2, es); NativeVector.CosineSim(es.head, es(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("md5_hash60"),
      info(graft.functions.NativeHash.getClass, "md5_hash60",
        "md5_hash60(s) - top 60 bits of md5(s) as a positive long " +
          "(equals conv(substring(md5(s),1,15),16,10))"),
      (es: Seq[Expression]) => {
        arity("md5_hash60", 1, es); graft.functions.NativeHash.Md5Hash60(es.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("z_interleave16"),
      info(graft.functions.NativeZOrder.getClass, "z_interleave16",
        "z_interleave16(x, y) - Morton interleave of the low 16 bits of " +
          "x (even positions) and y (odd positions)"),
      (es: Seq[Expression]) => {
        arity("z_interleave16", 2, es)
        graft.functions.NativeZOrder.ZInterleave16(es.head, es(1))
      }))
    // the custom as-of join operator (AsofNative.asofJoin also installs
    // this per session via experimental.extraStrategies)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
