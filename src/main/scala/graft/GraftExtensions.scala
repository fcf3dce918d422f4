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

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[NativeVector.type].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - double dot product of two float/double arrays"),
      (es: Seq[Expression]) => NativeVector.DotProduct(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two float/double arrays"),
      (es: Seq[Expression]) => NativeVector.CosineSim(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("md5_hash60"),
      info("md5_hash60", "md5_hash60(s) - top 60 bits of md5(s) as a positive long " +
        "(equals conv(substring(md5(s),1,15),16,10))"),
      (es: Seq[Expression]) => graft.functions.NativeHash.Md5Hash60(es.head)))
    // the custom as-of join operator (AsofNative.asofJoin also installs
    // this per session via experimental.extraStrategies)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
