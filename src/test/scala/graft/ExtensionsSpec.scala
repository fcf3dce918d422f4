package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions: a fresh session built with the extension resolves
  * vec_cosine/vec_dot in SQL, and Catalyst constant-folds them. */
class ExtensionsSpec extends SparkSpec {

  test("withExtensions installs vec_cosine and vec_dot; literals constant-fold") {
    // newSession shares the SparkContext; extensions need their own
    // builder, so construct directly
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
          "vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      val row = r.collect().head
      assert(row.getDouble(0) === 11.0 && row.getDouble(1) === 1.0)
      // constant inputs → the optimized plan carries the folded literal
      val optimized = r.queryExecution.optimizedPlan.toString
      assert(optimized.contains("11.0"), optimized)
    } finally { /* shared SparkContext: do not stop */ }
  }

  // NOTE: the `spark.sql.extensions=graft.GraftExtensions` config-string
  // path exercises the same GraftExtensions.apply; testing it honestly
  // needs a fresh SparkContext (getOrCreate in this JVM would return the
  // session above and prove nothing), which one shared test JVM can't do.
}
