package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions: a session built with the extension resolves
  * vec_cosine/vec_dot in SQL, and Catalyst constant-folds them.
  *
  * Ordering is made explicit instead of racy: the ONE shared test
  * session (SparkSpec.session) is built `withExtensions`, because
  * extensions are builder-time-only — `getOrCreate()` against an
  * already-created default session returns it unchanged and silently
  * ignores `withExtensions`. The second test pins that reuse behavior
  * so a future suite can't reintroduce the ambiguity.
  */
class ExtensionsSpec extends SparkSpec {

  test("extended session resolves vec_dot/vec_cosine in SQL; literals constant-fold") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
    val row = r.collect().head
    assert(row.getDouble(0) === 11.0 && row.getDouble(1) === 1.0)
    // constant inputs → the optimized plan carries the folded literal
    val optimized = r.queryExecution.optimizedPlan.toString
    assert(optimized.contains("11.0"), optimized)
  }

  test("extended session resolves md5_hash60 in SQL; equals the composed hex-parse form") {
    val r = spark.sql(
      "SELECT md5_hash60('the quick brown fox') AS n, " +
        "CAST(conv(substring(md5('the quick brown fox'), 1, 15), 16, 10) AS BIGINT) AS c")
    val row = r.collect().head
    assert(row.getLong(0) === row.getLong(1))
    assert(row.getLong(0) > 0)
    // NULL literal flows through like the composed md5 idiom
    assert(spark.sql("SELECT md5_hash60(NULL) AS n").collect().head.isNullAt(0))
    // wrong arity is an explicit ANALYSIS error with Spark's standard
    // wrong-number-of-arguments error class — never silent argument
    // dropping, never a raw runtime exception
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT md5_hash60('a', 'b')").collect()
    }
    assert(e.getErrorClass === "WRONG_NUM_ARGS.WITHOUT_SUGGESTION", e.getMessage)
    assert(e.getMessage.contains("md5_hash60"), e.getMessage)
  }

  test("extended session resolves z_interleave16 in SQL; known Morton values") {
    // interleave(1, 0) = bit 0 set; interleave(0, 1) = bit 1 set;
    // interleave(0xFFFF, 0) = all even bits = 0x55555555
    val r = spark.sql(
      "SELECT z_interleave16(1L, 0L) a, z_interleave16(0L, 1L) b, " +
        "z_interleave16(65535L, 0L) c, z_interleave16(0L, 65535L) d, " +
        "z_interleave16(65535L, 65535L) e").collect().head
    assert(r.getLong(0) === 1L)
    assert(r.getLong(1) === 2L)
    assert(r.getLong(2) === 0x55555555L)
    assert(r.getLong(3) === 0xAAAAAAAAL)
    assert(r.getLong(4) === 0xFFFFFFFFL)
    // NULL propagates; wrong arity is the standard analysis error
    assert(spark.sql("SELECT z_interleave16(NULL, 1L) n").collect().head.isNullAt(0))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT z_interleave16(1L)").collect()
    }
    assert(e.getErrorClass === "WRONG_NUM_ARGS.WITHOUT_SUGGESTION", e.getMessage)
  }

  test("getOrCreate reuses the existing session — withExtensions cannot retrofit one") {
    // force the shared session into existence first, then try to build
    // "another" extended session: the builder hands back the same one.
    // This is the documented reason SparkSpec registers the extension
    // at shared-session build time rather than per suite.
    val shared = spark
    val s2 = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    assert(s2 eq shared)
  }

  // NOTE: the `spark.sql.extensions=graft.GraftExtensions` config-string
  // path exercises the same GraftExtensions.apply; testing it honestly
  // needs a fresh SparkContext (getOrCreate in this JVM would return the
  // session above and prove nothing), which one shared test JVM can't do.
}
