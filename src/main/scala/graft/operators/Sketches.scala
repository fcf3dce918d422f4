package graft.operators

import graft.Tables
import graft.functions.TextHash.hash60
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators in RELATIONAL form. A count-min sketch is
  * a d×w counter matrix whose cells are plain sums — sums commute, so
  * the relational realization (explode d hash rows → hash-agg) is
  * exactly the map-side-combinable partial-aggregate Spark already
  * executes, and the estimates are DETERMINISTIC regardless of
  * partition/merge order (unlike Misra–Gries/SpaceSaving, whose
  * counters depend on merge order and cannot be oracle-checked). The
  * DuckDB oracle rebuilds the identical matrix from the same md5
  * bucket hashes and reproduces every estimate bit-for-bit.
  */
object Sketches {

  /** Count-min heavy hitters over integer-dollar transaction amounts:
    * the top-`topN` amounts by exact count, each with its CMS estimate
    * — the overestimate gap (est − n) is the collision signal a
    * monitoring pipeline watches when sizing d×w.
    *
    * Scale: the sketch is d×w cells (4×256 here) regardless of input
    * size — counter updates combine map-side, the shuffle carries at
    * most d×w partials per task. The exact pass exists to RANK the
    * report (at 100 TB you'd probe a fixed watchlist of amounts
    * against the counters instead and skip the exact agg entirely —
    * the probe join below is that path). */
  def cmsHeavyHitters(ev: DataFrame, depth: Int = 4, width: Int = 256,
      topN: Int = 20): DataFrame = {
    // base feeds BOTH the counter build and the exact ranking pass —
    // persist so the events scan happens once (house rule: persist
    // multi-consumer intermediates; one narrow long column per row)
    val base = ev.select(floor(col("value")).cast("long").as("amt")).persist()
    def bucketed(df: DataFrame) = df
      .select(df.columns.map(col) :+
        explode(array((0 until depth).map(lit): _*)).as("i"): _*)
      .withColumn("bucket", pmod(
        hash60(concat(col("i").cast("string"), lit("|"), col("amt").cast("string"))),
        lit(width.toLong)))
    val counters = bucketed(base).groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val exact = base.groupBy(col("amt")).agg(count(lit(1)).as("n"))
    val est = bucketed(exact).join(counters, Seq("i", "bucket"))
      .groupBy(col("amt"), col("n")).agg(min(col("c")).as("est"))
    // the report is tiny post-agg; the global window ranks ~|distinct
    // amounts| rows, not the input
    val w = Window.orderBy(col("n").desc, col("amt"))
    val result = est.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topN)
      .select(col("amt"), col("n"), col("est"), col("rnk"))
      .localCheckpoint(true) // topN rows; lets the base cache go
    base.unpersist()
    result
  }

  // ---- driver wiring ----

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cms_heavy_hitters" -> ((s, d) => cmsHeavyHitters(Tables.events(s, d))))

  val oracleSql: Map[String, String] = Map(
    "q_cms_heavy_hitters" ->
      ("WITH b AS (SELECT CAST(floor(value) AS BIGINT) amt FROM events), " +
        "d AS (SELECT unnest(range(4)) i), " +
        "h AS (SELECT amt, i, ('0x' || substr(md5(i::VARCHAR || '|' || amt::VARCHAR), 1, 15))::BIGINT % 256 bucket " +
        "FROM b CROSS JOIN d), " +
        "counters AS (SELECT i, bucket, count(*) c FROM h GROUP BY 1, 2), " +
        "exact AS (SELECT amt, count(*) n FROM b GROUP BY 1), " +
        "probes AS (SELECT amt, n, i, ('0x' || substr(md5(i::VARCHAR || '|' || amt::VARCHAR), 1, 15))::BIGINT % 256 bucket " +
        "FROM exact CROSS JOIN d), " +
        "est AS (SELECT amt, n, min(c) est FROM probes JOIN counters USING (i, bucket) GROUP BY 1, 2), " +
        "rk AS (SELECT amt, n, est, row_number() OVER (ORDER BY n DESC, amt) rnk FROM est) " +
        "SELECT amt, n, est, rnk FROM rk WHERE rnk <= 20"))
}
