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

  /** Histogram-sketch quantile estimation — the at-scale sibling of the
    * exact percentile (q_sql_percentiles): one fixed-width binned
    * aggregate (≤ a few thousand cells however large the input — the
    * shuffle carries bin partials, map-side combined), a cumulative
    * window over the TINY bin table, then linear interpolation inside
    * the target bin. An exact percentile needs a global sort of the
    * column at 100 TB; this needs one narrow hash-agg, which is why
    * every production engine (and Spark's own approx_percentile) ships
    * a sketch for it. Unlike approx_percentile's GK sketch, the
    * fixed-bin histogram is merge-order-DETERMINISTIC — every estimate
    * is oracle-checkable bit-for-bit.
    *
    * Membership/arithmetic parity: bin ids are integer floors; the
    * target rank q·total multiplies the same literal against the same
    * integer in both engines; the unique target bin satisfies
    * cum ≥ target AND cum − cnt < target (cnt > 0 makes it unique even
    * when the target lands exactly on a bin boundary); interpolation
    * divides identical doubles. Output truncated at 4 decimals. */
  def approxQuantiles(orders: DataFrame, qs: Seq[Double] = Seq(0.5, 0.9, 0.99),
      binW: Double = 64.0): DataFrame = {
    val bins = orders
      .groupBy(floor(col("o_totalprice") / binW).cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"))
    // the cumulative window runs over |bins| rows (thousands), never the
    // input — a single-partition window over a post-agg relation
    val cum = bins
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("bin"))))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy()))
    val probes = explode(array(qs.map(lit): _*)).as("p")
    cum.select(col("bin"), col("cnt"), col("cum"), col("total"), probes)
      .withColumn("target", col("p") * col("total"))
      .filter(col("cum") >= col("target") && (col("cum") - col("cnt")) < col("target"))
      .select(col("p"), col("total").as("n_total"), col("bin"),
        graft.functions.Portable.trunc4(
          col("bin") * binW + (col("target") - (col("cum") - col("cnt")))
            / col("cnt") * binW).as("est"))
  }

  // ---- driver wiring ----

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_approx_quantile" -> ((s, d) => approxQuantiles(Tables.orders(s, d))),
    "q_cms_heavy_hitters" -> ((s, d) => cmsHeavyHitters(Tables.events(s, d))))

  val oracleSql: Map[String, String] = Map(
    "q_approx_quantile" ->
      ("WITH bins AS (SELECT CAST(floor(o_totalprice / 64.0) AS BIGINT) bin, count(*) cnt " +
        "FROM orders GROUP BY 1), " +
        "c AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin)::BIGINT cum, " +
        "sum(cnt) OVER ()::BIGINT total FROM bins), " +
        // ::DOUBLE[]: a bare decimal list would type as DECIMAL and
        // diverge from Spark's double p·total arithmetic
        "p AS (SELECT unnest([0.5, 0.9, 0.99]::DOUBLE[]) p), " +
        "t AS (SELECT p, total, bin, cnt, cum, p * total target FROM c CROSS JOIN p) " +
        "SELECT p, total AS n_total, bin, " +
        "floor((bin * 64.0 + (target - (cum - cnt))::DOUBLE / cnt * 64.0) * 10000) / 10000 AS est " +
        "FROM t WHERE cum >= target AND (cum - cnt) < target"),
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
