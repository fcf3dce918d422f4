package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Explicit scale patterns (SURVEY.md §7 L4 "100 TB posture"): skew
  * mitigation and shuffle-free co-located joins. These are the knobs a
  * 1000-executor deployment turns when AQE alone isn't enough.
  */
object ScaleOps {

  private def r2(c: Column): Column = round(c, 2)

  /** Skew-resistant two-phase aggregation: salt the hot key space so the
    * first shuffle fans a skewed key across `salts` reducers, then
    * combine the partials. Result is identical to a direct groupBy (the
    * oracle checks exactly that); the win is that no single reducer
    * receives a hot key's full volume. Salt derives from a data column
    * (not rand()) so the plan stays deterministic. */
  def saltedUserStats(ev: DataFrame, salts: Int = 16): DataFrame = {
    val partial = ev
      .withColumn("salt", pmod(col("event_id"), lit(salts)))
      .groupBy(col("user_id"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("value")).as("psum"))
    partial.groupBy(col("user_id"))
      .agg(sum(col("pn")).cast("long").as("n"), r2(sum(col("psum"))).as("sum_value"))
  }

  /** Write fact+dim bucketed by the join key: a later join of the two
    * tables is co-located — no shuffle exchange on either side (asserted
    * in ScaleSpec). This is how a 100 TB fact table joins a large dim
    * repeatedly without re-shuffling per query. */
  def writeBucketed(spark: SparkSession, dir: String, warehouse: String,
      buckets: Int = 8): Unit = {
    Tables.orders(spark, dir).write.mode("overwrite")
      .bucketBy(buckets, "o_custkey").sortBy("o_custkey")
      .option("path", s"$warehouse/orders_b").saveAsTable("orders_b")
    Tables.customer(spark, dir).write.mode("overwrite")
      .bucketBy(buckets, "c_custkey").sortBy("c_custkey")
      .option("path", s"$warehouse/customer_b").saveAsTable("customer_b")
  }

  /** The co-located join over the bucketed tables. */
  def bucketedJoin(spark: SparkSession): DataFrame =
    spark.table("orders_b")
      .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), r2(sum(col("o_totalprice"))).as("revenue"))

  // ---- driver wiring ----

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_salted_agg" -> ((s, d) => saltedUserStats(Tables.events(s, d))))

  val oracleSql: Map[String, String] = Map(
    // the oracle is the UNSALTED aggregation: salting must not change results
    "q_salted_agg" ->
      ("SELECT user_id, count(*) AS n, round(sum(value), 2) AS sum_value " +
        "FROM events GROUP BY user_id"))
}
