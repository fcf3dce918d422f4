package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mutation-shaped batch operators: the reference's store is
  * append-only (SURVEY §2 O5), but a monitoring pipeline needs upsert
  * and keep-latest semantics. Both are pure relational algebra here —
  * merge-on-read, no table format required — and shuffle once on the
  * key.
  */
object Mutations {

  private def r2(c: Column): Column = round(c, 2)

  /** Upsert (MERGE): rows from `updates` replace same-key rows in
    * `base`; unmatched update rows are inserts. base ANTI-JOIN updates
    * ∪ updates — one shuffle each side on the key.
    *
    * Precondition: `updates` must be unique per key (SQL MERGE raises a
    * cardinality violation otherwise; here duplicate update rows would
    * all survive). Dedupe with [[keepLatest]] first if needed. */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame =
    base.join(updates, Seq(key), "left_anti").unionByName(updates)

  /** Keep-latest dedup: one row per key, the latest by event time with
    * a deterministic tiebreak — the explicit ordered sibling of
    * dropDuplicates (which keeps an arbitrary row). */
  def keepLatest(df: DataFrame, key: Column, orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderBy: _*)
    // pick a row-number column name that cannot clobber caller columns
    val rn = Iterator.from(0).map(i => s"__rn$i").find(!df.columns.contains(_)).get
    df.withColumn(rn, row_number().over(w)).filter(col(rn) === 1).drop(rn)
  }

  // ---- driver wiring ----

  /** Upsert demo on orders: "reprice" orders with totalprice > 400k to
    * a 10% discount, plus one synthetic insert; aggregate the merged
    * result so the output is compact and oracle-stable. */
  private def upsertOrders(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
    val repriced = base.filter(col("o_totalprice") > 400000)
      // truncate, don't round: round() half-ties are not engine-portable
      .withColumn("o_totalprice", floor(col("o_totalprice") * 0.9 * 100) / 100)
    val insert = s.range(1).select(
      lit(900000001L).as("o_orderkey"), lit(1L).as("o_custkey"),
      lit("N").as("o_orderstatus"), lit(12345.67).as("o_totalprice"),
      lit("2001-09-01 00:00:00").cast("timestamp").as("o_orderdate"),
      lit("1-URGENT").as("o_orderpriority"))
    upsert(base, repriced.unionByName(insert), "o_orderkey")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), r2(sum(col("o_totalprice"))).as("total"))
  }

  /** Keep-latest demo on events: latest event per user (ts then
    * event_id tiebreak). */
  private def latestEventPerUser(s: SparkSession, d: String): DataFrame =
    keepLatest(Tables.events(s, d).select(col("user_id"), col("event_id"),
        col("ts_ms"), col("event_type")),
      col("user_id"), Seq(col("ts_ms").desc, col("event_id").desc))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_upsert" -> upsertOrders,
    "q_keep_latest" -> ((s, d) => latestEventPerUser(s, d)))

  val oracleSql: Map[String, String] = Map(
    "q_upsert" ->
      ("WITH updates AS (" +
        "SELECT o_orderkey, o_custkey, o_orderstatus, floor(o_totalprice * 0.9 * 100) / 100 o_totalprice, " +
        "o_orderdate, o_orderpriority FROM orders WHERE o_totalprice > 400000 " +
        "UNION ALL SELECT 900000001, 1, 'N', 12345.67, TIMESTAMP '2001-09-01', '1-URGENT'), " +
        "merged AS (SELECT * FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates) " +
        "UNION ALL SELECT * FROM updates) " +
        "SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total " +
        "FROM merged GROUP BY o_orderstatus"),
    "q_keep_latest" ->
      ("SELECT user_id, event_id, ts_ms, event_type FROM (" +
        "SELECT user_id, event_id, epoch_ms(ts) ts_ms, event_type, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) rn " +
        "FROM events) WHERE rn = 1"))
}
