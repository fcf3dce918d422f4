package graft.operators

import graft.Tables
import graft.plans.{AsofJoin, AsofJoinStrategy}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftBridge

/** Public API over the custom as-of join physical operator
  * ([[graft.plans.AsofJoin]]): one sort-merge pass, both sides
  * hash-clustered on the key — the engine-level alternative to the
  * composed union+window form in [[Analytics.asofPurchaseView]].
  * Both implementations are oracle-checked against DuckDB's ASOF JOIN
  * and spec-checked against each other. */
object AsofNative {

  /** Left-outer backward as-of join. Key/time/tiebreak columns must be
    * long-backed (LongType or TimestampType) — enforced here, since the
    * exec reads them via getLong; right columns must not collide with
    * left ones (rename before joining). `rightTiebreak` makes the match
    * deterministic under (key, time) ties: the max tiebreak value wins. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTiebreak: String): DataFrame = {
    val spark = left.sparkSession
    def longBacked(df: DataFrame, name: String): Unit = {
      val dt = df.schema(name).dataType
      require(dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.TimestampType,
        s"asofJoin column '$name' must be LongType/TimestampType, got $dt")
    }
    Seq(leftKey, leftTime).foreach(longBacked(left, _))
    Seq(rightKey, rightTime, rightTiebreak).foreach(longBacked(right, _))
    // idempotently activate the planner strategy on this session
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    val plan = AsofJoin(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      GraftBridge.expression(left(leftKey)), GraftBridge.expression(right(rightKey)),
      GraftBridge.expression(left(leftTime)), GraftBridge.expression(right(rightTime)),
      GraftBridge.expression(right(rightTiebreak)))
    GraftBridge.ofRows(spark, plan)
  }

  /** q_asof_join semantics via the native operator: for each purchase,
    * the latest view of the same user at-or-before it. */
  def purchaseView(ev: DataFrame): DataFrame = {
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_ms"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_event_id"), col("user_id").as("v_user_id"),
        col("ts_ms").as("v_ts_ms"))
    asofJoin(purchases, views, "user_id", "v_user_id", "ts_ms", "v_ts_ms", "v_event_id")
      .select(col("event_id"), col("v_event_id").as("view_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_native" -> ((s, d) => purchaseView(Tables.events(s, d))))

  // the oracle compares at the SAME millisecond precision the operator
  // uses (epoch_ms) — comparing raw ns timestamps would be a different
  // predicate for sub-ms-separated events
  val oracleSql: Map[String, String] = Map(
    "q_asof_native" ->
      ("SELECT p.event_id, v.event_id AS view_id FROM " +
        "(SELECT event_id, user_id, epoch_ms(ts) tms FROM events WHERE event_type = 'purchase') p " +
        "ASOF LEFT JOIN " +
        "(SELECT event_id, user_id, epoch_ms(ts) tms FROM events WHERE event_type = 'view') v " +
        "ON p.user_id = v.user_id AND p.tms >= v.tms"))
}
