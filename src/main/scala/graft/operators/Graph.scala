package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics in relational form. Companion to the label
  * propagation in [[Dedup.components]]: where that computes connected
  * components over a pair relation, this runs weighted PageRank power
  * iteration over an edge relation derived from event sequences.
  *
  * The heavy part at 100 TB is the EDGE DERIVATION — one window pass
  * over the event log (partitioned by user, so it distributes) and one
  * hash aggregate to weighted edges. The iteration itself then runs
  * over the tiny aggregated graph (|node types|² rows at most) — the
  * classic two-regime shape of production graph pipelines: scan-bound
  * edge extraction, cache-bound iteration.
  *
  * Engine-exact iteration arithmetic: ranks are INTEGERS scaled by
  * 2^30, the damping factor 0.85 is the rational 17/20, and every
  * per-edge transition probability is pre-quantized to the integer
  * share `(w·2^20) div out` ≤ 2^20, so a contribution `(r·sh) div
  * 2^20` never exceeds 2^50 — overflow-safe for any corpus whose
  * per-edge weight stays under 2^43 (≈9·10^12 transitions, beyond a
  * 100 TB log), where the naive `r·w` product would overflow Long
  * once an edge weight passed ~2^33. Integer ops only, so partial-agg
  * merge order cannot perturb a single bit and the oracle replays the
  * identical recurrence. (Doubles would drift: a sum of per-edge
  * double contributions is order-dependent.)
  */
object Graph {

  /** Rank scale: ranks live in [0, Q] as integers. */
  val Q: Long = 1L << 30

  /** Edge-share scale: transition probabilities are integers in
    * [0, S]. Q·S = 2^50 bounds every product. */
  val S: Long = 1L << 20

  /** Weighted PageRank over the event-type transition graph: edges are
    * consecutive (event_type → next event_type) transitions within a
    * user's time-ordered stream; `iters` fixed power iterations with
    * teleport 3/20 and damping 17/20. Nodes with no outgoing edges
    * simply don't contribute (standard dangling simplification —
    * documented, deterministic). Output: per node, the scaled integer
    * rank and its double rendering. */
  def pageRank(ev: DataFrame, iters: Int = 3): DataFrame = {
    val byT = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    // the only pass over the event log: window lead + hash-agg to edges
    val edges = ev
      .select(col("user_id"), col("ts_ms"), col("event_id"), col("event_type").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(byT))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      .localCheckpoint(true) // ≤ |types|² rows; cuts lineage for the loop
    val ew = edges.join(edges.groupBy(col("src")).agg(sum(col("w")).as("out_w")), "src")
      .select(col("src"), col("dst"), expr(s"w * $S div out_w").as("sh"))
    val nodes = ev.select(col("event_type").as("node")).distinct()
    // |nodes| enters the recurrence as a 1-row relation (no driver-side
    // count action; the literal-free plan re-runs at any scale)
    val nc = nodes.agg(count(lit(1)).as("nn"))
    var r = nodes.crossJoin(broadcast(nc))
      .select(col("node"), expr(s"$Q div nn").as("r"), col("nn"))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      val contrib = ew.join(r.select(col("node").as("src"), col("r")), "src")
        .select(col("dst"), expr(s"r * sh div $S").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
      r = r.join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (expr(s"${3L * Q} div (20 * nn)") +
            expr("17 * coalesce(contrib, 0) div 20")).as("r"),
          col("nn"))
        .localCheckpoint(true) // tiny; keeps each round's plan flat
    }
    r.select(col("node"), col("r").as("rank_scaled"),
      graft.functions.Portable.trunc6(col("r").cast("double") / Q).as("rank"))
  }

  // ---- driver wiring ----

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_pagerank" -> ((s, d) => pageRank(Tables.events(s, d))))

  /** The identical recurrence unrolled as SQL CTEs (r0 → r3). */
  private def iterSql(i: Int): String =
    s"contrib$i AS (SELECT e.dst, sum(r.r * e.sh // $S)::BIGINT c " +
      s"FROM ew e JOIN r$i r ON r.node = e.src GROUP BY 1), " +
      s"r${i + 1} AS (SELECT n.node, " +
      s"(${3L * Q} // (20 * nn.nn)) + (17 * coalesce(c.c, 0) // 20) AS r " +
      s"FROM nodes n CROSS JOIN nc nn LEFT JOIN contrib$i c ON c.dst = n.node)"

  val oracleSql: Map[String, String] = Map(
    "q_graph_pagerank" ->
      ("WITH s AS (SELECT user_id, epoch_ms(ts) ts_ms, event_id, event_type src FROM events), " +
        "t AS (SELECT src, lead(src) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) dst FROM s), " +
        "edges AS (SELECT src, dst, count(*) w FROM t WHERE dst IS NOT NULL GROUP BY 1, 2), " +
        s"ew AS (SELECT e.src, e.dst, e.w * $S // o.out_w AS sh FROM edges e JOIN " +
        "(SELECT src, sum(w)::BIGINT out_w FROM edges GROUP BY 1) o USING (src)), " +
        "nodes AS (SELECT DISTINCT event_type node FROM events), " +
        "nc AS (SELECT count(*) nn FROM nodes), " +
        s"r0 AS (SELECT node, $Q // nn AS r FROM nodes CROSS JOIN nc), " +
        (0 until 3).map(iterSql).mkString(", ") + " " +
        s"SELECT node, r AS rank_scaled, floor(r::DOUBLE / $Q * 1000000) / 1000000 AS rank " +
        "FROM r3"))
}
