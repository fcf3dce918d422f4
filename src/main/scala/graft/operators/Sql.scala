package graft.operators

import graft.Tables
import graft.functions.NativeVector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graft.GraftBridge

/** The SQL entry surface: temp views over the testdata, graft's native
  * expressions registered as SQL functions, and operators expressed as
  * plain `spark.sql` — the API a SQL-first user of the engine reaches
  * for. Catalyst plans these identically to the DataFrame forms (same
  * pushdown/broadcast/codegen), which is the point: one optimizer, two
  * front ends.
  */
object Sql {

  /** Register every testdata table as a temp view + graft functions.
    * Idempotent per (session, dir): repeated calls (one per q_sql_*
    * query in a harness run) skip the ~10 parquet re-reads. */
  def register(spark: SparkSession, dir: String): Unit = {
    val marker = "graft.sql.registeredDir"
    if (spark.conf.getOption(marker).contains(dir)) return
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => Tables.read(spark, dir, t).createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")
    GraftBridge.registerFunction(spark, "vec_cosine",
      es => NativeVector.CosineSim(es.head, es(1)))
    GraftBridge.registerFunction(spark, "vec_dot",
      es => NativeVector.DotProduct(es.head, es(1)))
    spark.conf.set(marker, dir)
  }

  private def q(spark: SparkSession, dir: String, sql: String): DataFrame = {
    register(spark, dir)
    spark.sql(sql)
  }

  /** TPC-H Q5-shaped multi-join in pure SQL (dims auto-broadcast). */
  def nationRevenue(spark: SparkSession, dir: String): DataFrame = q(spark, dir,
    """SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name <> 'EUROPE'
      |GROUP BY n_name""".stripMargin)

  /** GROUPING SETS with grouping_id disambiguation. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = q(spark, dir,
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
      |       CAST(grouping(l_linestatus) AS BIGINT) AS g_status
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin)

  /** Exact interpolated percentiles per group (SQL `percentile`). */
  def percentiles(spark: SparkSession, dir: String): DataFrame = q(spark, dir,
    """SELECT o_orderpriority,
      |       floor(percentile(o_totalprice, 0.5) * 100) / 100 AS p50,
      |       floor(percentile(o_totalprice, 0.9) * 100) / 100 AS p90,
      |       count(*) AS n
      |FROM orders GROUP BY o_orderpriority""".stripMargin)

  /** Top-k cosine via the SQL-registered native expression. */
  def vecSearchSql(spark: SparkSession, dir: String): DataFrame = q(spark, dir,
    """SELECT vec_id, floor(vec_cosine(e.embedding, q.qe) * 10000) / 10000 AS cos
      |FROM embeddings e
      |CROSS JOIN (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
      |WHERE vec_id <> 0
      |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)

  /** IN-subquery (Catalyst rewrites to a left-semi join). */
  def inSubquery(spark: SparkSession, dir: String): DataFrame = q(spark, dir,
    """SELECT o_orderpriority, count(*) AS n
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
      |GROUP BY o_orderpriority""".stripMargin)

  /** Correlated LATERAL subquery: top-2 customers per nation by balance. */
  def lateralTopPerGroup(spark: SparkSession, dir: String): DataFrame = q(spark, dir,
    """SELECT n_name, t.c_name, t.c_acctbal
      |FROM nation,
      |LATERAL (SELECT c_name, c_acctbal FROM customer
      |         WHERE c_nationkey = n_nationkey
      |         ORDER BY c_acctbal DESC, c_name LIMIT 2) t""".stripMargin)

  /** Recursive CTE (new in Spark 4): a month spine over the order-date
    * range, left-joined so empty months still appear. */
  def recursiveDateSpine(spark: SparkSession, dir: String): DataFrame = q(spark, dir,
    """WITH RECURSIVE months(m) AS (
      |  SELECT DATE '1995-01-01'
      |  UNION ALL SELECT add_months(m, 1) FROM months WHERE m < DATE '2001-08-01')
      |SELECT m, count(o_orderkey) AS n
      |FROM months LEFT JOIN orders ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
      |GROUP BY m""".stripMargin)

  // ---- driver wiring ----

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_nation_revenue" -> ((s, d) => nationRevenue(s, d)),
    "q_sql_grouping_sets" -> ((s, d) => groupingSets(s, d)),
    "q_sql_percentiles" -> ((s, d) => percentiles(s, d)),
    "q_sql_vec_search" -> ((s, d) => vecSearchSql(s, d)),
    "q_sql_in_subquery" -> ((s, d) => inSubquery(s, d)),
    "q_sql_lateral" -> ((s, d) => lateralTopPerGroup(s, d)),
    "q_sql_recursive" -> ((s, d) => recursiveDateSpine(s, d)))

  val oracleSql: Map[String, String] = Map(
    "q_sql_nation_revenue" ->
      ("SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name <> 'EUROPE' GROUP BY n_name"),
    "q_sql_grouping_sets" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n, " +
        "grouping(l_returnflag)::BIGINT AS g_flag, " +
        "grouping(l_linestatus)::BIGINT AS g_status " +
        "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())"),
    "q_sql_percentiles" ->
      ("SELECT o_orderpriority, " +
        "floor(quantile_cont(o_totalprice, 0.5) * 100) / 100 AS p50, " +
        "floor(quantile_cont(o_totalprice, 0.9) * 100) / 100 AS p90, " +
        "count(*) AS n FROM orders GROUP BY o_orderpriority"),
    "q_sql_vec_search" ->
      ("SELECT vec_id, floor(list_cosine_similarity(embedding::DOUBLE[], " +
        "(SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]) * 10000) / 10000 AS cos " +
        "FROM embeddings WHERE vec_id <> 0 ORDER BY cos DESC, vec_id LIMIT 10"),
    "q_sql_in_subquery" ->
      ("SELECT o_orderpriority, count(*) AS n FROM orders " +
        "WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000) " +
        "GROUP BY o_orderpriority"),
    "q_sql_lateral" ->
      ("SELECT n_name, t.c_name, t.c_acctbal FROM nation, " +
        "LATERAL (SELECT c_name, c_acctbal FROM customer " +
        "WHERE c_nationkey = n_nationkey ORDER BY c_acctbal DESC, c_name LIMIT 2) t"),
    "q_sql_recursive" ->
      ("WITH RECURSIVE months(m) AS (SELECT DATE '1995-01-01' " +
        "UNION ALL SELECT (m + INTERVAL 1 MONTH)::DATE FROM months WHERE m < DATE '2001-08-01') " +
        "SELECT m, count(o_orderkey) AS n FROM months " +
        "LEFT JOIN orders ON date_trunc('month', o_orderdate)::DATE = m GROUP BY m"))
}
