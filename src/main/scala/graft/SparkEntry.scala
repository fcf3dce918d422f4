package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, AsofNative, Dedup, Graph, Media, Monitoring, Mutations, Similarity, ScaleOps, Sketches, Sql, SqlCoverage, TextOps, Tpch}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All operators live in `graft.operators.*` / `graft.functions.*`;
  * this object only aggregates the (name → query, name → oracle SQL)
  * maps the driver harness consumes.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-join region-revenue rollup: orders ⋈ customer ⋈ nation ⋈
    * region with every dim broadcast — one fact-side shuffle total.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Analytics.regionRevenue(
      Tables.customer(spark, d), Tables.nation(spark, d),
      Tables.region(spark, d), Tables.orders(spark, d))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ Dedup.queries ++ Similarity.queries ++
      TextOps.queries ++ Media.queries ++ SqlCoverage.queries ++ Sql.queries ++ ScaleOps.queries ++ Mutations.queries ++ AsofNative.queries ++ Monitoring.queries ++ Sketches.queries ++ Graph.queries ++ Tpch.queries ++ graft.streaming.Streaming.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Analytics.oracleSql ++ Dedup.oracleSql ++ Similarity.oracleSql ++
      TextOps.oracleSql ++ Media.oracleSql ++ SqlCoverage.oracleSql ++ Sql.oracleSql ++ ScaleOps.oracleSql ++ Mutations.oracleSql ++ AsofNative.oracleSql ++ Monitoring.oracleSql ++ Sketches.oracleSql ++ Graph.oracleSql ++ Tpch.oracleSql ++ graft.streaming.Streaming.oracleSql
}
