package graft

import graft.operators.ScaleOps
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scale-pattern guarantees: salted agg equivalence, bucketed joins
  * plan without shuffle exchanges, partitioned/format round-trips. */
class ScaleSpec extends SparkSpec {

  test("saltedUserStats equals the direct aggregation") {
    val ev = Tables.events(spark, sf)
    val direct = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n"), round(sum(col("value")), 2).as("sum_value"))
    val salted = ScaleOps.saltedUserStats(ev)
    assert(salted.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(salted).count() === 0)
  }

  test("bucketed join plans with zero shuffle exchanges") {
    val wh = Files.createTempDirectory("graft-wh").toString
    ScaleOps.writeBucketed(spark, sf, wh)
    val joined = ScaleOps.bucketedJoin(spark)
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not re-shuffle either bucketed side: the only
    // allowed exchange is the final small groupBy on c_mktsegment
    val joinPart = plan.split("SortMergeJoin|ShuffledHashJoin").drop(1).mkString
    assert(!joinPart.contains("Exchange hashpartitioning(o_custkey") &&
      !joinPart.contains("Exchange hashpartitioning(c_custkey"),
      s"bucketed join re-shuffled:\n$plan")
    // and the result matches the unbucketed join
    val direct = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
    assert(joined.exceptAll(direct).count() === 0)
  }

  test("rapidPairs joins on the time bucket, not user_id alone (plan shape)") {
    val ev = Tables.events(spark, sf)
    val plan = graft.operators.Analytics.rapidPairs(ev).queryExecution.executedPlan.toString
    // the equi keys of the join must include the bucket column — a
    // user_id-only join is per-user quadratic before the range filter
    val joinLine = plan.linesIterator.find(l => l.contains("Join ") && l.contains("user_id"))
    assert(joinLine.exists(_.contains("bkt")), s"range join lost its bucket key:\n$plan")
  }

  test("tfidfTopK carries exactly one broadcast hint (the 1-row count, never the vocabulary)") {
    val docs = Tables.documents(spark, sf)
    val analyzed = graft.operators.TextOps.tfidfTopK(docs).queryExecution.analyzed.toString
    // the df (vocabulary) table grows with the corpus; a forced broadcast
    // there is a driver OOM at scale. AQE may still CHOOSE broadcast when
    // it fits — the guard is against the unconditional hint
    val hints = "ResolvedHint".r.findAllIn(analyzed).length
    assert(hints === 1, s"expected only the count(*) broadcast hint, got $hints:\n$analyzed")
  }

  test("fingerprints runs on a single exchange; all windows reuse the doc_id partitioning") {
    val docs = Tables.documents(spark, sf)
    val plan = graft.operators.TextOps.fingerprints(docs).queryExecution.executedPlan.toString
    val exchanges = "Exchange ".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 exchange (the spread), got $exchanges:\n$plan")
  }

  test("format round-trips: csv, json, orc, partitioned parquet") {
    val dir = Files.createTempDirectory("graft-fmt").toString
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "event_type", "value")
    ev.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    ev.write.mode("overwrite").json(s"$dir/json")
    ev.write.mode("overwrite").orc(s"$dir/orc")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(s"$dir/pq")
    val n = ev.count()
    assert(spark.read.option("header", "true").schema(ev.schema).csv(s"$dir/csv").count() === n)
    assert(spark.read.schema(ev.schema).json(s"$dir/json").count() === n)
    assert(spark.read.orc(s"$dir/orc").count() === n)
    val pq = spark.read.parquet(s"$dir/pq")
    assert(pq.count() === n)
    // partition pruning reaches the file listing: only one dir scanned
    val pruned = pq.filter(col("event_type") === "purchase")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"), scan)
  }
}
