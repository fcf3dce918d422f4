package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Per-query wall + shuffle-byte probe for the scale methodology
  * (PERF.md's "operator scale table"): runs a named subset of
  * [[SparkEntry.queries]] against `SPARK_GRAFT_SF_DIR` and prints one
  * JSON line per query with wall seconds, shuffle bytes written/read
  * and exchange count — the evidence that an iterative operator
  * family's per-hop shuffles stay LINEAR in rows as the corpus grows a
  * decade (a loop whose shuffle volume grows super-linearly is
  * invisible in a wall-only reading when fixed costs dominate, and
  * fatal at 100 TB).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=<dir> runMain graft.ScaleProbe q_a,q_b,...
  *
  * Two shuffle readings per query, because they answer different
  * questions:
  *  - plan_*: the executed plan's own SQLMetrics (summed across AQE
  *    stages and reused exchanges) — per-query exact, but BLIND to
  *    sub-jobs whose plans detach (an iterative operator's per-hop
  *    localCheckpoint rounds);
  *  - total_*: a SparkListener summing every completed stage between
  *    query start and end (queries run sequentially; the bus is
  *    drained with a bounded settle wait) — covers the checkpointed
  *    hops, which is exactly what the iterative graph family needs
  *    measured. */
object ScaleProbe {
  /** Candidate-pair counters for the banded generators whose decade
    * shuffle readings are attributed to candidate growth (VERDICT r10
    * directive 2): the probe line carries the MEASURED candidate count
    * (`cand_pairs`) next to the shuffle bytes, so cand× vs shuf× is a
    * recorded ratio, not a narrative. Counted AFTER the timed run and
    * after the listener totals are captured — the counter's own stages
    * never contaminate the reading. */
  private val candCounters: Map[String, (SparkSession, String) => Long] = Map(
    "q_knn_graph" -> ((s, d) =>
      graft.operators.Similarity.knnCandidatePairs(Tables.embeddings(s, d)).count()),
    "q_dedup_minhash_lsh" -> ((s, d) =>
      graft.operators.Dedup.lshCandidatePairs(Tables.documents(s, d)).count()),
    // the star-contraction input: covisit pair density grows with
    // per-(merchant, hour) cell occupancy², so the decade's shuffle
    // excess over 10× must track THIS count, not the row count
    "q_graph_cc" -> ((s, d) =>
      graft.operators.Graph.covisitEdges(Tables.events(s, d)).count()))

  /** All physical nodes, descending into AQE stages and reuse. */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    p +: kids.flatMap(nodes)
  }

  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(sys.error("usage: ScaleProbe q_a,q_b,..."))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    // Streaming state peaks (directive: streaming decade evidence).
    // The q_stream_* replays run REAL StreamingQuery instances on this
    // session, so a session-wide listener sees every micro-batch's
    // StateOperatorProgress: peakState = max over progress events of
    // Σ stateOperators.numRowsTotal (the concurrent state footprint),
    // stateOps = max distinct stateful operators in one query. A query
    // whose peak state grows with CORPUS SIZE instead of the watermark
    // horizon is the 100 TB streaming killer this probe exists to catch.
    val peakState = new java.util.concurrent.atomic.AtomicLong
    val stateOps = new java.util.concurrent.atomic.AtomicLong
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val ops = e.progress.stateOperators
        if (ops != null && ops.nonEmpty) {
          val total = ops.map(_.numRowsTotal).sum
          peakState.getAndAccumulate(total, math.max(_, _))
          stateOps.getAndAccumulate(ops.length.toLong, math.max(_, _))
        }
      }
    })
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          stages.incrementAndGet()
        }
      }
    })
    // listener delivery is async; all stages are COMPLETE when the
    // blocking count() returns, so a short settle drains the bus
    def settle(): Unit = Thread.sleep(1000)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => } // warmup
    names.foreach { name =>
      settle()
      shufWrite.set(0L); shufRead.set(0L); stages.set(0L)
      peakState.set(0L); stateOps.set(0L)
      val t0 = System.nanoTime()
      val qe = try {
        val q = SparkEntry.queries(name)(spark, sfDir).queryExecution
        q.toRdd.count()
        Some(q)
      } catch { case e: Throwable =>
        System.err.println(s"[probe] $name failed: ${e.getMessage}"); None }
      val wall = (System.nanoTime() - t0) / 1e9
      val (w, r, ex) = qe.map { q =>
        val ns = nodes(q.executedPlan).distinct
        def sum(key: String): Long =
          ns.flatMap(_.metrics.get(key)).map(_.value).sum
        (sum("shuffleBytesWritten"),
          sum("localBytesRead") + sum("remoteBytesRead"),
          ns.count(_.getClass.getSimpleName.contains("ShuffleExchange")))
      }.getOrElse((-1L, -1L, -1))
      spark.sharedState.cacheManager.clearCache()
      settle()
      // capture listener totals BEFORE any candidate counting: the
      // counter runs its own stages and must not inflate the reading
      val (totW, totR, totS) = (shufWrite.get, shufRead.get, stages.get)
      val cand = candCounters.get(name).map { f =>
        try f(spark, sfDir) catch { case _: Throwable => -1L } }
      spark.sharedState.cacheManager.clearCache()
      val candField = cand.map(c => s""""cand_pairs":$c,""").getOrElse("")
      val stateField = if (stateOps.get > 0)
        s""""peak_state_rows":${peakState.get},"state_ops":${stateOps.get},"""
      else ""
      println(f"""{"query":"$name","ok":${qe.isDefined},"wall_s":$wall%.3f,""" +
        s""""plan_shuffle_write_bytes":$w,"plan_shuffle_read_bytes":$r,""" +
        s""""exchanges":$ex,"total_shuffle_write_bytes":$totW,""" +
        s""""total_shuffle_read_bytes":$totR,"stages":$totS,$candField$stateField""" +
        s""""sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
