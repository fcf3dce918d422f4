package graft

import graft.streaming.Streaming
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming throughput measurement: rate source → wire-shaped
  * transactions → [[Streaming.windowedVolume]] → noop sink, reporting
  * sustained rows/s for the default (HDFS-backed) and RocksDB state
  * stores. The rate source over-produces (`rowsPerSecond` far above
  * achievable) so the measured number is the ENGINE's capacity, not the
  * generator's. Rows/s is computed from the query's own progress
  * metrics (input rows ÷ trigger execution time), skipping the first
  * batch (plan/codegen warm-up).
  *
  * `main` prints one JSON line:
  * {"metric":"stream_rows_per_sec","default":N,"rocksdb":M,...}
  */
object StreamBench {

  private val currencies = array(Seq("USD", "EUR", "KES", "GBP", "JPY").map(lit): _*)

  /** Rate-source stream shaped like the transaction wire format. */
  def rateTxns(spark: SparkSession, rowsPerSecond: Long, partitions: Int): org.apache.spark.sql.DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .option("numPartitions", partitions)
      .load()
      .select(
        col("timestamp"),
        concat(lit("t-"), col("value")).as("transaction_id"),
        (col("value") % 1000).cast("int").as("user_id"),
        (col("value") % 100).cast("double").as("amount"),
        element_at(currencies, (col("value") % 5 + 1).cast("int")).as("currency"),
        when(col("value") % 2 === 0, "credit").otherwise("debit").as("type"))

  /** Run the windowed-volume pipeline for `seconds` and return
    * (rows/s, batches measured). */
  def run(spark: SparkSession, rocksDb: Boolean, seconds: Int,
      rowsPerSecond: Long = 5000000L): (Double, Int) = {
    // capture the session's provider BEFORE configure so the finally
    // block restores it — unconditionally unsetting would clobber a
    // session-level RocksDB choice (e.g. GRAFT_STATE_STORE=rocksdb)
    // for any later streaming queries on a shared session
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val priorProvider = spark.conf.getOption(providerKey)
    Tables.configure(spark, rocksDbState = rocksDb)
    if (!rocksDb) spark.conf.unset(providerKey) // measure the default store even if env opts in
    try {
      val parts = spark.sparkContext.defaultParallelism
      val txns = rateTxns(spark, rowsPerSecond, parts)
      val agg = Streaming.windowedVolume(txns,
        watermark = "10 seconds", window_ = "5 seconds")
      val q = agg.writeStream.format("noop").outputMode("update").start()
      try {
        Thread.sleep(seconds * 1000L)
      } finally q.stop()
      // skip the warm-up batch; guard against NaN/zero-duration entries
      val measured = q.recentProgress.toSeq.drop(1)
        .map(p => (p.numInputRows,
          Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)))
        .filter { case (rows, ms) => rows > 0 && ms > 0 }
      val rows = measured.map(_._1).sum.toDouble
      val ms = measured.map(_._2).sum.toDouble
      (if (ms > 0) rows / (ms / 1000.0) else 0.0, measured.size)
    } finally priorProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }

  /** The bucketed stream-stream interval join on a SKEWED corpus,
    * A/B'd across state stores — the round-10 hot-key fix
    * (lookback-bucketed join keys in [[Streaming.pairsOuterPipeline]])
    * was gated for correctness and wall; this measures the state-store
    * choice on the corpus where state size is the actual stressor (one
    * user carrying ~¼ of all events concentrates join state under few
    * keys). The corpus is replayed as a time-ordered bounded backfill
    * ([[StreamStateProbe.writeSliced]], 2-day slices,
    * `maxFilesPerTrigger=1`) so the watermark advances between batches
    * and the measurement reflects steady-state operation, not the
    * one-batch backfill artifact. Returns (rows/s over all batches
    * after warm-up, peak state rows, peak state bytes as the provider
    * reports them — in-memory map size for the default store, native
    * memory + pinned blocks for RocksDB). */
  def runPairsSkew(spark: SparkSession, rocksDb: Boolean, inDir: String):
      (Double, Long, Long) = {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val priorProvider = spark.conf.getOption(providerKey)
    Tables.configure(spark, rocksDbState = rocksDb)
    if (!rocksDb) spark.conf.unset(providerKey)
    val prevSp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val schema = spark.read.parquet(
        new java.io.File(inDir).listFiles().filter(_.getName.endsWith(".parquet"))
          .head.toString).schema
      val farFuture = new java.sql.Timestamp(4102444800000L)
      val ck = java.nio.file.Files.createTempDirectory("graft-sbp-ck").toString
      val q = Streaming.pairsOuterPipeline(10L, 60L, farFuture)(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(inDir))
        .writeStream.format("noop").outputMode(OutputMode.Append())
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val ps = q.recentProgress.toSeq.drop(1) // skip plan/codegen warm-up
      val rows = ps.map(_.numInputRows).sum.toDouble
      val ms = ps.flatMap(p =>
        Option(p.durationMs.get("triggerExecution")).map(_.longValue)).sum.toDouble
      val peakRows = ps.map(_.stateOperators.map(_.numRowsTotal).sum)
        .foldLeft(0L)(math.max)
      val peakBytes = ps.map(_.stateOperators.map(_.memoryUsedBytes).sum)
        .foldLeft(0L)(math.max)
      graft.streaming.Streaming.rmTree(new java.io.File(ck))
      (if (ms > 0) rows / (ms / 1000.0) else 0.0, peakRows, peakBytes)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevSp)
      priorProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  /** Drive an arbitrary oracled pipeline over a time-sliced bounded
    * backfill (the [[runPairsSkew]] discipline: `maxFilesPerTrigger=1`,
    * watermark advancing between batches) and report (rows/s after
    * warm-up, peak state rows, measured batches). Used for the
    * fMGWS-vs-transformWithState A/B: same corpus, same slices, same
    * verdict arithmetic — only the state machinery (and, for TWS, the
    * mandatory RocksDB provider) differs. */
  def runSliced(spark: SparkSession, rocksDb: Boolean, inDir: String,
      pipeline: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame):
      (Double, Long, Int) = {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val priorProvider = spark.conf.getOption(providerKey)
    Tables.configure(spark, rocksDbState = rocksDb)
    if (!rocksDb) spark.conf.unset(providerKey)
    val prevSp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val schema = spark.read.parquet(
        new java.io.File(inDir).listFiles().filter(_.getName.endsWith(".parquet"))
          .head.toString).schema
      val ck = java.nio.file.Files.createTempDirectory("graft-sbf-ck").toString
      val q = pipeline(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(inDir))
        .writeStream.format("noop").outputMode(OutputMode.Append())
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val ps = q.recentProgress.toSeq.drop(1)
      val rows = ps.map(_.numInputRows).sum.toDouble
      val ms = ps.flatMap(p =>
        Option(p.durationMs.get("triggerExecution")).map(_.longValue)).sum.toDouble
      val peakRows = ps.map(_.stateOperators.map(_.numRowsTotal).sum)
        .foldLeft(0L)(math.max)
      graft.streaming.Streaming.rmTree(new java.io.File(ck))
      (if (ms > 0) rows / (ms / 1000.0) else 0.0, peakRows, ps.size)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevSp)
      priorProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val seconds = sys.env.getOrElse("SPARK_GRAFT_STREAM_SECS", "20").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the skew A/B replays ~85 bounded batches; the peak must see all
      .config("spark.sql.streaming.numRecentProgressUpdates", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (defRps, defBatches) = run(spark, rocksDb = false, seconds)
    val (rocksRps, rocksBatches) = run(spark, rocksDb = true, seconds)
    println(s"""{"metric":"stream_rows_per_sec","default":${defRps.round},""" +
      s""""rocksdb":${rocksRps.round},"batches_default":$defBatches,""" +
      s""""batches_rocksdb":$rocksBatches,"seconds_each":$seconds}""")
    // Skew-corpus state-store A/B for the bucketed join: runs only when
    // a skew corpus is present (SPARK_GRAFT_SKEW_DIR or target/sfskew —
    // generate with `runMain graft.ScaleUp <sf0.1> target/sfskew 5 --skew`).
    // fMGWS vs transformWithState A/B on the funnel: the same sliced
    // backfill through both engines — fMGWS on the default store AND
    // on RocksDB (isolating the store tax), TWS on RocksDB (its
    // mandatory provider; with the fMGWS@rocksdb leg, the remaining
    // difference is the API itself).
    val abDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (new java.io.File(s"$abDir/events.parquet").exists()) {
      val shaped = Tables.events(spark, abDir)
        .select(col("ts").as("timestamp"), col("ts_ms"), col("event_id"),
          col("user_id"), col("event_type"),
          org.apache.spark.sql.functions.floor(col("value") * 100 + 0.5)
            .cast("long").as("cents"))
      val (inDir, _) = StreamStateProbe.writeSliced(shaped, 2L * 86400000L)
      val (fmDef, sFmDef, bFm) = runSliced(spark, rocksDb = false, inDir,
        Streaming.funnelPipeline(10L))
      val (fmRocks, sFmRocks, _) = runSliced(spark, rocksDb = true, inDir,
        Streaming.funnelPipeline(10L))
      val (twsRocks, sTws, _) = runSliced(spark, rocksDb = true, inDir,
        Streaming.funnelTwsPipeline(10L))
      graft.streaming.Streaming.rmTree(new java.io.File(inDir))
      println(s"""{"metric":"stream_funnel_api_ab_rows_per_sec",""" +
        s""""fmgws_default":${fmDef.round},"fmgws_rocksdb":${fmRocks.round},""" +
        s""""tws_rocksdb":${twsRocks.round},"batches":$bFm,""" +
        s""""peak_state_rows_fmgws_default":$sFmDef,""" +
        s""""peak_state_rows_fmgws_rocksdb":$sFmRocks,""" +
        s""""peak_state_rows_tws":$sTws,"corpus":"$abDir"}""")
    }
    val skewDir = sys.env.getOrElse("SPARK_GRAFT_SKEW_DIR", "target/sfskew")
    if (new java.io.File(s"$skewDir/events.parquet").exists()) {
      val shaped = Tables.events(spark, skewDir)
        .select(org.apache.spark.sql.functions.col("ts").as("timestamp"),
          col("ts_ms"), col("event_id"), col("user_id"), col("event_type"),
          org.apache.spark.sql.functions.floor(col("value") * 100 + 0.5)
            .cast("long").as("cents"))
      val (inDir, _) = StreamStateProbe.writeSliced(shaped, 2L * 86400000L)
      val (dRps, dRows, dBytes) = runPairsSkew(spark, rocksDb = false, inDir)
      val (rRps, rRows, rBytes) = runPairsSkew(spark, rocksDb = true, inDir)
      graft.streaming.Streaming.rmTree(new java.io.File(inDir))
      println(s"""{"metric":"stream_pairs_skew_rows_per_sec","default":${dRps.round},""" +
        s""""rocksdb":${rRps.round},"peak_state_rows_default":$dRows,""" +
        s""""peak_state_rows_rocksdb":$rRows,"peak_state_bytes_default":$dBytes,""" +
        s""""peak_state_bytes_rocksdb":$rBytes,"corpus":"$skewDir"}""")
    }
    spark.stop()
  }
}
