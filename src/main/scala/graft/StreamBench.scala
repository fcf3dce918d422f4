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

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val seconds = sys.env.getOrElse("SPARK_GRAFT_STREAM_SECS", "20").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (defRps, defBatches) = run(spark, rocksDb = false, seconds)
    val (rocksRps, rocksBatches) = run(spark, rocksDb = true, seconds)
    println(s"""{"metric":"stream_rows_per_sec","default":${defRps.round},""" +
      s""""rocksdb":${rocksRps.round},"batches_default":$defBatches,""" +
      s""""batches_rocksdb":$rocksBatches,"seconds_each":$seconds}""")
    spark.stop()
  }
}
