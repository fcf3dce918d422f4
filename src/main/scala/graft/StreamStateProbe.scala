package graft

import graft.streaming.Streaming
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import java.nio.file.Files

/** Peak-state decade probe for the stateful streaming family — the
  * PRODUCTION-PACED counterpart of ScaleProbe's replay measurements.
  *
  * Why it exists: the driver-oracled `q_stream_*` replays use a
  * two-phase `Trigger.AvailableNow` harness, so phase A lands the
  * WHOLE corpus in essentially one micro-batch with the watermark
  * still at epoch 0 — every window in the timeline is simultaneously
  * live, and peak `StateOperatorProgress.numRowsTotal` is
  * corpus-proportional BY HARNESS DESIGN (measured: 10.0× state for
  * 10× events across the whole family). That is the well-known
  * backfill failure shape, not an operator property. A production
  * pipeline (or a disciplined backfill) feeds the same operators
  * time-ordered bounded batches, the watermark advances BETWEEN
  * batches, and live state is O(traffic in the watermark/lookback
  * horizon).
  *
  * This probe measures exactly that: the events corpus is written as
  * fixed-duration time slices (default 2 days, matching
  * StreamingSpec's state-bound pin), replayed with
  * `maxFilesPerTrigger=1` in slice order (deterministic modification
  * times), and each oracled pipeline's peak state rows/bytes are read
  * from the engine's own `StateOperatorProgress`. Because ScaleUp
  * clones occupy DISJOINT MONTHS (the timeline extends; per-window
  * density is constant), a 10× corpus means 10× more batches — and an
  * operator whose state is truly horizon-bounded shows a FLAT peak
  * across the decade, while O(stream) state would grow 10×.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=<dir> runMain graft.StreamStateProbe
  * Env: SPARK_GRAFT_SLICE_DAYS (default 2) — batch time span.
  * One JSON line per pipeline: input rows, batches, wall seconds,
  * peak state rows/bytes.
  */
object StreamStateProbe {

  /** Write `shaped` as one parquet file per `sliceMs` time range, file
    * names and modification times in slice order so the file source's
    * modTime ordering replays them as a time-ordered bounded backfill.
    * Shared with [[StreamBench]]'s skew-corpus state-store A/B. */
  private[graft] def writeSliced(shaped: DataFrame, sliceMs: Long): (String, Int) = {
    val dir = Files.createTempDirectory("graft-ssp").toString
    val bounds = shaped.agg(min(col("ts_ms")), max(col("ts_ms"))).head
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val n = ((hi - lo) / sliceMs + 1).toInt
    for (i <- 0 until n) {
      val scratch = s"$dir/tmp$i"
      shaped.filter(col("ts_ms") >= lo + i * sliceMs &&
          col("ts_ms") < lo + (i + 1) * sliceMs)
        .coalesce(1).write.parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir, f"slice-$i%04d.parquet")
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
      Streaming.rmTree(new java.io.File(scratch))
    }
    (dir, n)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sliceDays = sys.env.getOrElse("SPARK_GRAFT_SLICE_DAYS", "2").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // match the oracled replays' pinned state layout (8 partitions):
      // per-partition state-store commit cost dominates bounded replays
      .config("spark.sql.shuffle.partitions", "8")
      // a decade corpus at 2-day slices exceeds the default 100-entry
      // recentProgress ring; the peak must see EVERY batch
      .config("spark.sql.streaming.numRecentProgressUpdates", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shaped = Tables.events(spark, sfDir)
      .select(col("ts").as("timestamp"), col("ts_ms"), col("event_id"),
        col("user_id"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val (inDir, nSlices) = writeSliced(shaped, sliceDays * 86400000L)
    val schema = spark.read.parquet(s"$inDir/slice-0000.parquet").schema
    // 2100: the probe adds no sentinels, so the in-plan sentinel guard
    // predicates (`ts <= maxTs`) must never drop a real row
    val farFuture = new java.sql.Timestamp(4102444800000L)
    val pipes = Seq[(String, DataFrame => DataFrame)](
      "sessions" -> Streaming.sessionsPipeline(10L, 30L),
      "dedup" -> Streaming.dedupPipeline(10L, 5L),
      "pairs_outer" -> Streaming.pairsOuterPipeline(10L, 60L, farFuture),
      "asof" -> Streaming.asofPipeline(10L, 60L, farFuture))
    pipes.foreach { case (name, pipe) =>
      val ck = Files.createTempDirectory("graft-ssp-ck").toString
      val t0 = System.nanoTime()
      val q = pipe(spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir))
        .writeStream.format("noop").outputMode(OutputMode.Append())
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val ps = q.recentProgress.toSeq
      val input = ps.map(_.numInputRows).sum
      val peakRows = ps.map(_.stateOperators.map(_.numRowsTotal).sum)
        .foldLeft(0L)(math.max)
      val peakBytes = ps.map(_.stateOperators.map(_.memoryUsedBytes).sum)
        .foldLeft(0L)(math.max)
      Streaming.rmTree(new java.io.File(ck))
      println(f"""{"pipeline":"$name","input_rows":$input,"batches":${ps.count(_.numInputRows > 0)},""" +
        f""""slices":$nSlices,"wall_s":$wall%.3f,"peak_state_rows":$peakRows,""" +
        s""""peak_state_bytes":$peakBytes,"slice_days":$sliceDays,"sf":"$sfDir"}""")
    }
    Streaming.rmTree(new java.io.File(inDir))
    spark.stop()
  }
}
