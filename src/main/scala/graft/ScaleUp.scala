package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic scale-up: replicate a testdata directory
  * `factor`× into clone-offset keys and clone-perturbed payloads —
  * the load-testing primitive for measuring how each operator family
  * SCALES without waiting on a bigger generated corpus.
  *
  * Usage: `runMain graft.ScaleUp <srcDir> <outDir> <factor> [--skew]`
  * (`--skew` additionally plants one flash-sale merchant and one hot
  * user at ~100× average density — the hub-cap stress corpus; see the
  * events rep below)
  *
  * Design (what makes the copy measurement-honest):
  *  - every key space is offset by `clone · 10M`, applied CONSISTENTLY
  *    across tables (c_custkey, o_custkey, events.user_id AND the
  *    merchant key inside events.props share the offset), so
  *    intra-clone joins behave exactly like the original and
  *    cross-clone keys never collide; nation/region dims stay shared,
  *    like a real multi-tenant load.
  *  - events additionally shift clone·35 days, so clones occupy
  *    DISJOINT months: per-(merchant, hour) cells, day buckets and
  *    watermark horizons keep their original density while history
  *    grows 10× — scale without densification, the same contract the
  *    embedding rotation keeps (the shared-merchant/shared-time form
  *    was measured turning the cell-guarded pair ops Θ(density²):
  *    q_graph_triangles 102× at 10× data).
  *  - clone 0 is the identity — the original rows survive byte-exact.
  *  - `documents.text` is re-tokenized with every 5th token (phase
  *    shifted per clone) replaced by a clone-salted hash token:
  *    cross-clone shingle Jaccard collapses (~0.2, far under any
  *    near-dup threshold) so dedup candidate volume scales like a real
  *    corpus instead of quadraticizing on 10-way exact clones, while
  *    WITHIN-clone near-dup density stays exactly the original.
  *  - `embeddings` are dimension-ROTATED per clone (cyclic shift by
  *    clone·7+1): rotation preserves the marginal value distribution,
  *    norms and per-label geometry WITHIN a clone, while a vector and
  *    its rotation are as uncorrelated as two random draws — so the
  *    scaled corpus has 10× vectors at the ORIGINAL near-neighbor
  *    density instead of every vector acquiring 9 quasi-duplicates
  *    (a 1.01×-one-dim perturbation was measured doing exactly that:
  *    clones landed in identical LSH bands and q_knn_graph's candidate
  *    volume went quadratic — 21× time at 10× data; rotation restores
  *    the ~linear candidate growth).
  *  - `events.ts` stays in its on-disk representation (raw nanos under
  *    `nanosAsLong`; the clone shift is integer nano arithmetic), so
  *    the scaled directory reads through [[Tables.events]] exactly
  *    like a driver-generated one.
  */
object ScaleUp {
  private val Stride = 10000000L

  /** The skew-mode hot key (merchant AND user id). It sits inside the
    * clone-offset key space past clone 9 (clone·Stride + original id
    * reaches 99,999,999 at factor 10 with a 9,999,999 original id), so
    * [[scaleAll]] ENFORCES factor < 10 under --skew instead of
    * trusting a comment — silently merging planted skew with a cloned
    * key would corrupt the skew pins (round-9 advice). */
  val HotKey = 99999999L

  /** Skew-mode fold target: hot-merchant traffic lands inside this one
    * UTC day (the "flash-sale" shape), inside the corpus's time range. */
  private val HotDayNanos = 1704844800000000000L // 2024-01-10T00:00Z
  private val DayNanos = 86400000000000L

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args.take(3)
    val factor = factorS.toInt
    val skew = args.drop(3).contains("--skew")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)
    scaleAll(spark, src, out, factor, skew)
    spark.stop()
  }

  def scaleAll(spark: SparkSession, src: String, out: String, factor: Int,
      skew: Boolean = false): Unit = {
    require(!skew || factor < 10,
      s"--skew requires factor < 10: HotKey=$HotKey aliases clone-offset " +
        s"keys from clone 9 on (clone*$Stride + id), which would silently " +
        "merge the planted hot key with a cloned key")
    val clones = spark.range(0, factor).select(col("id").as("clone"))
    def rep(name: String)(f: DataFrame => DataFrame): Unit = {
      val df = spark.read.parquet(s"$src/$name.parquet")
        .crossJoin(broadcast(clones))
      f(df).drop("clone").repartition(8)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    def off(c: String): Column = col(c) + col("clone") * Stride

    // shared dims: one copy, no clone column
    for (d <- Seq("region", "nation"))
      spark.read.parquet(s"$src/$d.parquet")
        .write.mode("overwrite").parquet(s"$out/$d.parquet")

    rep("customer")(_.withColumn("c_custkey", off("c_custkey"))
      .withColumn("c_name", concat(col("c_name"), lit("#"), col("clone"))))
    rep("supplier")(_.withColumn("s_suppkey", off("s_suppkey"))
      .withColumn("s_name", concat(col("s_name"), lit("#"), col("clone"))))
    rep("part")(_.withColumn("p_partkey", off("p_partkey")))
    rep("orders")(_.withColumn("o_orderkey", off("o_orderkey"))
      .withColumn("o_custkey", off("o_custkey")))
    rep("lineitem")(_.withColumn("l_orderkey", off("l_orderkey"))
      .withColumn("l_partkey", off("l_partkey"))
      .withColumn("l_suppkey", off("l_suppkey")))
    // events scale on the two axes a real 10× business grows along —
    // MORE KEYS and LONGER HISTORY — never densification:
    //  - the merchant key inside props gets the SAME clone offset as
    //    every other key (it was the one key the offset rule missed:
    //    shared merchants made every (merchant, hour) cell 10× denser,
    //    and the cell-guarded pair ops measured Θ(density²) — the
    //    full-board sf1 run read q_graph_triangles at 102× for 10×
    //    data from exactly this);
    //  - each clone shifts by clone·35 days (the 30-day span + a gap),
    //    so clones occupy disjoint months: per-day/hour bucket
    //    populations, watermark horizons and week counts all stay at
    //    ORIGINAL density while the history grows 10× — the same
    //    "10× data at original local density" contract the embedding
    //    rotation and document token-salting keep.
    rep("events") { df =>
      // ts arrives as TIMESTAMP(MICROS)/NTZ from the generated corpus,
      // or as raw nano longs under the nanosAsLong read path — shift
      // whichever representation is on disk
      val shifted = df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", col("ts") + col("clone") * lit(35L * 86400000000000L))
        case _ =>
          df.withColumn("ts", expr("timestampadd(DAY, cast(clone * 35 as int), ts)"))
      }
      val scaled = shifted.withColumn("event_id", off("event_id"))
        .withColumn("user_id", off("user_id"))
        .withColumn("props", expr(
          // the corpus writes props as exactly {"k": N}; rebuild with the
          // offset key and keep any other shape untouched
          s"""IF(props RLIKE '^\\\\{"k": [0-9]+\\\\}$$', concat('{"k": ', cast(get_json_object(props, '$$.k') as bigint) + clone * ${Stride}L, '}'), props)"""))
      // --skew: the adversarial load shape the clean scale-up
      // deliberately avoids — ONE merchant receives ¼ of ALL traffic
      // (~100× an average merchant at factor ≥ 3) AND that traffic is
      // folded into a single UTC day (flash-sale: per-(merchant, hour)
      // cells at hundreds of distinct users, where the clean corpus
      // peaks at ~9), plus ONE user emitting ¼ of all events. This is
      // the corpus the hub caps (coEdges maxCell, fan/df caps) exist
      // for; ScaleSpec pins that capped operators stay bounded on it
      // and that capAudit reports the truncation. Slices key on the
      // PRE-offset event id (stride is a multiple of 4), so every
      // clone contributes the same deterministic quarter.
      if (!skew) scaled else {
        val hotM = expr("pmod(event_id, 4) = 0")
        val hotU = expr("pmod(event_id, 4) = 2")
        val folded = scaled.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            scaled.withColumn("ts",
              when(hotM, lit(HotDayNanos) + pmod(col("ts"), lit(DayNanos)))
                .otherwise(col("ts")))
          case t =>
            // keep the column's exact timestamp flavor (NTZ vs LTZ):
            // micros-of-day via date_trunc/diff works on both
            val day0 = if (t.typeName == "timestamp_ntz")
              "timestamp_ntz'2024-01-10 00:00:00'"
            else "timestamp'2024-01-10 00:00:00'"
            scaled.withColumn("ts", expr(
              "IF(pmod(event_id, 4) = 0, timestampadd(MICROSECOND, " +
                s"timestampdiff(MICROSECOND, date_trunc('DAY', ts), ts), $day0), ts)"))
        }
        folded
          .withColumn("props",
            when(hotM, lit(s"""{"k": $HotKey}""")).otherwise(col("props")))
          .withColumn("user_id",
            when(hotU, lit(HotKey)).otherwise(col("user_id")))
      }
    }
    rep("documents") { df =>
      val perturbed = array_join(
        expr("transform(split(text, ' '), (t, i) -> " +
          "IF(clone > 0 AND pmod(i + clone, 5) = 0, " +
          "concat('zz', substr(md5(concat(t, clone)), 1, 6)), t))"), " ")
      df.withColumn("doc_id", off("doc_id"))
        .withColumn("text", perturbed)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    rep("embeddings")(df => rotateEmbeddings(df.withColumn("vec_id", off("vec_id"))))
  }

  /** Clone-rotation for an embeddings frame carrying a `clone` column:
    * rotation = pmod(clone·7, dim−1)+1 ∈ [1, dim−1] for EVERY clone, so
    * no clone can land on a zero shift and alias clone 0 byte-exact
    * (the old clone·7+1 form hit pmod(64, 64) = 0 at clone 9 with
    * dim 64, reintroducing exactly the quasi-duplicate LSH band
    * collapse the rotation exists to avoid — 20% of vectors gained a
    * cos=1.0 twin at factor 10). Slice is 1-indexed and preserves the
    * float element type; clone 0 stays the identity. */
  private[graft] def rotateEmbeddings(df: DataFrame): DataFrame = df
    .withColumn("rot", expr("cast(pmod(clone * 7, size(embedding) - 1) + 1 as int)"))
    .withColumn("embedding", expr(
      "IF(clone = 0, embedding, concat(" +
        "slice(embedding, rot + 1, size(embedding) - rot), " +
        "slice(embedding, 1, rot)))"))
    .drop("rot")
}
