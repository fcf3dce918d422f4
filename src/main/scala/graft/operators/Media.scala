package graft.operators

import graft.Tables
import graft.functions.TextHash.hash60
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §7 L4): treat image/audio/video
  * as opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction / frame-sampling over them.
  *
  * The container has no media codecs, so the decode step is a
  * **clearly-marked deterministic STUB** (`FakeCodec`): it derives fake
  * dimensions from the md5 digest. Everything around it — the binary
  * column schema, the per-partition batch iteration, the explode of
  * sampled frames, partition-count discipline — is real Spark plumbing
  * that would carry a real codec unchanged.
  *
  * Binary payloads are derived deterministically from `documents.text`
  * (`encode(text, 'utf-8')`) so the whole path is oracle-checkable in
  * SQL down to per-frame digests of blob slices.
  */
object Media {

  /** Typed record for the Dataset/mapPartitions path. */
  final case class MediaFile(doc_id: Long, media_type: String, content: Array[Byte])

  /** STUB decoder output — in production this would come from an image/
    * audio library decoding `content`. */
  final case class MediaMeta(doc_id: Long, media_type: String, byte_len: Long,
      width: Long, height: Long, n_frames: Long)

  // single source of truth for the payload derivation and the stub
  // frame-count formula — features() and frames() must never disagree
  // on these (a real decoder replaces exactly these definitions)
  private val mediaTypeCol =
    when(col("doc_id") % 3 === 0, "image")
      .when(col("doc_id") % 3 === 1, "audio")
      .otherwise("video")
  private val contentCol = encode(col("text"), "utf-8").cast("binary")
  private def nFramesOf(byteLen: org.apache.spark.sql.Column) = byteLen % 7 + 1

  /** The opaque-binary media table derived from documents. */
  def payloads(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), mediaTypeCol.as("media_type"),
      contentCol.as("content"))

  /** payloads + the source text column carried through (features and
    * frames need it for oracle-portable slicing). One projection over
    * one scan — deriving the payload columns alongside `text` instead
    * of re-joining `payloads(docs)` back to the same table (Catalyst
    * does NOT collapse a self-join of two scans of the same file). */
  private def payloadsWithText(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"), mediaTypeCol.as("media_type"),
      contentCol.as("content"))

  /** Per-file metadata + STUB-decoded features, as pure column
    * expressions (codegen-friendly path). Fake dims derive from the
    * digest; a real decoder would replace exactly these expressions. */
  def features(docs: DataFrame): DataFrame = {
    val p = payloadsWithText(docs)
    p.select(col("doc_id"), col("media_type"),
        octet_length(col("content")).cast("long").as("byte_len"),
        md5(col("content")).as("digest"),
        // header bytes via the text column (pure-ASCII corpus, so the
        // first 8 chars ARE the first 8 bytes; DuckDB can't slice BLOBs)
        hex(encode(substring(col("text"), 1, 8), "utf-8")).as("header_hex"))
      .withColumn("h", hash60(col("digest")))
      .select(col("doc_id"), col("media_type"), col("byte_len"), col("digest"),
        col("header_hex"),
        // STUB decode: deterministic fake dimensions (no codec in env)
        (lit(16L) + pmod(col("h"), lit(1905L))).as("width"),
        (lit(16L) + pmod(shiftright(col("h"), 11), lit(1065L))).as("height"),
        nFramesOf(col("byte_len")).as("n_frames"))
  }

  /** Frame sampling: explode each file into its sampled frames and
    * digest the frame byte-slices — the shape of a video keyframe
    * extractor, with slicing real and decode stubbed. */
  def frames(docs: DataFrame, chunk: Int = 16): DataFrame = {
    // byte_len / n_frames re-derive from the shared content/frame-count
    // definitions in the same projection — one scan, no join back
    // through features()
    docs.select(col("doc_id"), col("text"),
        octet_length(contentCol).cast("long").as("byte_len"))
      .withColumn("n_frames", nFramesOf(col("byte_len")))
      .withColumn("stride", floor(col("byte_len") / col("n_frames")).cast("long"))
      .select(col("doc_id"), col("stride"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_no"),
        col("text"))
      .select(col("doc_id"), col("frame_no"),
        (col("frame_no") * col("stride")).as("offset"),
        // frame byte-slice via the text column (ASCII ⇒ chars == bytes;
        // substring with a column start position needs the SQL form)
        md5(expr(s"substring(text, cast(frame_no * stride + 1 as int), $chunk)"))
          .as("frame_digest"))
  }

  /** Cross-media duplicate-frame detection: frame digests that appear
    * in MORE THAN ONE media file — the frame-level dedup a multimodal
    * pipeline runs after sampling (two videos sharing frames are
    * re-encodes/clips of each other; with a real perceptual hash in
    * place of the STUB digest, near-identical frames land in the same
    * group). One map-side-combined hash-agg over the frame relation;
    * the digest shuffle carries (digest, doc_id), never frame bytes. */
  def frameDedup(docs: DataFrame): DataFrame =
    frames(docs)
      .groupBy(col("frame_digest"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_frames"), min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") > 1)

  /** Media-corpus report card — the per-modality screen a curator reads
    * before mixing media into a training set: file count, byte volume,
    * frame mass, exact-duplicate payloads (distinct digests vs files),
    * and the stub-decoded dimension range. One hash-agg over
    * [[features]]' single-scan projection; every measure is an integer,
    * so partial-agg merge order cannot move a bit. */
  def mediaReport(docs: DataFrame): DataFrame =
    features(docs).groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("byte_len")).as("total_bytes"),
        max(col("byte_len")).as("max_bytes"),
        sum(col("n_frames")).as("total_frames"),
        countDistinct(col("digest")).as("n_distinct"),
        min(col("width")).as("min_width"),
        max(col("width")).as("max_width"))
      .withColumn("dup_files", col("n_files") - col("n_distinct"))

  /** Typed mapPartitions decode path: batch-iterates binary records per
    * partition (the Scala analog of a batched pandas UDF). The codec is
    * a STUB; the iteration, schema, and partitioning are real. Produces
    * the same values as [[features]] so the two paths cross-check. */
  def decodeTyped(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads(docs).as[MediaFile].mapPartitions { it =>
      val mdi = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        // STUB decode — a real implementation would parse m.content here.
        val len = m.content.length.toLong
        val digest = mdi.digest(m.content).map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(
          mdi.digest(digest.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
        MediaMeta(m.doc_id, m.media_type, len,
          16L + h % 1905L, 16L + (h >> 11) % 1065L, len % 7 + 1)
      }
    }
  }

  /** Training-shard planner (the WebDataset/TFRecord packing step):
    * per modality, files hash into ⌈total_bytes / targetBytes⌉ shards
    * — homogeneous per-modality shards, sized for sequential reads.
    * Hash placement (not greedy bin-packing) is the scale choice: no
    * ordering, no state, balanced in expectation, and any worker can
    * recompute a file's shard from its id alone; the balance_ratio
    * column quantifies the skew the hash actually achieved (1.0 =
    * perfectly even). Per-type shard counts ride a 1-row-per-type
    * broadcast; one scan of the payload relation. */
  def mediaShards(docs: DataFrame, targetBytes: Long = 4096L): DataFrame = {
    val m = payloads(docs).select(col("doc_id"), col("media_type"),
      length(col("content")).cast("long").as("byte_len"))
    val tot = m.groupBy(col("media_type")).agg(sum(col("byte_len")).as("tb"))
      .withColumn("n_shards", expr(s"(tb + ${targetBytes - 1}) div $targetBytes"))
    m.join(broadcast(tot), "media_type")
      .withColumn("shard_id", pmod(graft.functions.TextHash.hash60(
        concat(lit("shard|"), col("doc_id").cast("string"))), col("n_shards")))
      .groupBy(col("media_type"), col("shard_id"))
      .agg(count(lit(1)).as("n_files"), sum(col("byte_len")).as("shard_bytes"))
      .join(broadcast(tot), "media_type")
      .select(col("media_type"), col("shard_id"), col("n_files"),
        col("shard_bytes"), col("n_shards"),
        // shard_bytes·n_shards is byte-mass × shard-count (≫ 2^63 at
        // petabyte media types): exact DECIMAL product, one double
        // division (round-10 overflow audit)
        graft.functions.Portable.trunc4(
          (col("shard_bytes").cast("decimal(38,0)") * col("n_shards"))
            .cast("double") / col("tb")).as("balance_ratio"))
  }

  // ---- driver wiring ----

  /** Corrupt-blob triage — the ingest screen a multimodal pipeline runs
    * BEFORE paying decode cost on every payload (a truncated JPEG
    * crashes or poisons the batch decoder; catching it from cheap
    * byte-level signals is standard). The perturbed table is payloads
    * plus a deterministic damaged copy per blob (doc_id-keyed, the
    * TextOps.perturbed idiom): every 3rd truncated to 3 bytes, every
    * 3rd+1 emptied, the rest intact re-uploads. Verdicts from pure
    * byte-level expressions — `empty` (0 bytes), `truncated`
    * (< `minLen` bytes, the smallest plausible header), else `ok` —
    * rolled up per media_type with byte-mass accounting.
    *
    * Scale: one scan, a 2-row explode per blob, per-row byte checks
    * (no decode, no shuffle except the ≤ |types|×|verdicts| rollup —
    * map-side combined). A real pipeline swaps the verdict expressions
    * for magic-byte tables; the plumbing is identical. */
  def corruptAudit(docs: DataFrame, minLen: Long = 8L): DataFrame = {
    val off = 1L << 40
    val p = payloadsWithText(docs)
    val damaged = p.select(col("doc_id"), col("media_type"), explode(array(
        struct(col("doc_id").as("blob_id"), col("content").as("content")),
        struct((col("doc_id") + off).as("blob_id"),
          when(col("doc_id") % 3 === 0, encode(substring(col("text"), 1, 3), "utf-8").cast("binary"))
            .when(col("doc_id") % 3 === 1, encode(lit(""), "utf-8").cast("binary"))
            .otherwise(col("content")).as("content")))).as("r"))
      .select(col("media_type"), col("r.blob_id").as("blob_id"),
        octet_length(col("r.content")).cast("long").as("byte_len"))
    damaged
      .withColumn("verdict",
        when(col("byte_len") === 0, "empty")
          .when(col("byte_len") < minLen, "truncated")
          .otherwise("ok"))
      .groupBy(col("media_type"), col("verdict"))
      .agg(count(lit(1)).as("n_blobs"), sum(col("byte_len")).as("bytes"))
      .withColumn("type_blobs", sum(col("n_blobs")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("media_type"))))
      .select(col("media_type"), col("verdict"), col("n_blobs"), col("bytes"),
        graft.functions.Portable.trunc4(col("n_blobs") / col("type_blobs")).as("share"))
  }

  /** REAL decode end-to-end (VERDICT r10 directive 6): every document
    * renders as an actual RIFF/WAVE PCM file ([[graft.functions.Wav]]
    * — real header, `fmt ` body, a JUNK chunk before `data` so
    * fixed-offset cheats fail, text bytes as 8-bit samples), a
    * deterministic minority is damaged relationally (every 7th file
    * truncated to 10 bytes; every 7th+3 has its RIFF magic flipped to
    * RIFX), and the native `wav_header` expression DECODES THE BYTES —
    * chunk walk, little-endian fields, NULL verdicts for the damaged
    * files. The oracle never parses binary: synthesis parameters are
    * doc_id closed forms, so DuckDB predicts exactly what an honest
    * decoder must recover (and that the damaged files must read as
    * invalid). Per-row codegen'd expressions, one scan, no shuffle —
    * the decode cost profile a 100 TB media ingest pays. */
  def wavAudit(docs: DataFrame): DataFrame = {
    import graft.functions.Wav.{wavHeader, wavSynth}
    val wav = docs.select(col("doc_id"),
      wavSynth(col("doc_id"), col("text")).as("content"))
    val damaged = wav.withColumn("content",
      when(col("doc_id") % 7 === 0, expr("substring(content, 1, 10)"))
        .when(col("doc_id") % 7 === 3,
          concat(encode(lit("RIFX"), "utf-8"),
            expr("substring(content, 5, 2147483647)")))
        .otherwise(col("content")))
    damaged
      .select(col("doc_id"),
        octet_length(col("content")).cast("long").as("wav_bytes"),
        wavHeader(col("content")).as("h"))
      .select(col("doc_id"), col("wav_bytes"),
        col("h").isNotNull.as("ok"),
        col("h.channels").as("channels"),
        col("h.sample_rate").as("sample_rate"),
        col("h.bits").as("bits"),
        col("h.data_bytes").as("data_bytes"),
        col("h.n_samples").as("n_samples"),
        expr("h.n_samples * 1000 div h.sample_rate").as("duration_ms"))
  }

  /** Second REAL decode end-to-end (sibling of [[wavAudit]], raster
    * side): every document renders as an actual 24-bit uncompressed
    * BMP ([[graft.functions.Bmp]] — real file+info headers, BOTTOM-UP
    * rows in BGR with 4-byte stride padding, and a doc_id-sized gap
    * between header and pixel array so fixed-offset-54 cheats read
    * garbage), a deterministic minority is damaged relationally (every
    * 9th file truncated to 20 bytes; every 9th+4 has its 'BM' magic
    * flipped to 'BX'), and the native `bmp_stats` expression DECODES
    * THE BYTES — header walk, bounds checks, exact BIGINT channel sums
    * over the padded rows, and the LOGICAL top-left pixel, which lives
    * in the LAST stored row: a decoder that ignores the bottom-up
    * layout returns the bottom row's values and fails the oracle. The
    * oracle never parses binary — synthesis parameters are doc_id/len
    * closed forms, so DuckDB predicts arithmetically what an honest
    * decoder must recover. Per-row codegen'd expressions, one scan, no
    * shuffle — the raster-decode cost profile of a 100 TB image
    * ingest. */
  def bmpAudit(docs: DataFrame): DataFrame = {
    import graft.functions.Bmp.{bmpStats, bmpSynth}
    val bmp = docs.select(col("doc_id"),
      bmpSynth(col("doc_id"), col("text")).as("content"))
    val damaged = bmp.withColumn("content",
      when(col("doc_id") % 9 === 0, expr("substring(content, 1, 20)"))
        .when(col("doc_id") % 9 === 4,
          concat(encode(lit("BX"), "utf-8"),
            expr("substring(content, 3, 2147483647)")))
        .otherwise(col("content")))
    damaged
      .select(col("doc_id"),
        octet_length(col("content")).cast("long").as("bmp_bytes"),
        bmpStats(col("content")).as("h"))
      .select(col("doc_id"), col("bmp_bytes"),
        col("h").isNotNull.as("ok"),
        col("h.width").as("width"), col("h.height").as("height"),
        col("h.stride").as("stride"),
        col("h.sum_b").as("sum_b"), col("h.sum_g").as("sum_g"),
        col("h.sum_r").as("sum_r"),
        col("h.tl_b").as("tl_b"), col("h.tl_g").as("tl_g"),
        col("h.tl_r").as("tl_r"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_bmp" -> ((s, d) => bmpAudit(Tables.documents(s, d))),
    "q_media_wav" -> ((s, d) => wavAudit(Tables.documents(s, d))),
    "q_media_corrupt" -> ((s, d) => corruptAudit(Tables.documents(s, d))),
    "q_media_features" -> ((s, d) => features(Tables.documents(s, d))),
    "q_media_frames" -> ((s, d) => frames(Tables.documents(s, d))),
    "q_media_dedup" -> ((s, d) => frameDedup(Tables.documents(s, d))),
    "q_media_shards" -> ((s, d) => mediaShards(Tables.documents(s, d))),
    "q_media_report" -> ((s, d) => mediaReport(Tables.documents(s, d))))

  val oracleSql: Map[String, String] = Map(
    // closed-form synth parameters; the Spark side DECODES real bytes
    // and must land on exactly these values (damaged files → NULLs)
    "q_media_bmp" ->
      ("WITH p AS (SELECT doc_id, length(text)::BIGINT len FROM documents), " +
        "par AS (SELECT doc_id, 2 + doc_id % 6 AS w, 1 + doc_id % 4 AS h, " +
        "2 * (doc_id % 4) AS gap, 31 * doc_id + 7 * len AS seed FROM p), " +
        "g AS (SELECT doc_id, w, h, gap, seed, w * h AS npix, " +
        "((3 * w + 3) // 4) * 4 AS stride FROM par), " +
        "v AS (SELECT doc_id, w, h, stride, seed, npix, " +
        "CASE WHEN doc_id % 9 = 0 THEN 20 " +
        "ELSE 54 + gap + stride * h END AS bmp_bytes, " +
        "doc_id % 9 NOT IN (0, 4) AS ok FROM g) " +
        "SELECT doc_id, bmp_bytes, ok, " +
        "CASE WHEN ok THEN w END AS width, " +
        "CASE WHEN ok THEN h END AS height, " +
        "CASE WHEN ok THEN stride END AS stride, " +
        "CASE WHEN ok THEN list_sum([(seed + 3 * q) % 256 " +
        "FOR q IN range(0, npix)])::BIGINT END AS sum_b, " +
        "CASE WHEN ok THEN list_sum([(seed + 3 * q + 1) % 256 " +
        "FOR q IN range(0, npix)])::BIGINT END AS sum_g, " +
        "CASE WHEN ok THEN list_sum([(seed + 3 * q + 2) % 256 " +
        "FOR q IN range(0, npix)])::BIGINT END AS sum_r, " +
        "CASE WHEN ok THEN seed % 256 END AS tl_b, " +
        "CASE WHEN ok THEN (seed + 1) % 256 END AS tl_g, " +
        "CASE WHEN ok THEN (seed + 2) % 256 END AS tl_r FROM v"),
    "q_media_wav" ->
      ("WITH p AS (SELECT doc_id, length(text)::BIGINT len FROM documents), " +
        "par AS (SELECT doc_id, len, 1 + doc_id % 2 AS c, " +
        "8000 * (1 + doc_id % 4) AS r, 2 * (doc_id % 4) AS j FROM p), " +
        "f AS (SELECT doc_id, c, r, j, len - (len % c) AS data_len FROM par), " +
        "v AS (SELECT doc_id, c, r, data_len, " +
        "CASE WHEN doc_id % 7 = 0 THEN 10 ELSE 52 + j + data_len END AS wav_bytes, " +
        "doc_id % 7 NOT IN (0, 3) AS ok FROM f) " +
        "SELECT doc_id, wav_bytes, ok, " +
        "CASE WHEN ok THEN c END AS channels, " +
        "CASE WHEN ok THEN r END AS sample_rate, " +
        "CASE WHEN ok THEN 8 END AS bits, " +
        "CASE WHEN ok THEN data_len END AS data_bytes, " +
        "CASE WHEN ok THEN data_len // c END AS n_samples, " +
        "CASE WHEN ok THEN (data_len // c) * 1000 // r END AS duration_ms FROM v"),
    "q_media_corrupt" ->
      ("WITH p AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'image' " +
        "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END media_type, " +
        "length(text)::BIGINT blen FROM documents), " +
        "dmg AS (SELECT media_type, blob_id, byte_len FROM p, LATERAL (VALUES " +
        "(p.doc_id, p.blen), " +
        "(p.doc_id + 1099511627776, CASE WHEN p.doc_id % 3 = 0 THEN least(3, p.blen) " +
        "WHEN p.doc_id % 3 = 1 THEN 0 ELSE p.blen END)) t(blob_id, byte_len)), " +
        "v AS (SELECT media_type, blob_id, byte_len, " +
        "CASE WHEN byte_len = 0 THEN 'empty' WHEN byte_len < 8 THEN 'truncated' " +
        "ELSE 'ok' END verdict FROM dmg), " +
        "g AS (SELECT media_type, verdict, count(*)::BIGINT n_blobs, " +
        "sum(byte_len)::BIGINT bytes FROM v GROUP BY 1, 2) " +
        "SELECT media_type, verdict, n_blobs, bytes, " +
        "floor(n_blobs / (sum(n_blobs) OVER (PARTITION BY media_type)) * 10000) / 10000 " +
        "AS share FROM g"),
    "q_media_features" ->
      ("WITH p AS (SELECT doc_id, text, CASE WHEN doc_id % 3 = 0 THEN 'image' " +
        "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END media_type, " +
        "encode(text) AS payload FROM documents), " +
        "m AS (SELECT doc_id, media_type, octet_length(payload)::BIGINT byte_len, " +
        "md5(text) digest, hex(encode(substr(text, 1, 8))) header_hex FROM p), " +
        "h AS (SELECT *, ('0x'||substr(md5(digest),1,15))::BIGINT hv FROM m) " +
        "SELECT doc_id, media_type, byte_len, digest, header_hex, " +
        "16 + (hv % 1905) AS width, 16 + ((hv >> 11) % 1065) AS height, " +
        "byte_len % 7 + 1 AS n_frames FROM h"),
    "q_media_frames" ->
      ("WITH p AS (SELECT doc_id, text, " +
        "octet_length(encode(text))::BIGINT byte_len FROM documents), " +
        "f AS (SELECT doc_id, text, byte_len % 7 + 1 n_frames, " +
        "(byte_len // (byte_len % 7 + 1))::BIGINT stride FROM p), " +
        "x AS (SELECT doc_id, text, stride, unnest(range(0, n_frames)) frame_no FROM f) " +
        "SELECT doc_id, frame_no, frame_no * stride AS offset, " +
        "md5(substr(text, (frame_no * stride + 1)::INT, 16)) AS frame_digest FROM x"),
    "q_media_report" ->
      ("WITH p AS (SELECT doc_id, text, CASE WHEN doc_id % 3 = 0 THEN 'image' " +
        "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END media_type, " +
        "encode(text) AS payload FROM documents), " +
        "m AS (SELECT doc_id, media_type, octet_length(payload)::BIGINT byte_len, " +
        "md5(text) digest FROM p), " +
        "h AS (SELECT *, ('0x'||substr(md5(digest),1,15))::BIGINT hv FROM m), " +
        "f AS (SELECT media_type, byte_len, digest, " +
        "16 + (hv % 1905) AS width, byte_len % 7 + 1 AS n_frames FROM h) " +
        "SELECT media_type, count(*) AS n_files, sum(byte_len)::BIGINT AS total_bytes, " +
        "max(byte_len) AS max_bytes, sum(n_frames)::BIGINT AS total_frames, " +
        "count(DISTINCT digest) AS n_distinct, min(width) AS min_width, " +
        "max(width) AS max_width, " +
        "count(*) - count(DISTINCT digest) AS dup_files FROM f GROUP BY 1"),
    "q_media_shards" ->
      ("WITH p AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'image' " +
        "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END media_type, " +
        "octet_length(encode(text))::BIGINT byte_len FROM documents), " +
        "t AS (SELECT media_type, sum(byte_len)::BIGINT tb, " +
        "(sum(byte_len)::BIGINT + 4095) // 4096 AS n_shards FROM p GROUP BY 1), " +
        "sh AS (SELECT p.media_type, " +
        "('0x'||substr(md5('shard|'||doc_id::VARCHAR),1,15))::BIGINT % n_shards AS shard_id, " +
        "byte_len FROM p JOIN t USING (media_type)), " +
        "g AS (SELECT media_type, shard_id, count(*) n_files, " +
        "sum(byte_len)::BIGINT shard_bytes FROM sh GROUP BY 1, 2) " +
        "SELECT g.media_type, shard_id, n_files, shard_bytes, n_shards::BIGINT AS n_shards, " +
        "floor(shard_bytes * n_shards / tb * 10000) / 10000 AS balance_ratio " +
        "FROM g JOIN t USING (media_type)"),
    "q_media_dedup" ->
      ("WITH p AS (SELECT doc_id, text, " +
        "octet_length(encode(text))::BIGINT byte_len FROM documents), " +
        "f AS (SELECT doc_id, text, byte_len % 7 + 1 n_frames, " +
        "(byte_len // (byte_len % 7 + 1))::BIGINT stride FROM p), " +
        "x AS (SELECT doc_id, text, stride, unnest(range(0, n_frames)) frame_no FROM f), " +
        "fr AS (SELECT doc_id, " +
        "md5(substr(text, (frame_no * stride + 1)::INT, 16)) AS frame_digest FROM x) " +
        "SELECT frame_digest, count(DISTINCT doc_id) AS n_docs, " +
        "count(*) AS n_frames, min(doc_id) AS first_doc FROM fr GROUP BY 1 " +
        "HAVING count(DISTINCT doc_id) > 1"))
}
