package graft.operators

import graft.Tables
import graft.functions.NativeVector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over the
  * `embeddings` table (`Array[Float]`, dim 64) — SURVEY.md §7 L4.
  *
  * Two paths:
  *  - `bruteForceTopK` — exact cosine top-k against a broadcast query
  *    set. Linear scan: one pass over the vectors, no shuffle except the
  *    final per-query top-k. The correctness baseline.
  *  - `annTopK` / `nearDupPairs` — sign-random-projection LSH: 16
  *    deterministic hyperplanes → 16 sign bits → 4 bands × 4 bits.
  *    Candidates share ≥1 band with the query (or each other), so work
  *    is O(bucket collisions), not O(n·q) / O(n²) — the 100 TB path.
  *    Recall < 1 by construction; the oracle replicates the same LSH so
  *    results still hash-match.
  *
  * Hyperplane coordinates are rationals k/1000 derived from md5 in Scala
  * and embedded as literals in BOTH the Spark plan and the generated
  * oracle SQL — one source of truth, exact decimal parse in both engines.
  */
object Similarity {

  import graft.functions.Portable.trunc4

  val Dim = 64
  val NumPlanes = 16
  val Bands = 4
  val RowsPerBand = 4

  /** Deterministic pseudo-random hyperplanes: md5(s"$h,$d") → 60-bit
    * int → value in [-1, 1] with 3 decimals. */
  lazy val hyperplanes: Array[Array[Double]] = {
    val mdi = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(NumPlanes, Dim) { (h, d) =>
      val hex = mdi.digest(s"$h,$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L) / 1000.0
    }
  }

  private def planeLit(h: Int): Column =
    array(hyperplanes(h).map(lit): _*)

  /** 16 sign bits of a double-array embedding column. */
  private def signBits(embD: Column): Seq[Column] =
    (0 until NumPlanes).map(h => when(NativeVector.dot(embD, planeLit(h)) >= 0, 1).otherwise(0))

  /** Band keys: integer of 4 consecutive sign bits per band. */
  private def bandStructs(embD: Column): Column = {
    val bits = signBits(embD)
    array((0 until Bands).map { b =>
      val key = (0 until RowsPerBand)
        .map(i => bits(b * RowsPerBand + i) * lit(1 << i))
        .reduce(_ + _)
      struct(lit(b).as("band"), key.as("bkey"))
    }: _*)
  }

  /** Spread the CPU-bound per-row hyperplane-dot work across the
    * cluster (a small parquet input is 1–2 splits). Embeddings stay
    * float; NativeVector widens per element inside its codegen loop. */
  private def withEmbD(emb: DataFrame): DataFrame =
    graft.functions.Portable.spread(emb, col("vec_id"))
      .select(col("vec_id"), col("embedding").as("e"))

  /** Exact cosine top-k per query vector (queries broadcast). */
  def bruteForceTopK(emb: DataFrame, queryIds: Seq[Long], k: Int = 10): DataFrame = {
    val v = withEmbD(emb)
    val q = v.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val scored = v.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        trunc4(NativeVector.cosine(col("qe"), col("e"))).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= k)
  }

  /** LSH-bucketed ANN top-k: rank only candidates sharing a band with
    * the query. */
  def annTopK(emb: DataFrame, queryIds: Seq[Long], k: Int = 10): DataFrame = {
    val v = withEmbD(emb)
    val bands = v.select(col("vec_id"), col("e"), explode(bandStructs(col("e"))).as("bb"))
      .select(col("vec_id"), col("e"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      .persist()
    val qb = bands.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("band"), col("bkey"))
    val cand = bands.join(broadcast(qb), Seq("band", "bkey"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("qe"), col("e"))
      .dropDuplicates("q_id", "vec_id")
    val scored = cand.select(col("q_id"), col("vec_id"),
      trunc4(NativeVector.cosine(col("qe"), col("e"))).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= k)
  }

  val NList = 16
  val NProbe = 4

  /** IVF (inverted-file) ANN top-k — the second scale path next to the
    * LSH one, mirroring the classic IVF-flat index as relational ops:
    *
    *  1. coarse centroids: the embeddings of vec_id < NList (a
    *     deterministic seed set; at production scale these come from a
    *     k-means pass, which changes the centroid VALUES but none of
    *     this pipeline's shape);
    *  2. assignment: every vector → argmax-cosine centroid via a
    *     broadcast of the NList centroids and a `max_by` hash
    *     aggregate — map-side combined, so the shuffle carries one
    *     (vec_id, best centroid) pair per vector, never the embedding;
    *  3. probe: each query ranks the centroids and searches only its
    *     top-NProbe inverted lists — an EQUI-join on list_id, so work
    *     is NProbe/NList of the corpus per query instead of all of it.
    *
    * At 100 TB the vectors would additionally be written bucketed by
    * list_id, turning the probe join into partition pruning at the
    * scan. Ties (same trunc4 cosine to two centroids) break to the
    * smaller centroid id in both engines, keeping assignment
    * deterministic and the oracle hash-stable. */
  def ivfTopK(emb: DataFrame, queryIds: Seq[Long], k: Int = 10): DataFrame = {
    val v = withEmbD(emb)
    val cents = v.filter(col("vec_id") < NList)
      .select(col("vec_id").cast("int").as("cid"), col("e").as("ce"))
    val assign = v.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        trunc4(NativeVector.cosine(col("e"), col("ce"))).as("ccos"))
      .groupBy(col("vec_id"))
      .agg(expr("max_by(cid, struct(ccos, -cid))").as("list_id"))
    val q = v.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("q_id"), col("qe"), col("cid"),
        trunc4(NativeVector.cosine(col("qe"), col("ce"))).as("qcos"))
      .withColumn("prnk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("qcos").desc, col("cid"))))
      .filter(col("prnk") <= NProbe)
      .select(col("q_id"), col("qe"), col("cid").as("list_id"))
    // a vector lives in exactly one list and (q, list) pairs are unique,
    // so (q_id, vec_id) candidates are already distinct — no dedup pass
    val scored = v.join(assign, "vec_id")
      .join(broadcast(probes), Seq("list_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        trunc4(NativeVector.cosine(col("qe"), col("e"))).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= k)
  }

  /** Embedding-cosine near-dup pairs: LSH band join (no cross join),
    * verified by cosine ≥ threshold. */
  def nearDupPairs(emb: DataFrame, threshold: Double = 0.4): DataFrame = {
    val v = withEmbD(emb)
    val bands = v.select(col("vec_id"), col("e"), explode(bandStructs(col("e"))).as("bb"))
      .select(col("vec_id"), col("e"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      .persist()
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"),
        col("x.e").as("ea"), col("y.e").as("eb"))
      .dropDuplicates("a_id", "b_id")
      .select(col("a_id"), col("b_id"), trunc4(NativeVector.cosine(col("ea"), col("eb"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  // ---- driver wiring ----

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_topk_exact" -> ((s, d) => bruteForceTopK(Tables.embeddings(s, d), Seq(0L, 1L, 2L, 3L, 4L))),
    "q_sim_topk_ann" -> ((s, d) => annTopK(Tables.embeddings(s, d), Seq(0L, 1L, 2L, 3L, 4L))),
    "q_sim_topk_ivf" -> ((s, d) => ivfTopK(Tables.embeddings(s, d), Seq(0L, 1L, 2L, 3L, 4L))),
    "q_sim_neardup" -> ((s, d) => nearDupPairs(Tables.embeddings(s, d))))

  private def planeSql(h: Int): String =
    hyperplanes(h).map(v => BigDecimal(v).underlying.toPlainString).mkString("[", ",", "]") + "::DOUBLE[]"

  /** CTE producing (vec_id, e DOUBLE[], band, bkey) — mirrors bandStructs. */
  private lazy val bandsCte: String = {
    val bitExprs = (0 until NumPlanes).map(h =>
      s"CASE WHEN list_dot_product(e, ${planeSql(h)}) >= 0 THEN 1 ELSE 0 END")
    val bandRows = (0 until Bands).map { b =>
      val key = (0 until RowsPerBand).map(i => s"(bit_${b * RowsPerBand + i} * ${1 << i})").mkString(" + ")
      s"SELECT vec_id, e, $b AS band, $key AS bkey FROM bits"
    }.mkString(" UNION ALL ")
    "WITH v AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings), " +
      "bits AS (SELECT vec_id, e, " +
      bitExprs.zipWithIndex.map { case (e, i) => s"$e AS bit_$i" }.mkString(", ") +
      " FROM v), bands AS (" + bandRows + ")"
  }

  val oracleSql: Map[String, String] = Map(
    "q_sim_topk_exact" ->
      ("WITH v AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings), " +
        "q AS (SELECT vec_id q_id, e qe FROM v WHERE vec_id IN (0,1,2,3,4)), " +
        "scored AS (SELECT q_id, vec_id, floor(list_cosine_similarity(qe, e) * 10000) / 10000 cos " +
        "FROM v CROSS JOIN q WHERE vec_id <> q_id), " +
        "ranked AS (SELECT q_id, vec_id, cos, row_number() OVER " +
        "(PARTITION BY q_id ORDER BY cos DESC, vec_id) rnk FROM scored) " +
        "SELECT q_id, vec_id, cos, rnk FROM ranked WHERE rnk <= 10"),
    "q_sim_topk_ann" ->
      (bandsCte + ", qb AS (SELECT vec_id q_id, e qe, band, bkey FROM bands WHERE vec_id IN (0,1,2,3,4)), " +
        "cand AS (SELECT DISTINCT q_id, vec_id FROM bands JOIN qb USING (band, bkey) WHERE vec_id <> q_id), " +
        "scored AS (SELECT q_id, vec_id, floor(list_cosine_similarity(" +
        "(SELECT qe FROM qb WHERE qb.q_id = cand.q_id LIMIT 1), " +
        "(SELECT e FROM v WHERE v.vec_id = cand.vec_id)) * 10000) / 10000 cos FROM cand), " +
        "ranked AS (SELECT q_id, vec_id, cos, row_number() OVER " +
        "(PARTITION BY q_id ORDER BY cos DESC, vec_id) rnk FROM scored) " +
        "SELECT q_id, vec_id, cos, rnk FROM ranked WHERE rnk <= 10"),
    "q_sim_topk_ivf" ->
      ("WITH v AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings), " +
        s"cents AS (SELECT vec_id::INT cid, e ce FROM v WHERE vec_id < $NList), " +
        "ac AS (SELECT v.vec_id, c.cid, floor(list_cosine_similarity(v.e, c.ce) * 10000) / 10000 ccos " +
        "FROM v CROSS JOIN cents c), " +
        "assign AS (SELECT vec_id, cid AS list_id FROM (SELECT vec_id, cid, " +
        "row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) rn FROM ac) WHERE rn = 1), " +
        "q AS (SELECT vec_id q_id, e qe FROM v WHERE vec_id IN (0,1,2,3,4)), " +
        "pc AS (SELECT q_id, qe, cid, floor(list_cosine_similarity(qe, ce) * 10000) / 10000 qcos " +
        "FROM q CROSS JOIN cents), " +
        "probes AS (SELECT q_id, qe, cid AS list_id FROM (SELECT q_id, qe, cid, " +
        s"row_number() OVER (PARTITION BY q_id ORDER BY qcos DESC, cid) prn FROM pc) WHERE prn <= $NProbe), " +
        "vl AS (SELECT v.vec_id, v.e, a.list_id FROM v JOIN assign a USING (vec_id)), " +
        "scored AS (SELECT p.q_id, vl.vec_id, " +
        "floor(list_cosine_similarity(p.qe, vl.e) * 10000) / 10000 cos " +
        "FROM vl JOIN probes p USING (list_id) WHERE vl.vec_id <> p.q_id), " +
        "ranked AS (SELECT q_id, vec_id, cos, row_number() OVER " +
        "(PARTITION BY q_id ORDER BY cos DESC, vec_id) rnk FROM scored) " +
        "SELECT q_id, vec_id, cos, rnk FROM ranked WHERE rnk <= 10"),
    "q_sim_neardup" ->
      (bandsCte + ", cand AS (SELECT DISTINCT x.vec_id a_id, y.vec_id b_id " +
        "FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id), " +
        "scored AS (SELECT a_id, b_id, floor(list_cosine_similarity(" +
        "(SELECT e FROM v WHERE v.vec_id = cand.a_id), " +
        "(SELECT e FROM v WHERE v.vec_id = cand.b_id)) * 10000) / 10000 cos FROM cand) " +
        "SELECT a_id, b_id, cos FROM scored WHERE cos >= 0.4"))
}
