package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (SURVEY §6): runs the full operator inventory against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query wall times.
  * Queries materialize through the noop sink so timing covers the whole
  * plan (count() alone lets Spark skip column decode on some plans).
  *
  * Besides Spark timings (`queries`), the line carries `duckdb_s` — the
  * same oracle query timed in DuckDB over the same parquet at the same
  * SF — and `ratio` (spark/duckdb) per oracled query, so the
  * engine-vs-baseline comparison is per-operator, not total-vs-total.
  * DuckDB runs via the host python3; if that's unavailable the bench
  * still emits Spark timings (fields are simply absent).
  */
object Bench {

  /** JSON string escape shared with Verify's oracle dump. */
  private[graft] def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private val duckScript =
    """import duckdb, json, sys, time
      |sf, oracle_path = sys.argv[1], sys.argv[2]
      |con = duckdb.connect()
      |for t in ["region","nation","customer","supplier","part","orders",
      |          "lineitem","events","documents","embeddings"]:
      |    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
      |out = {}
      |for name, sql in json.load(open(oracle_path)).items():
      |    best = -1.0
      |    try:
      |        for _ in range(2):  # min of two runs: stabler ratios
      |            t0 = time.time()
      |            con.execute(sql).fetchall()
      |            dt = round(time.time() - t0, 4)
      |            best = dt if best < 0 else min(best, dt)
      |    except Exception:
      |        best = -1.0
      |    out[name] = best
      |print(json.dumps(out))
      |""".stripMargin

  /** Time every oracle query in DuckDB; empty map when the host can't.
    * `only` mirrors the Spark-side SPARK_GRAFT_ONLY filter — a focused
    * run must not pay (or report) the other 180+ oracles' DuckDB time. */
  private def duckTimings(sfDir: String,
      only: Option[Set[String]]): Map[String, Double] =
    try {
      import scala.sys.process._
      val tmp = java.nio.file.Files.createTempDirectory("graft_bench")
      val oraclePath = tmp.resolve("oracle_sql.json")
      val scriptPath = tmp.resolve("duck_bench.py")
      java.nio.file.Files.writeString(oraclePath,
        SparkEntry.oracleSqlFor(sfDir)
          .filter { case (k, _) => only.forall(_.contains(k)) }
          .map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }
          .mkString("{", ",", "}"))
      java.nio.file.Files.writeString(scriptPath, duckScript)
      val jsonOut = Seq("python3", scriptPath.toString, sfDir,
        oraclePath.toString).!!(ProcessLogger(_ => ()))
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      JsonMethods.parse(jsonOut) match {
        case JObject(fields) => fields.collect {
          case (k, JDouble(v)) => k -> v
          case (k, JInt(v)) => k -> v.toDouble
        }.toMap
        case _ => Map.empty
      }
    } catch { case scala.util.control.NonFatal(_) => Map.empty }

  /** 1-minute load average, or -1 where /proc is unavailable. */
  private def loadavg(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.split(" ")(0).toDouble finally src.close()
    } catch { case scala.util.control.NonFatal(_) => -1.0 }

  /** duckdb_total plus the per-op spark seconds from the PRIOR round's
    * committed detail file for the same SF dir — the r8 lesson: a bench
    * that ran on a loaded machine (driver r8: unchanged ops inflated
    * 5-70×, DuckDB itself 13×) is not a regression artifact, and the
    * bench must say so ITSELF rather than leave the next judge to
    * cross-check by hand. The per-op map feeds the r9 lesson's finer
    * gate: median per-op inflation catches a load spike that hits only
    * the start of the sweep (driver r9: ~10 early ops 2-7× under a 5.2
    * loadavg while duckdb_total stayed under 2×). */
  private def priorDetail(detailPath: String, sfDir: String)
      : (Option[Double], Map[String, Double], Map[String, Double]) =
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val txt = java.nio.file.Files.readString(
        java.nio.file.Paths.get(detailPath))
      def num: PartialFunction[JValue, Double] = {
        case JDouble(v) => v
        case JInt(v) => v.toDouble
        case JDecimal(v) => v.toDouble }
      JsonMethods.parse(txt) match {
        case JObject(fs) =>
          val m = fs.toMap
          val sameSf = m.get("sf").collect {
            case JString(v) => v }.contains(sfDir)
          if (!sameSf) (None, Map.empty, Map.empty)
          else {
            val duck = m.get("duckdb_total").collect(num)
            def opField(field: String): Map[String, Double] =
              m.get("ops") match {
                case Some(JObject(opFs)) => opFs.collect {
                  case (name, JObject(kv)) =>
                    kv.toMap.get(field).collect(num).map(name -> _)
                }.flatten.toMap
                case _ => Map.empty[String, Double]
              }
            (duck, opField("spark_s"), opField("duckdb_s"))
          }
        case _ => (None, Map.empty, Map.empty)
      }
    } catch {
      case scala.util.control.NonFatal(_) => (None, Map.empty, Map.empty) }

  /** The prior committed round's canary timings for the same SF: the
    * per-op map (`canary_ops`, r14+) plus the legacy scalar sum
    * (`canary_duck_s`, r13) as a fallback. Absent → (empty, None),
    * gate disarmed for one round. */
  private def priorCanaryOf(detailPath: String, sfDir: String)
      : (Map[String, Double], Option[Double]) =
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      def num: PartialFunction[JValue, Double] = {
        case JDouble(v) => v
        case JInt(v) => v.toDouble
        case JDecimal(v) => v.toDouble }
      JsonMethods.parse(java.nio.file.Files.readString(
        java.nio.file.Paths.get(detailPath))) match {
        case JObject(fs) =>
          val m = fs.toMap
          if (!m.get("sf").collect { case JString(v) => v }.contains(sfDir))
            (Map.empty, None)
          else {
            val perOp = m.get("canary_ops") match {
              case Some(JObject(ops)) => ops.collect {
                case (k, v) if num.isDefinedAt(v) => k -> num(v) }.toMap
              case _ => Map.empty[String, Double]
            }
            (perOp, m.get("canary_duck_s").collect(num))
          }
        case _ => (Map.empty, None)
      }
    } catch { case scala.util.control.NonFatal(_) => (Map.empty, None) }

  /** Comparable (current, prior) canary sums, or None when the gate
    * must disarm (spec'd in BenchGateSpec). The r13 form compared raw
    * sums: if one canary op failed in either run (duckTimings swallows
    * failures into missing/negative entries), the gate compared sums
    * over DIFFERENT op sets — a one-op prior vs a healthy two-op
    * current read as ~2× drift. Now only ops present and positive in
    * BOTH runs enter the sums; an empty intersection falls back to the
    * legacy scalar prior (r13 detail files) ONLY when the current
    * probe is complete (both canary ops timed), else disarms. */
  private[graft] def canaryCompare(cur: Map[String, Double],
      priorOps: Map[String, Double], priorScalar: Option[Double],
      canarySet: Set[String]): Option[(Double, Double)] = {
    val shared = canarySet.filter(k =>
      cur.get(k).exists(_ > 0) && priorOps.get(k).exists(_ > 0))
    if (shared.nonEmpty)
      Some((shared.toSeq.map(cur).sum, shared.toSeq.map(priorOps).sum))
    else priorScalar match {
      case Some(p) if canarySet.forall(k => cur.get(k).exists(_ > 0)) =>
        Some((canarySet.toSeq.map(cur).sum, p))
      case _ => None
    }
  }

  /** A canary op timed in the prior committed run (with a stable
    * ≥0.25s denominator) but missing or non-positive in the CURRENT
    * probe is itself a distress signal — a failed fixed-workload probe
    * is a plausible symptom of exactly the host trouble the gate
    * exists to catch, so it must arm the retry/contamination path
    * rather than silently shrink the comparison to the surviving op
    * (the r14 advice). Spec'd in BenchGateSpec. */
  private[graft] def canaryProbeIncomplete(cur: Map[String, Double],
      priorOps: Map[String, Double], canarySet: Set[String]): Boolean =
    canarySet.exists(k => priorOps.get(k).exists(_ >= 0.25) &&
      !cur.get(k).exists(_ > 0))

  /** Canary gate predicate (spec'd in BenchGateSpec): prior must be a
    * stable ≥0.25s denominator — millisecond jitter at tiny SFs must
    * not arm the gate — and 1.5× covers run-to-run DuckDB noise. */
  private[graft] def canaryInflatedGate(
      cmp: Option[(Double, Double)]): Boolean =
    cmp.exists { case (cur, p) => p >= 0.25 && cur > 1.5 * p }

  /** Retry predicate for the pre-sweep canary (spec'd in
    * BenchGateSpec): tighter than the contamination gate (1.15× vs
    * 1.5×) because a retry is CHEAP next to shipping a whole sweep's
    * artifact off a drifting host — the r13 lesson, where all three
    * committed artifacts carried ~1.1-1.25× ambient inflation with
    * contaminated:false. The bench sleeps and re-probes while this
    * holds (bounded attempts), so a transient contender drains before
    * the timed sweep starts instead of inflating 190 ops. */
  private[graft] def canaryNeedsRetry(
      cmp: Option[(Double, Double)]): Boolean =
    cmp.exists { case (cur, p) => p >= 0.25 && cur > 1.15 * p }

  /** Per-op cross-check vs the prior committed detail (the r9 gap: a
    * start-of-run load spike inflated ~10 early ops 2-7× while
    * duckdb_total stayed under the 2× gate and the run still shipped
    * `contaminated:false`). Median over ops with a ≥0.2s prior —
    * sub-constant ops are noise, and the median is robust to the
    * handful of ops a round legitimately changes; requires ≥8
    * comparable ops so a narrow SPARK_GRAFT_ONLY run never triggers.
    * The caller flags the run contaminated above 1.5×. */
  private[graft] def medianOpInflation(current: Seq[(String, Double)],
      prior: Map[String, Double]): Option[Double] = {
    val inflations = current.collect {
      case (k, v) if v >= 0 && prior.get(k).exists(_ >= 0.2) =>
        v / prior(k) }.sorted
    if (inflations.size >= 8) Some(inflations(inflations.size / 2))
    else None
  }

  /** 95th-percentile per-op inflation over the same comparable set as
    * the median — the tail telemetry the median gate is structurally
    * blind to (the r10 gap: a 44.8s single-op IO stall under
    * median 1.05). Reported alongside, not itself a gate. */
  private[graft] def p95OpInflation(current: Seq[(String, Double)],
      prior: Map[String, Double]): Option[Double] = {
    val inflations = current.collect {
      case (k, v) if v >= 0 && prior.get(k).exists(_ >= 0.2) =>
        v / prior(k) }.sorted
    if (inflations.size >= 8)
      // nearest-rank p95: ceil(0.95·n) as a 1-based rank, −1 to index —
      // (n·95)/100 unadjusted over-shoots to the (p95+1)th value for
      // most n (n=100 → the 96th), skewing the telemetry to the worst
      // outlier rather than the percentile it names
      Some(inflations(math.max(0, (inflations.size * 95 + 99) / 100 - 1)))
    else None
  }

  /** Tail-outlier gate (the r10 gap closed): the r10 driver run shipped
    * `contaminated:false` around a 44.8s etl_compact IO stall because
    * the median gate cannot see a single extreme outlier. An op is an
    * offender when its prior committed time is a stable denominator
    * (≥ 0.5s), this run took > 4× that, and its OWN DuckDB time stayed
    * within ±30% of the prior round's — the machine was fine for that
    * op's data, so the Spark-side blowup is a stall (or a real
    * regression; either way the run must name it, not ship silently).
    * Ops with millisecond-scale DuckDB denominators get an ABSOLUTE
    * escape (|cd − pd| < 0.05s counts as stable): ordinary timing noise
    * on a 0.02s duck run exceeds 30%, and without the escape that noise
    * would silently disarm the gate for exactly the ops it was built
    * for (the r10 exhibit's duck time was 0.0164s). When either duck
    * number is missing the duck-stability condition is vacuously true:
    * better a named false positive than an invisible stall. Any
    * offender ⇒ contaminated, offenders listed. */
  private[graft] def tailOffenders(current: Seq[(String, Double)],
      priorSpark: Map[String, Double], curDuck: Map[String, Double],
      priorDuck: Map[String, Double]): Seq[String] =
    current.collect {
      case (k, v) if v >= 0 &&
          priorSpark.get(k).exists(p => p >= 0.5 && v > 4.0 * p) &&
          (for (pd <- priorDuck.get(k); cd <- curDuck.get(k))
            yield (cd >= 0.7 * pd && cd <= 1.3 * pd) ||
              math.abs(cd - pd) < 0.05).getOrElse(true) =>
        k
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
      "/root/repo/BENCH_DETAIL.json")
    // read the prior round's totals BEFORE this run overwrites the file
    val (priorDuck, priorOps, priorOpsDuck) = priorDetail(detailPath, sfDir)
    val loadBefore = loadavg()
    // CANARY PROBE (the r12 manual protocol, now recorded in the
    // artifact): time two fixed DuckDB oracles BEFORE the Spark sweep.
    // DuckDB is a fixed workload on fixed data, so canary inflation vs
    // the prior committed run measures HOST drift at sweep start —
    // loadavg can miss an IO-bound or short-burst contender, and the
    // end-of-run duckdb_total check cannot see drift that cleared
    // mid-sweep. Ops chosen for ≥0.3s denominators that stay CHEAP at
    // every bundled SF (≤ ~3s at 30×) — a canary must cost seconds,
    // not ride a superlinear oracle.
    val canaryOps = Set("txt_boilerplate_scrub", "mm_binary_pipeline")
    val (priorCanaryOps, priorCanaryScalar) = priorCanaryOf(detailPath, sfDir)
    def probeCanary(): Map[String, Double] =
      duckTimings(sfDir, Some(canaryOps)).filter(_._2 > 0)
    // ACT on a hot probe, don't just record it (the r13 lesson: three
    // artifacts shipped ambient-hot with contaminated:false): while the
    // probe reads >1.15x its prior committed time, sleep and re-probe —
    // a transient contender drains in minutes, and a minute of waiting
    // is free next to re-running a 190-op sweep. Bounded attempts; a
    // persistently hot host still ships, flagged, after the last probe.
    var canaryMap = probeCanary()
    var canaryRetries = 0
    while (canaryRetries < 4 && (canaryNeedsRetry(canaryCompare(
        canaryMap, priorCanaryOps, priorCanaryScalar, canaryOps)) ||
        canaryProbeIncomplete(canaryMap, priorCanaryOps, canaryOps))) {
      canaryRetries += 1
      Thread.sleep(60000L)
      canaryMap = probeCanary()
    }
    val canaryIncomplete =
      canaryProbeIncomplete(canaryMap, priorCanaryOps, canaryOps)
    val canaryCmp = canaryCompare(canaryMap, priorCanaryOps,
      priorCanaryScalar, canaryOps)
    val canaryDuck = canaryMap.values.sum
    val spark = GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warm-up against the benched SF dir itself (an absent
    // hardcoded path must never abort the bench before the timed runs)
    try SparkEntry.queries.get("q1_pricing_summary")
      .foreach(fn => fn(spark, sfDir).count())
    catch { case scala.util.control.NonFatal(_) => () }

    // Shared derived-artifact landings, timed INDIVIDUALLY up front:
    // each is memoized per (session, dir, fingerprint), so without this
    // the whole landing bills to whichever consumer runs first
    // alphabetically (r9: ann_ivf_kmeans_topk absorbed the Lloyd
    // training sweeps) and per-op regressions hide behind first-touch
    // ordering. The landing seconds are real work and stay in the
    // total, under their own `landing` entries/group.
    val landings: Seq[(String, () => Unit)] = Seq(
      "landing_doc_artifacts" ->
        (() => operators.DocArtifacts.ensureLanded(spark, sfDir)),
      "landing_dedup_tuning" ->
        (() => operators.Dedup.ensureTuningLanded(spark, sfDir)),
      "landing_kmeans" ->
        (() => operators.Similarity.ensureKmeansLanded(spark, sfDir)),
      "landing_lsh_buckets" ->
        (() => operators.Similarity.ensureLshLanded(spark, sfDir)),
      "landing_ivf_cent" ->
        (() => operators.Similarity.ensureIvfCentLanded(spark, sfDir, 16)),
      "landing_ann_topk" ->
        (() => operators.Similarity.ensureAnnTopkLanded(spark, sfDir)),
      "landing_moments" ->
        (() => operators.Similarity.ensureMomentsLanded(spark, sfDir)),
      "landing_clean_manifest" ->
        (() => operators.Corpus.ensureCleanLanded(spark, sfDir)),
      "landing_buckets" ->
        (() => operators.Scale.ensureBucketsLanded(spark, sfDir)),
      "landing_mhlsh" ->
        (() => operators.Dedup.ensureMhLshLanded(spark, sfDir)),
      // r18: full-graph CC labels land once for cluster/cluster_stats
      // (previously each re-ran the hash-min fixpoint per query)
      "landing_cc_full" ->
        (() => operators.Dedup.ensureCcFullLanded(spark, sfDir)))
    // (skippable for single-op local iteration loops)
    val landingTimes =
      if (sys.env.contains("SPARK_GRAFT_NO_PRELAND")) Nil
      else landings.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(); true }
          catch { case scala.util.control.NonFatal(_) => false }
        Caches.release(spark)
        name -> (if (ok)
          math.round((System.nanoTime() - t0) / 1e9 * 1000.0) / 1000.0
        else -1.0)
      }

    // optional comma-list filter for local iteration (driver sets none)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Min-of-two, SYMMETRIC with the DuckDB side (duckScript has taken
    // min-of-two since r13 — "stabler ratios"). A single cold run times
    // janino codegen compilation + C2 JIT of that op's generated classes
    // on top of the query: measured at sf3, q20's first run is 3.4s
    // against an 0.9s steady state, and the r16 "regression" flags
    // (q21 0.71→1.61, txt_entropy 1.33→2.07, neither touched by any
    // commit) were exactly this noise moving between rounds. On a real
    // cluster the JVM is long-lived and JIT amortizes to zero; the warm
    // number is the scale signal. Both runs are recorded: spark_s = min
    // (the comparison number), cold_s = first run (so the one-shot cost
    // stays visible in the artifact, not hidden).
    val resultsBoth = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        val ok =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch { case _: Throwable => false }
        Caches.release(spark) // ops persist/checkpoint derived tables
        if (ok) math.round((System.nanoTime() - t0) / 1e9 * 1000.0) / 1000.0
        else -1.0
      }
      val first = once()
      val second = if (first < 0) -1.0 else once()
      name -> (if (first < 0 || second < 0) (-1.0, first)
        else (math.min(first, second), first))
    }
    val results = resultsBoth.map { case (k, (best, _)) => k -> best }
    val coldRuns = resultsBoth.map { case (k, (_, cold)) => k -> cold }.toMap
    val duck = duckTimings(sfDir, only)
    def obj(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = obj(results)
    // landings are real work: they ride the total (and their own group)
    val total = math.round((results ++ landingTimes).map(_._2)
      .filter(_ >= 0).sum * 1000.0) / 1000.0
    // honest decomposition: streaming ops pay memory-sink/state-store
    // scaffolding and landing ops pay real file writes each run — label
    // them so the batch-compute number is visible on its own
    val ioOps = Set("etl_partitioned_write", "etl_json_landing",
      "etl_csv_landing", "etl_manifest", "mm_shard_write")
    def bucketOf(name: String): String =
      if (name.startsWith("stream_")) "streaming"
      else if (ioOps.contains(name)) "io_landing" else "batch"
    val groups = (results.filter(_._2 >= 0).groupBy(r => bucketOf(r._1))
      .toSeq.sortBy(_._1).map { case (g, rs) =>
        g -> (math.round(rs.map(_._2).sum * 1000.0) / 1000.0) }) ++
      (if (landingTimes.isEmpty) Nil else Seq("landing" ->
        (math.round(landingTimes.map(_._2).filter(_ >= 0).sum * 1000.0)
          / 1000.0)))
    val ratios = results.collect {
      case (k, sparkS) if sparkS >= 0 && duck.get(k).exists(_ > 0) =>
        k -> (math.round(sparkS / duck(k) * 100.0) / 100.0) }
    val duckTotal = math.round(duck.values.filter(_ > 0).sum * 1000.0) / 1000.0
    val (headRatio, tailMaps) = if (duck.isEmpty) ("", "") else {
      val ds = obj(results.collect {
        case (k, _) if duck.get(k).exists(_ > 0) => k -> duck(k) })
      (s""","duckdb_total":$duckTotal""" +
        s""","ratio_total":${math.round(total / duckTotal * 100.0) / 100.0}""",
        s""","duckdb_s":$ds,"ratio":${obj(ratios)}""")
    }
    // contamination telemetry (the r8 lesson): flag the run as suspect
    // when the machine was already loaded, or when DuckDB itself — a
    // fixed workload — ran >2× slower than the prior committed round.
    // A flagged run's absolute times and ratios are ambient noise, not
    // regressions; the flag rides every artifact so no cross-check
    // against PROGRESS history is needed to know that.
    val loadAfter = loadavg()
    val duckInflated = priorDuck.exists(p => p > 0 && duckTotal > 2.0 * p)
    // loadBefore ONLY: loadAfter is sampled right after the bench's own
    // CPU burst, so a run that merely saturated its own session would
    // self-flag (loadAfter stays as raw telemetry below)
    val highLoad = loadBefore > cpus.toInt / 4.0
    val medianInflation = medianOpInflation(results, priorOps)
    val perOpInflated = medianInflation.exists(_ > 1.5)
    val p95Inflation = p95OpInflation(results, priorOps)
    val offenders = tailOffenders(results, priorOps, duck, priorOpsDuck)
    // canary gate: the pre-sweep fixed-workload probe ran >1.5× its
    // prior committed time → the host was already drifting when the
    // sweep STARTED (0.25s floor keeps millisecond jitter from arming
    // the gate at tiny SFs)
    val canaryInflated = canaryInflatedGate(canaryCmp)
    val contaminated = duckInflated || highLoad || perOpInflated ||
      offenders.nonEmpty || canaryInflated || canaryIncomplete
    // automated round-over-round per-op regression list (the r15 gap:
    // dedup_source_overlap doubled and only an eyeballed diff caught
    // it): ops whose spark_s grew >1.4x vs the prior committed detail
    // on a stable >=0.3s prior while the op's OWN DuckDB time stayed
    // within +-30% (the machine was fine for that op's data — the
    // growth is Spark-side). Telemetry, not a gate: a legitimately
    // rewritten op lands here once and the next round clears it.
    val regressions = results.collect {
      case (k, v) if v >= 0 &&
          priorOps.get(k).exists(p => p >= 0.3 && v > 1.4 * p) &&
          (for (pd <- priorOpsDuck.get(k); cd <- duck.get(k))
            yield (cd >= 0.7 * pd && cd <= 1.3 * pd) ||
              math.abs(cd - pd) < 0.05).getOrElse(true) =>
        k -> (math.round(v / priorOps(k) * 100.0) / 100.0)
    }.sortBy(-_._2).take(16)
    // the artifact records the commit it was generated at, so a stamp
    // checker (tools/stamp_check.py) can refuse a round whose bench
    // artifacts predate the shipping HEAD
    // `git rev-parse HEAD` handles packed refs / worktrees / any layout
    // the raw .git-file read cannot; warn loudly when no stamp can be
    // produced so a stamp-less artifact is never a silent state.
    val gitHead = try {
      val p = new ProcessBuilder("git", "rev-parse", "HEAD")
        .directory(new java.io.File("/root/repo")).start()
      val out = new String(p.getInputStream.readAllBytes,
        java.nio.charset.StandardCharsets.UTF_8).trim
      if (p.waitFor() == 0 && out.matches("[0-9a-f]{40}")) out else ""
    } catch { case scala.util.control.NonFatal(_) => "" }
    if (gitHead.isEmpty)
      System.err.println(
        "WARN: git rev-parse HEAD failed; bench artifact ships UNSTAMPED")
    val canaryField =
      s""","canary_duck_s":${math.round(canaryDuck * 10000.0) / 10000.0}""" +
        s""","canary_ops":${obj(canaryMap.toSeq.sortBy(_._1))}""" +
        (if (canaryRetries > 0) s""","canary_retries":$canaryRetries"""
         else "") +
        (if (canaryIncomplete) s""","canary_incomplete":true""" else "") +
        canaryCmp.map { case (_, p) =>
          s""","canary_duck_prior":$p""" }.getOrElse("")
    val loadField =
      s""","load_before":$loadBefore,"load_after":$loadAfter""" + canaryField +
        priorDuck.map(p => s""","duckdb_total_prior":$p""").getOrElse("") +
        medianInflation.map(m => s""","median_op_inflation":${
          math.round(m * 100.0) / 100.0}""").getOrElse("") +
        p95Inflation.map(m => s""","p95_op_inflation":${
          math.round(m * 100.0) / 100.0}""").getOrElse("") +
        (if (offenders.isEmpty) "" else s""","tail_offenders":${
          offenders.take(8).map(jstr).mkString("[", ",", "]")}""") +
        (if (regressions.isEmpty) ""
         else s""","regressions":${obj(regressions)}""") +
        (if (gitHead.isEmpty) "" else s""","git_head":${jstr(gitHead)}""") +
        s""","contaminated":$contaminated"""
    val landingsField =
      if (landingTimes.isEmpty) ""
      else s""","landings":${obj(landingTimes)}"""
    // full per-query archive line first...
    println(s"""{"metric":"total_detail","value":$total,"unit":"sec","sf":"$sfDir","groups":${obj(groups)}$headRatio$loadField$landingsField,"queries":$qs$tailMaps}""")
    // ...and the same map as a FILE: the driver keeps only the last
    // ~2000 chars of stdout, so round-over-round regression detection
    // (absolute per-op seconds, not just ratios) needs a durable home —
    // committed per round as BENCH_DETAIL.json
    try {
      val ratioMap = ratios.toMap
      val perOp = results.map { case (k, sparkS) =>
        val d = duck.get(k).filter(_ > 0)
        jstr(k) + ":{\"spark_s\":" + sparkS +
          coldRuns.get(k).filter(c => c >= 0 && c != sparkS)
            .map(c => ",\"cold_s\":" + c).getOrElse("") +
          d.map(v => ",\"duckdb_s\":" + v).getOrElse("") +
          ratioMap.get(k).map(v => ",\"ratio\":" + v).getOrElse("") + "}"
      }.mkString(",")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(detailPath),
        s"""{"sf":${jstr(sfDir)},"total_s":$total$headRatio$loadField""" +
          s"""$landingsField,"groups":${obj(groups)},"ops":{$perOp}}""" +
          "\n")
    } catch { case scala.util.control.NonFatal(_) => () }
    // ...then the contract's ONE JSON line LAST and COMPACT: the driver
    // keeps only the final ~2000 chars of output, so the self-contained
    // headline (totals, groups, baseline ratio, worst offenders) must fit
    // inside that tail whole — the 90-entry maps above cannot.
    val failed = results.filter(_._2 < 0).map(_._1)
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(8)
    // ratios only meaningful where DuckDB itself spends >=100ms; below
    // that the Spark per-job constant dominates and the ratio is noise
    val worst = ratios
      .filter { case (k, _) => duck.get(k).exists(_ >= 0.1) }
      .sortBy(-_._2).take(8)
    // failed names ride the compact line (first 5): the detail line's
    // full map gets tail-truncated, so a failure must name itself here
    val failedField = if (failed.isEmpty) ""
      else s""","failed":${failed.take(5).map(jstr).mkString("[", ",", "]")}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","n_ops":${results.size},"n_failed":${failed.size}$failedField$headRatio$loadField$landingsField,"groups":${obj(groups)},"slowest_s":${obj(slowest)},"slowest_note":"slowest 8 of ${results.size}; full per-op {spark_s,duckdb_s,ratio} map in $detailPath and the total_detail line above","worst_ratio_duck100ms":${obj(worst)}}""")
    spark.stop()
  }
}
