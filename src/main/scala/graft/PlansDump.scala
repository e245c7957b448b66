package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md: executed physical plans of representative
  * operators, committed as reviewable evidence for the §6 performance
  * protocol. Run: sbt "runMain graft.PlansDump". */
object PlansDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val picks = Seq(
      "q1_pricing_summary" ->
        "full-scan grouped aggregate: pushdown + pruning + partial agg",
      "q5_local_supplier" ->
        "6-way star join: every dimension broadcast, one fact shuffle",
      "ev_sessionize" ->
        "sessionization: lag + running sum + agg on ONE user_id exchange",
      "ev_funnel" ->
        "funnel: three chained windows sharing a single partitioning",
      "dedup_minhash_lsh" ->
        "MinHash+LSH: native sketch expressions, id-only pair join",
      "q17_bucketed_join" ->
        "bucketed fact-fact join: no exchange feeds the join",
      "ann_bruteforce_topk" ->
        "brute-force cosine: broadcast query side, native dot product",
      "ev_dau_wau" ->
        "rolling actives: explode-7 equi-join — no BNLJ, no cartesian",
      "etl_json_envelope" ->
        "envelope unwrap: ONE schema'd from_json parse per row",
      "q23_revenue_deciles" ->
        ("two-pass bucket ntile: ReusedExchange feeds rank/total branches, " +
          "no single-task window"),
      "smp_shuffle" ->
        ("global epoch order via hash-prefix buckets: count pass + " +
          "bucket-partitioned row_number, no single-task window"),
      "txt_pack" ->
        ("sequence packing: bucketed prefix sum (count pass + broadcast " +
          "offsets + bucket-partitioned window), no single-task cumsum"),
      "dedup_incremental" ->
        "batch-vs-corpus dedup: two linear hash equi-joins on min() indexes",
      "smp_interleave" ->
        ("stride-scheduled mixture interleave: two chained two-pass " +
          "rankings (hash-prefix, then percentile value buckets)"),
      "emb_kmeans" ->
        ("Lloyd's k-means final assignment: broadcast landed centroids, " +
          "O(n·k) scan + map-side-partial min_by — no pair explosion"),
      "corpus_temperature" ->
        ("temperature mixture: one-row scalar broadcasts onto the " +
          "language count table, ONE corpus scan + broadcast join"),
      "txt_ccnet_bucket" ->
        ("CCNet terciles: percentile value buckets + per-(lang,bucket) " +
          "row_number — no single-task window"),
      "ev_asof_nearest" ->
        ("nearest as-of: both directional frames on ONE union + sort " +
          "(single user_id exchange)"),
      "dedup_ngram_jaccard" ->
        ("near-dup pairs read off the LANDED tuning candidates " +
          "(integer-exact 2·inter ≥ uni keep test, no re-shingling)"),
      "dedup_minhash_incremental" ->
        ("batch probes the landed band index: two-sided salted linear " +
          "equi-join, never corpus×corpus"),
      "etl_scd2" ->
        "SCD2 intervals: both window passes on ONE user_id exchange",
      "etl_cdc_merge" ->
        "CDC latest-wins: single map-side-combinable max(struct) argmax",
      "emb_covariance" ->
        ("covariance read off the LANDED moment tables (the partial-" +
          "outer-product fold runs ONCE in the shared landing); only " +
          "d-row broadcast joins remain in the query plan"),
      "q13_percentiles" ->
        ("exact grouped percentiles: driver-pinned literal boundaries " +
          "(no cross-pass sample re-evaluation), bounded histogram, " +
          "target-buckets-only refinement shuffle"),
      "ev_attribution_multi" ->
        ("U-shaped credit split: position window satisfied by the " +
          "join's user_id clustering — no second shuffle"),
      "q24_nested_agg" ->
        ("nested-agg argmax: per-part re-aggregates reuse the " +
          "per-supplier exchange; max(struct) instead of a window"),
      "q25_interval_window" ->
        ("calendar RANGE frame over a day index, partitioned by " +
          "customer — window state never exceeds one customer's orders"),
      "txt_novelty" ->
        ("corpus-order novelty: first-seen min + join-back share ONE " +
          "shingle-keyed exchange; linear in corpus tokens"),
      "dedup_containment" ->
        ("asymmetric containment read straight off the LANDED tuning " +
          "candidates (sz/inter columns) — no shingle pipeline re-run"),
      "txt_bigram_logprob" ->
        ("bigram LM score: corpus-sized count table joins back via a " +
          "SHUFFLE equi-join (only vocab-sized prefix totals broadcast)"),
      "mm_shard_pack" ->
        ("shard layout from lengths only: bucketed prefix sum, shard " +
          "ids by bit shift — no global cumsum, no payload movement"),
      "dedup_source_overlap" ->
        ("exact source-pair overlap: bounded in-row pair explode per " +
          "shingle — never a shingle-table self-join"),
      "etl_fk_audit" ->
        ("FK audit, size-adaptive: dim edges broadcast-join in one " +
          "scan per child, the orderkey edge rides the bucketed " +
          "landing exchange-free, big parents take one combining " +
          "groupBy over tagged (edge, key) pairs"),
      "web_url_dedup" ->
        ("URL dedup: canonicalization is per-row string work; one " +
          "groupBy on the canonical key (dedup_exact's shuffle shape)"),
      "web_license_mix" ->
        ("license mix: bounded rule-table BNLJ (4 literal rows) + " +
          "one groupBy on the license key"),
      "emb_kmeans_incremental" ->
        ("incremental quantizer: batch through the broadcast argmin " +
          "kernel, k-row read of the landed assignment, one k-row join"),
      "emb_pq" ->
        ("PQ coding: subvector table joins the BROADCAST landed " +
          "codebook on the subspace key — O(n·M·k), no pair explosion"),
      "dedup_band_tuning" ->
        ("S-curve tuning: candidate pass + ×4 config explode; IEEE " +
          "multiply chains, micro-unit quantize before the sum"),
      "q26_cust_distribution" ->
        ("Q13 shape: LEFT join keeps zero-order customers, both " +
          "aggregates partial/map-side, bounded histogram keys"),
      "smp_class_balance" ->
        ("balanced downsample: per-label two-pass bucket ranking — a " +
          "dominant class spreads over 256 tasks, never one"),
      "corpus_token_budget_trim" ->
        ("budget trim: GROUPED bucketed prefix sum over 256 value " +
          "buckets of the (−quality, md5-prefix) sort integer — a " +
          "dominant source spreads over 256 tasks"),
      "emb_knn_graph" ->
        ("k-NN graph: broadcast landed centroids → cluster-local pair " +
          "join → per-vector rank window (partitioned on vec_id)"),
      "ev_cusum_drift" ->
        ("CUSUM: one combinable daily aggregate; every window below " +
          "it campaign-partitioned over the bounded day table"),
      "q27_running_share" ->
        ("running share: cumulative windows ride the bounded " +
          "month×segment grid, never the fact table"),
      "ev_cooccurrence_lift" ->
        ("lift matrix: per-user indicator aggregate → one-row " +
          "16-scalar pass → 10-row explode — never a pairwise join"),
      "emb_pca_project" ->
        ("PCA projection: driver eigensolve on the d×d collect " +
          "(schema-bounded), corpus projection against BROADCAST " +
          "landed components — the scan side never shuffles"),
      "ann_ivf_kmeans_topk" ->
        ("trained IVF probe: broadcast landed Lloyd centroids, " +
          "nprobe-bucket equi-join, bucket-local top-k — no all-pairs"),
      "ann_recall_eval" ->
        ("recall eval: three top-k legs joined on (query, neighbor) " +
          "id pairs only — payload vectors never re-join"),
      "etl_compact" ->
        ("small-file compaction: date-keyed repartition write; audit " +
          "counts from footer-level input_file_name groupBy"),
      "stream_join_attribution" ->
        ("stream-stream interval join converged snapshot (the plan " +
          "below is the memory-sink read; the streaming plan carries " +
          "the watermark-bounded join state)"))
    val sb = new StringBuilder
    sb.append("# PLANS — executed physical plans (sf0.001, regenerate " +
      "via `sbt \"runMain graft.PlansDump\"`)\n")
    sb.append("""
## The constant-band floor (why sub-0.3s-DuckDB ratios stop at ~5-14x)

Measured with a job/stage listener (ProfileComposites, sf0.1, idle,
3 rounds): every multi-stage composite in the constant band spends its
wall time on FIXED per-job local-mode constants — scheduler round trips,
AQE stage materialization, codegen compile — not on data:

| op | s (median) | jobs | stages | tasks |
|---|---|---|---|---|
| stream_sessionize | 1.90 | 6 | 7 | 85 |
| q24_nested_agg | 1.69 | 6 | 6 | 21 |
| q2_min_cost_supplier | 1.22 | 5 | 6 | 16 |
| txt_tfidf_topk | 1.25 | 7 | 7 | 69 |
| txt_ccnet_bucket | 1.68 | 14 | 14 | 14 |
| txt_unigram_logprob | 0.88 | 6 | 6 | 6 |
| dedup_source_overlap | 1.32 | 9 | 9 | 80 |
| emb_knn_graph | 1.28 | 8 | 8 | 142 |

txt_ccnet_bucket is the cleanest exhibit: 14 jobs, 14 stages, 14 TASKS
— every stage runs exactly one task on a dataset this small, so the op
is 14 sequential ~110ms job constants and nothing else. Across the
band, wall time tracks the JOB count (~110-150ms/job with AQE's
per-exchange jobs and broadcast builds), not the row count; DuckDB
executes the same logical work in-process with none of those
boundaries, which is the whole ratio. The plans themselves are the
ones a cluster wants (pre-agg + struct argmax, reused exchanges,
broadcast dims, two-pass buckets); on real data each of those
constants amortizes over seconds-to-minutes of stage runtime — the
sf1 artifact (BENCH_sf1.json) shows exactly that: 10x the data moves
these ops well under 2x the wall time. Shaving MORE local jobs would
mean trading away the scale posture (fusing stages AQE wants separate,
dropping the bucketed two-pass shapes), so this is the documented
floor, not a TODO.
""")
    picks.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      sb.append(s"\n## $name\n\n$why\n\n```\n")
      sb.append(df.queryExecution.executedPlan.toString.take(4000))
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
    println("PLANS.md written")
    spark.stop()
  }
}
