package graft

/** Bulk plan-quality gate: executes every operator at sf0.001 and scans
  * the physical plan for scale smells. Prints the full table for human
  * review AND asserts the three hard rules:
  *
  *  - no CartesianProduct anywhere;
  *  - no BroadcastNestedLoopJoin outside the whitelist below, where a
  *    BNLJ is the intended physical form;
  *  - no Window without partitionBy over an unbounded-cardinality input
  *    (Spark runs such a window in ONE task): only ops in
  *    `globalWindowBounded` may carry one, and there the window's child
  *    must be a pre-aggregate whose cardinality is bounded by
  *    construction (hours/days of a calendar, not rows of a corpus).
  *    Everything data-scale uses Ranking's two-pass bucket ranking.
  *
  * Whitelist rationale: ann_bruteforce_topk probes every (query, corpus)
  * pair by design (the exact baseline); ann_ivf_topk assigns the corpus
  * against the fixed-k broadcast centroid table (O(n·k));
  * txt_tfidf_topk / txt_unigram_logprob crossJoin a ONE-ROW corpus-total
  * aggregate — the standard physical form of a scalar subquery;
  * dedup_source_similarity pairs the per-SOURCE sketch table with
  * itself (< on the bounded source registry, not data-scale rows).
  */
class PlanAudit extends SparkSpec {

  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}

  test("audit: no cartesian anywhere; BNLJ only where intended") {
    val skip = Set("stream_windowed_counts", "stream_sessionize",
      "stream_dedup", "stream_campaign_stats", "stream_static_enrich",
      "stream_topk_heavy_hitters",
      "etl_partitioned_write", "etl_json_landing", "etl_csv_landing",
      "etl_manifest", "etl_compact", "etl_landing_metadata",
      "etl_schema_drift", "q17_bucketed_join", "mm_binary_pipeline")
    // ev_ab_significance / q23_revenue_deciles join the same one-row
    // totals pattern as tfidf/logprob
    // smp_interleave / txt_ccnet_bucket broadcast the same one-row
    // approx-percentile bounds table as q23/RFM's value bucketing
    // corpus_temperature's mixture math is one-row scalar broadcasts
    // onto the ≤#languages count table
    // emb_kmeans assigns the corpus against the fixed-k broadcast
    // centroid table (O(n·k)), the ivf pattern
    val bnljAllowed = Set("ann_bruteforce_topk", "ann_ivf_topk",
      "ann_ivf_kmeans_topk", "txt_tfidf_topk", "txt_unigram_logprob",
      "dedup_source_similarity", "ev_ab_significance",
      "q23_revenue_deciles", "ev_rfm_segments", "smp_interleave",
      "txt_ccnet_bucket", "corpus_temperature", "emb_kmeans",
      // corpus_dsir_weights / corpus_filter_sweep broadcast the same
      // one-row corpus-totals table (scalar-subquery physical form)
      "corpus_dsir_weights", "corpus_filter_sweep",
      // etl_partition_audit broadcasts a one-row mean-cell aggregate
      "etl_partition_audit",
      // txt_vocab_coverage: ccnet's percentile-bounds broadcast + the
      // one-row corpus-total broadcast
      "txt_vocab_coverage",
      // corpus_epoch_plan: temperature's pattern — one-row total and
      // normalizer broadcasts onto the ≤#sources count table
      "corpus_epoch_plan",
      // ann_recall_eval composes ann_bruteforce_topk + ann_ivf_topk, so
      // it inherits their by-design BNLJ baselines
      "ann_recall_eval",
      // etl_fk_audit / etl_freshness cross-join one-row aggregates
      // (orphan counts, the high-water mark) — the partition_audit shape
      "etl_fk_audit", "etl_freshness",
      // web robots/license rules are bounded LITERAL tables joined on
      // prefix/suffix match (non-equi by nature) — the intended BNLJ:
      // broadcast side is 2-4 rows, probe side linear
      "web_robots_filter", "web_license_mix",
      // emb_pca_project cross-joins the broadcast 4-row component table
      "emb_pca_project",
      // ev_markov_stationary cross-joins the one-row total (the
      // partition_audit shape) next to the broadcast 5-row vector
      "ev_markov_stationary",
      // corpus_batch_drift cross-joins its one-row share totals
      "corpus_batch_drift",
      // q19/q20 theta sketches cross-join the one-row table count that
      // pins the θ exponent (the partition_audit shape)
      "q19_approx_distinct", "q20_approx_percentiles",
      // smp_class_balance cross-joins the one-row min-label-count
      "smp_class_balance",
      // dedup_semantic runs emb_kmeans then assigns the corpus against
      // the broadcast centroid table — the same O(n·k) ivf shape
      "dedup_semantic",
      // smp_temporal_split cross-joins the one-row bounds and leak
      // aggregates (the partition_audit shape)
      "smp_temporal_split",
      // corpus_token_budget_trim rides withValueBucket's one-row
      // percentile-bounds broadcast (the ccnet/vocab_coverage shape)
      "corpus_token_budget_trim",
      // emb_knn_graph assigns the corpus against the broadcast fixed-k
      // centroid table — dedup_semantic's O(n·k) ivf shape
      "emb_knn_graph",
      // ev_anomaly_mad cross-joins its one-row median and MAD
      // aggregates (the partition_audit shape)
      "ev_anomaly_mad",
      // ev_conversion_windows cross-joins the one-row purchase total
      "ev_conversion_windows",
      // emb_index_shards: kmeans-centroid broadcast assignment + the
      // one-row vector total
      "emb_index_shards",
      // ev_churn_labels cross-joins the one-row max-week censor bound
      "ev_churn_labels")
    // the only inputs a partition-less window may sort in one task:
    // calendar-bounded pre-aggregates (≤ hours/days rows at ANY corpus
    // size), verified below to actually sit on an Aggregate
    // txt_zipf_fit's rank window sits on a LIMIT 100 over the type-count
    // aggregate — bounded by construction at any corpus size
    // etl_late_arrivals' later-day running min rides the per-day
    // aggregate — calendar-bounded at any feed size
    val globalWindowBounded =
      Set("ev_hourly_anomaly", "ev_rolling_revenue", "txt_zipf_fit",
        "etl_late_arrivals",
        // q27's cumulative-total window rides the month×segment grid
        "q27_running_share",
        // emb_index_shards' size rank rides the fixed-k cluster table
        "emb_index_shards",
        // r10 Ranking offset pass: ungrouped bucketedRowNumber/PrefixSum
        // callers carry ONE global window — the down-range offset
        // running sum over the per-bucket COUNT/SUM aggregate, ≤
        // nBuckets (256) rows by construction at any corpus size
        // (bucket ∈ [0, nBuckets)). The data-sized ranking window stays
        // partitioned by bucket; the Aggregate-child check below holds
        // the bounded claim to the plan shape.
        "mm_shard_pack", "q23_revenue_deciles", "smp_interleave",
        "smp_shuffle", "txt_pack", "txt_vocab_coverage",
        // mm_shard_write inherits mm_shard_pack's offset window (same
        // bucketedPrefixSum, ≤ nBuckets rows by construction)
        "mm_shard_write")
    val violations = scala.collection.mutable.ListBuffer.empty[String]
    println("=====AUDIT START=====")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!skip.contains(name)) {
        try {
          val df = fn(spark, sfTiny)
          val gw = df.queryExecution.optimizedPlan.collect {
            case w: LWindow if w.partitionSpec.isEmpty => w
          }
          if (gw.nonEmpty && !globalWindowBounded.contains(name))
            violations += s"$name: unpartitioned Window (single-task sort)"
          if (gw.nonEmpty && globalWindowBounded.contains(name) &&
              !gw.forall(_.child.collectFirst { case a: Aggregate => a }.nonEmpty))
            violations += s"$name: global window not over a bounded pre-aggregate"
          df.collect()
          val p = df.queryExecution.executedPlan.toString
          val exch = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
          val bcast = p.linesIterator.count(_.contains("BroadcastHashJoin"))
          val smj = p.linesIterator.count(_.contains("SortMergeJoin"))
          val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
          val cart = p.linesIterator.count(_.contains("CartesianProduct"))
          println(f"AUDIT| $name%-24s exch=$exch bhj=$bcast smj=$smj bnlj=$bnlj cart=$cart")
          if (cart > 0) violations += s"$name: CartesianProduct"
          if (bnlj > 0 && !bnljAllowed.contains(name))
            violations += s"$name: unexpected BroadcastNestedLoopJoin"
        } catch { case e: Throwable =>
          violations += s"$name: ERR ${e.getMessage.take(120)}"
        } finally spark.catalog.clearCache()
      }
    }
    println("=====AUDIT END=====")
    assert(violations.isEmpty, s"plan smells: ${violations.mkString("; ")}")
  }
}
