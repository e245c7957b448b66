package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.VectorFns._

/** Similarity-search block (SURVEY §2E) over the `embeddings` table.
  * Brute force is the correctness baseline (and the oracle); LSH and IVF
  * are the 100 TB paths — each vector lands in O(1) buckets, per-bucket
  * local top-k, global merge (SURVEY §4).
  *
  * Every vector is widened to double and its norm precomputed ONCE per
  * row (materialized columns), so scoring a pair costs a single fold.
  * The arithmetic (dot/(na·nb)) is unchanged, keeping oracle parity.
  */
object Similarity {

  private val K = 10

  /** (id, vd, nrm): double-widened vector + precomputed norm. */
  private def prepared(s: SparkSession, dir: String, idAs: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id").as(idAs), asDouble(col("embedding")).as("vd"))
      .withColumn("nrm", sqrt(dotD(col("vd"), col("vd"))))

  /** Query set: a fixed, small id prefix — broadcast side of every probe. */
  private def querySet(s: SparkSession, dir: String): DataFrame =
    prepared(s, dir, "query_id").filter(col("query_id") < 5)
      .select(col("query_id"), col("vd").as("q_vd"), col("nrm").as("q_nrm"))

  private def score: org.apache.spark.sql.Column =
    round(cosineWithNorms(col("q_vd"), col("vd"), col("q_nrm"), col("nrm")), 6)

  private def topk(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
  }

  /** Exact brute-force cosine top-k per query: tiny broadcast query side,
    * one corpus scan — the correctness baseline, not the scale path.
    * Ranking uses the rounded score with id tie-break so ordering is
    * reproducible across engines. */
  def bruteForceTopk(s: SparkSession, dir: String): DataFrame = {
    val scored = broadcast(querySet(s, dir))
      .join(prepared(s, dir, "neighbor_id"),
        col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), score.as("cosine"))
    topk(scored)
  }

  /** Plane count for sign-LSH, derived from corpus size: enough sign
    * bits that an average bucket holds ~`targetBucket` vectors
    * (planes ≈ log₂(n / targetBucket)), floored at 4 so tiny corpora
    * keep multi-bit buckets and capped at 20 (≈1M buckets/table — past
    * that, bucket-key cardinality, not bucket size, is the cost). Per-
    * query candidate work is thus O(targetBucket·L) at ANY corpus size,
    * instead of O(n/2^const) which degenerates to linear at 100×. */
  private[graft] def planesFor(n: Long, targetBucket: Int = 64): Int =
    math.max(4, math.min(20,
      math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) /
        math.log(2.0)).toInt))

  /** Landing dir for the sign-LSH bucket table — the kmeansCentDir
    * contract: computable from `dir` alone so the static oracle SQL can
    * read the run's bucket assignments. */
  private[graft] def lshBucketsDir(dir: String): String =
    graft.Tables.landingDir("lsh_buckets", dir)

  /** Sign-LSH approximate top-k: L=2 independent hash tables of
    * `planesFor(n)` hyperplane sign bits each (OR-amplification — a
    * candidate matches if it collides in ANY table); queries probe only
    * their own buckets. The corpus count is one parquet-metadata job.
    *
    * The (vec_id, table_id, bucket) table LANDS to parquet and the
    * emitted result is recomputed from the landed buckets, so the
    * oracle re-derives candidate generation + scoring + ranking
    * brute-force in DuckDB (the simhash/kmeans landed-artifact
    * pattern) — only the seeded hyperplane hash itself stays
    * Spark-side. Recall is additionally spec-checked against brute
    * force at multiple SFs. */
  /** Land-once memo for the LSH bucket table (the kmeansLanded
    * pattern): the bucket assignment is deterministic per corpus, and
    * both ann_lsh_topk and ann_recall_eval consume it — without the
    * memo recall_eval re-paid the planes×d projection scan and the
    * parquet write per call (measured 10.4× DuckDB at 30× mostly on
    * this re-landing). Content-keyed, so a regenerated embeddings
    * table re-buckets. */
  private val lshLanded = scala.collection.concurrent.TrieMap
    .empty[(Int, String, String), scala.concurrent.Future[Unit]]
  private[graft] def ensureLshLanded(s: SparkSession, dir: String): Unit = {
    graft.Tables.landOnce(lshLanded,
      (System.identityHashCode(s.sparkContext), dir,
        graft.Tables.fingerprint(s, dir, "embeddings"))) {
      val corpusPrep = prepared(s, dir, "neighbor_id")
      val planes = planesFor(corpusPrep.count())
      val tables = 2
      // the bucket landing does planes×d hash-derived projection work
      // per row — heavy per-row expression work behind a ONE-split scan
      // (the embeddings table lands as a single file), which is exactly
      // the Tables.spread case: profiled 7.8s in one task at sf1,
      // spread across the cores it is sub-second.
      Tables.spreadScan(s, s"$dir/embeddings.parquet", corpusPrep)
        .withColumn("table_id",
          explode(array((0 until tables).map(lit(_)): _*)))
        .withColumn("bucket",
          graft.functions.VectorFns.signLshBucketSeeded(
            col("vd"), planes, col("table_id")))
        .select(col("neighbor_id").as("vec_id"), col("table_id"),
          col("bucket"))
        .write.mode("overwrite").parquet(lshBucketsDir(dir))
    }
  }

  def lshTopk(s: SparkSession, dir: String): DataFrame = {
    val corpusPrep = prepared(s, dir, "neighbor_id")
    // probe joins stay on the unspread scan — they are broadcast-side
    // light; the bucket landing is memoized (ensureLshLanded)
    ensureLshLanded(s, dir)
    val landed = s.read.parquet(lshBucketsDir(dir))
    val corpus = landed
      .select(col("vec_id").as("neighbor_id"), col("table_id"),
        col("bucket"))
      .join(corpusPrep, "neighbor_id")
    val qs = landed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("table_id"), col("bucket"))
      .join(querySet(s, dir), "query_id")
    val scored = broadcast(qs)
      .join(corpus, Seq("table_id", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), score.as("cosine"))
      .distinct()
    topk(scored)
  }

  /** Fixed-size coarse-centroid table: the k corpus vectors with the
    * smallest id-hash — a deterministic uniform sample whose size does
    * NOT grow with the corpus (a `% stride` sample grows linearly,
    * making assignment O(n²/stride) and the broadcast unbounded). On a
    * real deployment these come from sampled k-means; the plumbing —
    * fixed-k broadcast table, one O(n·k) assignment pass — is identical. */
  private def centroidTable(s: SparkSession, dir: String, k: Int): DataFrame =
    prepared(s, dir, "cell_id")
      .orderBy(xxhash64(col("cell_id")), col("cell_id"))
      .limit(k)
      .select(col("cell_id"), col("vd").as("c_vd"), col("nrm").as("c_nrm"))

  /** Landing dir for the sampled IVF coarse-centroid table — the
    * kmeansCentDir contract: computable from `dir` alone, with k IN THE
    * PATH. The memo below keys on k, so without k here a k1-then-k2
    * call sequence in one session would overwrite the single landing
    * with k2 centroids while the k1 memo entry stays warm — a later k1
    * call would silently read k2's table. Encoding k makes each k its
    * own artifact; the static oracle SQL resolves the k=16 path (the
    * registered query's k). */
  private[graft] def ivfCentDir(dir: String, k: Int = 16): String =
    graft.Tables.landingDir(s"ivf_cent_k$k", dir)

  /** IVF-style approximate top-k: every vector joins its nearest of k
    * fixed centroids, queries probe `nprobe` nearest cells. Two
    * broadcast joins + one windowed top-k — no cross product. The
    * sampled centroid table LANDS to parquet and the probe plan runs
    * against the landed table, so the oracle re-derives assignment,
    * probes and ranking brute-force in DuckDB. */
  def ivfTopk(s: SparkSession, dir: String): DataFrame =
    ivfTopk(s, dir, k = 16, nprobe = 6)

  /** Land-once memo for the sampled IVF centroid table — tiny (k rows)
    * but its derivation is a full sort-limit scan + write job that
    * recall_eval would otherwise re-pay per call. */
  private val ivfCentLanded = scala.collection.concurrent.TrieMap
    .empty[(Int, String, String, Int), scala.concurrent.Future[Unit]]
  private[graft] def ensureIvfCentLanded(
      s: SparkSession, dir: String, k: Int): Unit = {
    graft.Tables.landOnce(ivfCentLanded,
      (System.identityHashCode(s.sparkContext), dir,
        graft.Tables.fingerprint(s, dir, "embeddings"), k)) {
      centroidTable(s, dir, k).select(col("cell_id"), col("c_vd"))
        .write.mode("overwrite").parquet(ivfCentDir(dir, k))
    }
  }

  def ivfTopk(s: SparkSession, dir: String, k: Int, nprobe: Int): DataFrame = {
    ensureIvfCentLanded(s, dir, k)
    val cents = s.read.parquet(ivfCentDir(dir, k))
      .withColumn("c_nrm", sqrt(dotD(col("c_vd"), col("c_vd"))))
    ivfWith(s, dir, cents, nprobe)
  }

  /** IVF with a TRAINED coarse quantizer: kmeans()'s landed centroids
    * instead of hash-sampled corpus vectors — the production IVF shape
    * (train the quantizer, assign the corpus, probe nearest cells).
    * Identical probe plan to ivfTopk; trained cells partition the space
    * better than sampled ones, so the recall floor is higher
    * (spec-checked against brute force). */
  def ivfKmeansTopk(s: SparkSession, dir: String): DataFrame = {
    ensureKmeansLanded(s, dir) // lands the centroid table (memoized)
    val cents = s.read.parquet(kmeansCentDir(dir))
      .select(col("cluster").as("cell_id"), col("cv").as("c_vd"))
      .withColumn("c_nrm", sqrt(dotD(col("c_vd"), col("c_vd"))))
    ivfWith(s, dir, cents, nprobe = 3)
  }

  /** The IVF probe plan over an arbitrary (cell_id, c_vd, c_nrm) coarse
    * table: corpus assigned to its nearest cell, queries probe `nprobe`
    * nearest cells — the corpus assignment runs through the
    * primitive-array kernel (landAssignment's seam — this is the same
    * hot n·k loop under a cosine metric), the probe side stays a tiny
    * broadcast plan.
    *
    * Kernel exactness: sim = (x·c)/(‖x‖·‖c‖) with every dot a
    * sequential left-to-right fold, cells visited in ascending id with
    * strict > — exactly max_by over struct(sim, −cell_id) (ties to the
    * lower cell). A zero-norm side yields NO sim (the Column form's
    * nullif→null), so it never wins, matching max_by's null ordering;
    * all-null leaves the vector unassigned, which the old aggregate
    * surfaced as a null cell joined away by the probe equi-join — the
    * kernel drops the row at the same net effect. */
  private def ivfWith(s: SparkSession, dir: String,
      centroids: DataFrame, nprobe: Int): DataFrame = {
    import s.implicits._
    def dotSeq(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val cellArr: Array[(Long, Array[Double], Double)] = centroids
      .select(col("cell_id"), col("c_vd"), col("c_nrm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    val bcCells = s.sparkContext.broadcast(cellArr)
    val assigned = Tables.spreadScan(s, s"$dir/embeddings.parquet",
        Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bcCells.value
        it.flatMap { case (id, vf) =>
          val v = new Array[Double](vf.length)
          var i = 0
          while (i < v.length) { v(i) = vf(i).toDouble; i += 1 }
          val nrm = Math.sqrt(dotSeq(v, v))
          var bestC = -1L
          var bestS = Double.NegativeInfinity
          var any = false
          var c = 0
          while (c < cs.length) {
            val t = cs(c)
            val den = nrm * t._3
            if (den != 0.0) {
              val sim = dotSeq(v, t._2) / den
              if (!any || sim > bestS) { bestS = sim; bestC = t._1; any = true }
            }
            c += 1
          }
          if (any) Iterator.single((bestC, id, v, nrm)) else Iterator.empty
        }
      }
      .toDF("cell_id", "neighbor_id", "vd", "nrm")
    // Query probes (nprobe cells, 5 rows): the rank window is fine here.
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cell_id"))
    val probes = querySet(s, dir)
      .crossJoin(broadcast(centroids))
      .withColumn("sim", cosineWithNorms(col("q_vd"), col("c_vd"),
        col("q_nrm"), col("c_nrm")))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("q_vd"), col("q_nrm"), col("cell_id"))
    val scored = broadcast(probes)
      .join(assigned, Seq("cell_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), score.as("cosine"))
    topk(scored)
  }

  /** L2-normalize + int8 quantization audit — the shrink step before an
    * ANN index ships: per vector, the norm, the symmetric int8 code
    * (round(x/‖x‖·127)), and the total dequantization error. Pure
    * projection, no shuffle. Per-element errors are rounded to integer
    * NANOS and summed as plain longs (the integer-unit moments
    * discipline — see the inline note for why this replaced the r14
    * decimal fold) and the SUM is emitted rather than the mean — a
    * double divide-then-round re-introduces half-point boundaries where
    * engines round a double's last ulp differently (seen live at
    * sf0.001); consumers divide by n_dims themselves. */
  def embNormalize(s: SparkSession, dir: String): DataFrame = {
    // nullif guard: a zero-norm vector must yield null codes/error, not
    // an ANSI divide-by-zero abort (same rule as every cosine path)
    val safeNrm = nullif(col("nrm"), lit(0.0))
    val q = transform(col("vd"), x => round(x / safeNrm * lit(127.0)))
    // per-element error in integer NANOS: round(y·10⁹) is one plain
    // LONG per term, and the fold accumulates longs — the r14 form
    // rounded each term at 9 dp and summed DECIMAL(28,9) (BigDecimal-
    // backed above precision 18, allocated per element inside the
    // interpreted HOF — 64 allocations/row made this 'pure projection'
    // the §2E tail's 7.8×). Exactness is unchanged in kind: both
    // engines round the SAME IEEE double y·10⁹ half-up to an integer
    // (the round(y,9) cross-engine argument, one multiply earlier), the
    // long sum is order-independent, and the final nanos/10⁹ divide is
    // correctly rounded (k < 2⁵³ exact, one IEEE divide) — bit-identical
    // to casting the exact decimal sum to double.
    val errTerms = zip_with(col("vd"), col("q"), (x, qq) =>
      round(abs(x / safeNrm - qq / lit(127.0)) * lit(1e9)).cast("long"))
    prepared(s, dir, "vec_id")
      .withColumn("q", q)
      .withColumn("err_nanos", aggregate(errTerms,
        lit(0L), (acc, x) => acc + x))
      .select(col("vec_id"), round(col("nrm"), 6).as("norm"),
        (col("err_nanos").cast("double") / lit(1e9)).as("sum_q_err"),
        size(col("vd")).cast("bigint").as("n_dims"))
  }

  /** Per-label centroid drift audit — the embedding-quality dashboard of
    * a training pipeline: each vector's cosine to its label centroid,
    * flagging drifted/outlier members. The centroid is a per-(label,
    * dim) mean computed with the dimStats discipline (round → exact
    * DECIMAL → associative SUM → one double divide): order-independent
    * and MAP-SIDE COMBINABLE, so it is bit-identical across engines,
    * partitionings and reruns with no task ever materializing a label's
    * member list — the r12 form's ordered fold held vectors-per-label
    * values in one task (measured 8.7× DuckDB at 30×; per-label width
    * grows linearly with the corpus, so the fold was also the one
    * unbounded-task residue in this file). The centroid table
    * (labels × dims) is broadcast. */
  def centroidAudit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val emb = Tables.embeddings(s, dir)
    val flat = emb
      .select(col("label"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("label"), col("vec_id"), col("i"),
        col("x").cast("double").as("x"))
    val cent = flat.groupBy(col("label"), col("i"))
      .agg((sum(round(col("x"), 9).cast(DecimalType(18, 9))).cast("double")
        / count(lit(1)).cast("double")).as("c"))
    val carr = cent.groupBy(col("label"))
      .agg(collect_list(struct(col("i"), col("c"))).as("cs"))
      .select(col("label"),
        transform(array_sort(col("cs")), e => e.getField("c")).as("cv"))
    val vd = asDouble(col("embedding"))
    emb.join(broadcast(carr), "label")
      .select(col("label"), col("vec_id"),
        round(dotD(vd, col("cv")) /
          nullif(sqrt(dotD(vd, vd)) *
            sqrt(dotD(col("cv"), col("cv"))), lit(0.0)), 6)
          .as("cos_centroid"))
  }

  /** Landing dir for the k-means centroid table — same contract as
    * Dedup.simhashFpDir: computable from `dir` alone so the static
    * oracle SQL can locate the run's centroids. */
  private[graft] def kmeansCentDir(dir: String): String =
    graft.Tables.landingDir("kmeans_cent", dir)

  /** Landing dir for the full-corpus quantizer ASSIGNMENT (vec_id →
    * cluster, squared-L2 dist) — the second half of the r13 quantizer
    * discipline: train on a bounded sample, then assign the corpus ONCE
    * and land the result, so the four assignment consumers (emb_kmeans,
    * emb_knn_graph, emb_index_shards, dedup_semantic) read n rows
    * instead of each re-paying the O(n·k) scan. Same contract as
    * kmeansCentDir: computable from `dir` alone. */
  private[graft] def kmeansAssignDir(dir: String): String =
    graft.Tables.landingDir("kmeans_assign", dir)

  /** Two-level landings ([[trainKmeansTwoLevel]]): the coarse centroid
    * table and the fine-cluster → coarse-cell map — both bounded. */
  private[graft] def kmeansCoarseDir(dir: String): String =
    graft.Tables.landingDir("kmeans_coarse", dir)
  private[graft] def kmeansCellMapDir(dir: String): String =
    graft.Tables.landingDir("kmeans_cellmap", dir)

  /** Train-once memo for the landed quantizer: the downstream consumers
    * (dedup_semantic, emb_knn_graph, emb_index_shards) only need the
    * LANDED centroid table, and Lloyd's is deterministic for a given
    * input — re-running it per consumer re-lands identical bytes. Keyed
    * by (SparkContext identity, data dir) so a fresh session (or a
    * different scale factor) always retrains. */
  private val kmeansLanded = scala.collection.concurrent.TrieMap
    .empty[(Int, String, String), scala.concurrent.Future[Unit]]
  /** Test hook (the DocArtifacts.clearMemo discipline). */
  private[graft] def clearKmeansMemo(): Unit = kmeansLanded.clear()
  private[graft] def ensureKmeansLanded(s: SparkSession, dir: String): Unit = {
    graft.Tables.landOnce(kmeansLanded,
      (System.identityHashCode(s.sparkContext), dir,
        // content-keyed (count:bytes:mtime:listing-hash): a regenerated
        // embeddings table retrains instead of serving a stale quantizer
        graft.Tables.fingerprint(s, dir, "embeddings"))) {
      val n = graft.Tables.rowCount(s, dir, "embeddings")
      if (twoLevelNeeded(n)) {
        // past the flat cap's 512-width runway: coarse-then-fine
        // quantization (the prescription the r15 guard named) — lands
        // the same centroid/assignment schema, consumers unchanged
        assertCoarseCapacity(n)
        trainKmeansTwoLevel(s, dir, n, broadcastK, 5)
      } else {
        assertCellWidth(n)
        trainKmeans(s, dir)
        landAssignment(s, dir)
      }
    }
  }

  /** Assign the FULL corpus once against the landed centroids and land
    * (vec_id, cluster, dist) — dist is the raw squared-L2 double (the
    * `kmeans` op rounds at emit).
    *
    * This is the third documented kernel seam (after the multimodal
    * codec and the integer-unit moments fold): a `mapPartitions` argmin
    * loop over primitive arrays, because assignment is THE hot inner
    * loop of the similarity family — n·k candidate evaluations where
    * the crossJoin + min_by formulation pays row-copy/struct/agg
    * machinery ~40× the cost of the 64-mult dot itself (measured: the
    * 30× assignment, 14M candidate rows, 2.5s through the join vs
    * ~0.1s of arithmetic). Past the k cap (k = 4096, n ≥ 1 M) the
    * per-row work is a fixed 4096·d — the kernel is what makes the
    * k-cap regime affordable at all.
    *
    * Exactness contract: the loop replicates the Column form
    * operand-for-operand — dist = (‖x‖² + ‖c‖²) − 2·(x·c), every dot a
    * sequential left-to-right fold (DotProduct's order, DuckDB's
    * list_dot_product order), centroids visited in ascending cluster
    * id with strict `<` so ties break to the lower id exactly like
    * min_by over struct(dist, cluster). Driver/broadcast state is the
    * BOUNDED centroid table (≤ 4096×64 doubles — the trainKmeans
    * allowance). StressSpec pins kernel-vs-brute-force parity; the
    * DuckDB oracles re-derive the same values from the landed centroid
    * parquet, which round-trips doubles exactly. */
  private def landAssignment(s: SparkSession, dir: String): Unit = {
    import s.implicits._
    if (quantizerK(s, dir) > broadcastK) {
      // past the broadcast cap the centroid table stays landed and the
      // corpus meets it through the block cogroup kernel — no driver
      // collect, no broadcast (blockAssign's exactness contract makes
      // the landed assignment bit-identical to the kernel below)
      val vecs = Tables.spreadScan(s, s"$dir/embeddings.parquet",
        Tables.embeddings(s, dir)
          .select(col("vec_id"), asDouble(col("embedding")).as("vd")))
      blockAssign(s, vecs, s.read.parquet(kmeansCentDir(dir)))
        .write.mode("overwrite").parquet(kmeansAssignDir(dir))
      return
    }
    def dotSeq(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val cents: Array[(Long, Array[Double], Double)] =
      s.read.parquet(kmeansCentDir(dir)).collect()
        .map { r =>
          val cv = r.getSeq[Double](1).toArray
          (r.getLong(0), cv, dotSeq(cv, cv))
        }
        .sortBy(_._1)
    val bc = s.sparkContext.broadcast(cents)
    // k×d scoring work per ROW behind a near-one-split scan — the
    // spreadScan case (the lshTopk landing's profile, same table)
    Tables.spreadScan(s, s"$dir/embeddings.parquet",
        Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, vf) =>
          val v = new Array[Double](vf.length)
          var i = 0
          while (i < v.length) { v(i) = vf(i).toDouble; i += 1 }
          val nx2 = dotSeq(v, v)
          var bestC = -1L
          var bestD = Double.PositiveInfinity
          var c = 0
          while (c < cs.length) {
            val (cid, cv, nc2) = cs(c)
            val d = (nx2 + nc2) - 2.0 * dotSeq(v, cv)
            if (d < bestD) { bestD = d; bestC = cid }
            c += 1
          }
          (id, bestC, bestD)
        }
      }
      .toDF("vec_id", "cluster", "dist")
      .write.mode("overwrite").parquet(kmeansAssignDir(dir))
  }

  /** k for the corpus quantizer, derived from the corpus so the
    * EXPECTED cell width stays ~256 vectors at any scale — the SemDeDup
    * discipline (n/k ≈ constant, Abbas et al. 2023). This is what keeps
    * every cell-local consumer linear: dedup_semantic, emb_knn_graph
    * and the IVF probes all pay O(Σ cell²) or O(cell·k') work, so a
    * FIXED k turns them quadratic as the corpus grows (measured: the
    * r11 sf1 sweep, where k=8 over 10× vectors scaled emb_knn_graph
    * 23.7× for 10× data). Floor 8 keeps the small-sf spec surface and
    * the committed sf0.1 artifacts bit-identical (2000/256 < 8).
    *
    * Two k regimes, split at [[broadcastK]]:
    *  - k ≤ 4096: Lloyd state rides the driver/broadcast (k × d ≈ 2 MB)
    *    and assignment is the one-pass broadcast argmin kernel;
    *  - 4096 < k ≤ [[maxQuantizerK]] (262144): sweep and assignment
    *    state live in a LANDED centroid table and assignment is the
    *    block-partitioned cogroup kernel ([[blockAssign]]) — no driver
    *    or broadcast structure grows with k. Per-sweep cost is
    *    64·k²·d flops (the bounded-sample discipline), a cluster-scale
    *    job at the top of the range, linear in n below it.
    * Past maxQuantizerK the width guard ([[assertCellWidth]]) allows a
    * 512-width runway; past THAT (n > ~134M vectors) the landing
    * switches to the TWO-LEVEL quantizer ([[trainKmeansTwoLevel]]) —
    * coarse 4096-cell broadcast level, per-cell fine quantizers
    * through the cell cogroup kernel — up to the ~4.3B-vector
    * coarse-capacity wall ([[assertCoarseCapacity]]). Reads the row
    * count from parquet footers (no job), and the landing memo already
    * keys on the embeddings fingerprint, so k tracks the data. */
  private[graft] def quantizerK(s: SparkSession, dir: String): Int =
    quantizerKFor(graft.Tables.rowCount(s, dir, "embeddings"))

  /** Driver/broadcast state bound: at or under this k the centroid table
    * may live on the driver and broadcast; above it, state must stay in
    * landed tables (the blockAssign regime). */
  private[graft] val broadcastK = 4096

  /** Hard k ceiling for the FLAT (single-level) quantizer: 64× the
    * broadcast cap. Bounds the landed centroid table (≤ 262144 × 64
    * doubles ≈ 134 MB — a small parquet, never driver-held past
    * broadcastK) and the per-vector assignment cost (k·d flops). */
  private[graft] val maxQuantizerK = 64 * 4096

  private[graft] def quantizerKFor(n: Long): Int =
    math.max(8L, math.min(maxQuantizerK.toLong, n / 256L)).toInt

  /** Loud boundary for the flat-quantizer regime (the cosinePairBudget
    * discipline: fail with a named error instead of silently degrading).
    * Past the [[maxQuantizerK]] cap the expected cell width n/k grows
    * linearly with the corpus — the r13 2M-vector probe measured cells
    * drifting to ~488 with no signal under the old 4096 cap — and every
    * cell-local consumer (dedup_semantic, emb_knn_graph, the IVF probes)
    * pays O(Σ cell²) or O(cell·k'), so unchecked growth re-quadratizes
    * exactly the family the derived-k rule linearized. 512 is one
    * doubling past the ~256 design width: within it cell-local work
    * stays ≤ ~4× design cost (width² on 2× width); beyond it the
    * prescription in the error — a second quantizer level (cluster the
    * centroids, assign coarse-then-fine, the IVF-HNSW/two-level shape)
    * — must be taken deliberately, not discovered in a latency graph.
    * The r14 boundary (2M vectors at the 4096 broadcast cap) is now
    * INSIDE the runway: blockAssign carries 4096 < k ≤ 262144 with
    * state out of the driver, so the guard trips only past ~134M
    * vectors. Guard sits on [[ensureKmeansLanded]] so every consumer of
    * the landed quantizer trips it. */
  private[graft] def assertCellWidth(n: Long): Unit = {
    val k = quantizerKFor(n)
    val width = if (k <= 0) 0L else n / k
    if (width > 512L)
      throw new IllegalStateException(
        s"graft quantizer cell width $width exceeds the 512 bound " +
          s"(n=$n vectors, k=$k at the $maxQuantizerK flat cap): " +
          "cell-local consumers would run >4x their design cost. The " +
          "flat quantizer ends here — add a second quantizer level " +
          "(cluster the landed centroids, assign coarse-then-fine) " +
          "before scaling past this corpus.")
  }

  /** The FLAT regime ends where [[assertCellWidth]]'s 512-width runway
    * does (n > 512·262144 ≈ 134M vectors); past it the landing switches
    * to the two-level coarse-then-fine quantizer ([[trainKmeansTwoLevel]])
    * instead of failing — the r15 guard's own prescription, taken. */
  private[graft] def twoLevelNeeded(n: Long): Boolean =
    quantizerKFor(n) >= maxQuantizerK && n / maxQuantizerK > 512L

  /** Loud boundary for the TWO-LEVEL regime (the assertCellWidth
    * discipline, one level up): with [[broadcastK]] coarse cells, the
    * expected per-cell fine quantizer is k₂ = n/(4096·256); past
    * k₂ = [[broadcastK]] (n ≈ 4.3B vectors) a cell's centroid slice no
    * longer fits the per-task materialization bound the cell cogroup
    * kernel relies on, and per-vector fine-assignment cost k₂·d has
    * grown 4096-fold — the third level (a deeper coarse tree) must be
    * taken deliberately, not discovered in a latency graph. */
  private[graft] def assertCoarseCapacity(n: Long): Unit = {
    val finePerCell = n / broadcastK.toLong / 256L
    if (finePerCell > broadcastK.toLong)
      throw new IllegalStateException(
        s"graft two-level quantizer: expected per-cell fine k " +
          s"$finePerCell exceeds the $broadcastK per-task bound " +
          s"(n=$n vectors over $broadcastK coarse cells): the " +
          "two-level quantizer ends here — add a third level " +
          "(a deeper coarse tree over the cells) before scaling " +
          "past this corpus.")
  }

  /** Exact argmin assignment of `vecs` (vec_id, vd) against an
    * arbitrary-k centroid table (cluster, cv) WITHOUT driver or
    * broadcast state — the past-[[broadcastK]] regime's assignment
    * plan (and the Lloyd sweep's, via [[trainKmeans]]).
    *
    * Shape: centroids hash into B = ⌈k/blockSize⌉ blocks of ~blockSize;
    * each vector meets every block once via a cogroup on
    * (block, salt) — the salt (vector-id hash, S ≈ cores/B values)
    * spreads a block's vectors over S reduce tasks so parallelism does
    * not collapse onto B keys. A task materializes ONE block's
    * centroids (≤ ~blockSize × d doubles — the same 2 MB bound the
    * broadcast regime puts on the driver) and streams its vector
    * slice through the primitive-array argmin kernel; per-block
    * partials then min-reduce per vector. Shuffle carries n·B vector
    * rows + B·S centroid rows — the honest price of EXACT flat
    * assignment with out-of-driver state (FAISS pays the same n·k
    * flops for exact IVF training assignment).
    *
    * Exactness contract (same result as the broadcast kernel,
    * bit-for-bit): dist = (‖x‖² + ‖c‖²) − 2·(x·c) with sequential
    * left-to-right dots is computed per (vector, centroid) pair
    * independently of grouping; within a block centroids are visited in
    * ascending cluster id with strict `<` (ties keep the lower id), and
    * the cross-block min over struct(dist, cluster) resolves equal
    * dists to the lower cluster id — together exactly the global
    * ascending strict-`<` scan. StressSpec pins block-vs-broadcast
    * parity and fixed-k wall-time linearity.
    *
    * NOT thread-safe: the eager materialization below toggles the
    * session-global `spark.sql.adaptive.coalescePartitions.enabled`
    * around its localCheckpoint, so a CONCURRENT query on the same
    * SparkSession would run that window with AQE coalescing off (and
    * a concurrent setter could be clobbered by the finally-restore).
    * All in-library call sites (the Lloyd sweep, corpus assignment)
    * run serially on the driver thread; callers embedding graft in a
    * multi-threaded session must serialize calls to this helper. */
  private[graft] def blockAssign(s: SparkSession, vecs: DataFrame,
      cents: DataFrame, blockSize: Int = broadcastK): DataFrame = {
    import s.implicits._
    def dotSeq(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val k = cents.count()
    val b = math.max(1L, (k + blockSize - 1) / blockSize).toInt
    // 8× more (block, salt) keys than cores: with keys ≈ cores the
    // hash-to-partition balls-in-bins collisions leave 2-4-key
    // straggler tasks holding the stage (measured on the 4M probe:
    // 2 tasks × ~7 min tails at 32 keys / 32 partitions); many small
    // keys per partition amortize instead
    val salts = math.max(1, 8 * s.sparkContext.defaultParallelism / b)
    val centsRep = cents.select(
        pmod(xxhash64(col("cluster")), lit(b.toLong)).cast("int")
          .as("block"),
        explode(array((0 until salts).map(lit(_)): _*)).as("salt"),
        col("cluster"), col("cv").cast("array<double>").as("cv"))
      .as[(Int, Int, Long, Array[Double])]
      .groupByKey(t => (t._1, t._2))
    val vecsRep = vecs.select(
        explode(array((0 until b).map(lit(_)): _*)).as("block"),
        pmod(xxhash64(col("vec_id")), lit(salts.toLong)).cast("int")
          .as("salt"),
        col("vec_id"), col("vd"))
      .as[(Int, Int, Long, Array[Double])]
      .groupByKey(t => (t._1, t._2))
    val partial = vecsRep.cogroup(centsRep) { case (_, vs, cIt) =>
      val cs = cIt.map { case (_, _, cid, cv) => (cid, cv, dotSeq(cv, cv)) }
        .toArray.sortBy(_._1)
      if (cs.isEmpty) Iterator.empty
      else vs.map { case (_, _, id, v) =>
        val nx2 = dotSeq(v, v)
        var bestC = -1L
        var bestD = Double.PositiveInfinity
        var c = 0
        while (c < cs.length) {
          val t = cs(c)
          val d = (nx2 + t._3) - 2.0 * dotSeq(v, t._2)
          if (d < bestD) { bestD = d; bestC = t._1 }
          c += 1
        }
        (id, bestC, bestD)
      }
    }.toDF("vec_id", "cluster", "dist")
    val reduced = partial
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("cluster"))).as("m"))
      .select(col("vec_id"), col("m.cluster").as("cluster"),
        col("m.dist").as("dist"))
    // Materialize HERE with AQE partition-coalescing off: the cogroup
    // partitions are ~17 MB of shuffle bytes but k·d FLOPS of kernel
    // work per row, and AQE sizes by bytes — on the 4M probe it
    // coalesced the 256-key stage to ~9 tasks and serialized the sweep
    // onto a third of the cores. Toggled only around this eager
    // execution (the landing/sweep paths run serially); values are
    // partitioning-independent (the exactness contract above).
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "false")
    try reduced.localCheckpoint()
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** Per-cell row counts of a (cell, …) frame — one combinable
    * aggregate onto ≤ [[broadcastK]] keys, collected (bounded). */
  private[graft] def cellWidthsOf(vecs: DataFrame): Map[Int, Long] =
    vecs.groupBy(col("cell")).agg(count(lit(1)).as("w"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  /** Exact PER-CELL argmin for the two-level quantizer, carrying the
    * vector through — each vector meets ONLY its own coarse cell's
    * centroid slice, through the [[blockAssign]] cogroup machinery
    * keyed on (cell, salt). A task materializes ONE cell's fine
    * centroids (≤ [[broadcastK]] × d doubles by
    * [[assertCoarseCapacity]]) and streams its vector slice through
    * the primitive-array argmin kernel; no cross-group reduce is
    * needed — a vector appears in exactly one (cell, salt) group.
    * Same exactness contract as blockAssign: ascending-cluster
    * strict-`<` scan, ties to the lower id. The Lloyd sweep
    * consumes (cluster, vd) directly from the cogroup's own hand
    * instead of re-joining the sample per sweep (1M×1M at the 4M
    * probe). Dropping `vd` is a projection; nothing re-shuffles it.
    *
    * Salting is PER CELL and FLOPS-proportional: coarse cells are
    * data-skewed (unlike blockAssign's hash-balanced blocks), and a
    * cell's assignment work is width × its own fine k ∝ width², so a
    * fixed salt count leaves one mega-cell holding the stage (the 4M
    * probe measured 3-task stragglers for many minutes). Each cell
    * gets g_c = ceil(width_c² / q) salt groups, q sized so the total
    * task count lands near 8× the cores; the vecs side takes one salt
    * by id hash, the cell's centroid slice replicates g_c ways via a
    * broadcast literal map. */
  private def cellAssignFull(s: SparkSession, vecs: DataFrame,
      cents: DataFrame, widths: Map[Int, Long]): DataFrame = {
    import s.implicits._
    def dotSeq(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val par = s.sparkContext.defaultParallelism
    val totalW2 = widths.values.map(w => w.toDouble * w.toDouble).sum
    val q = math.max(1.0, totalW2 / (8.0 * par))
    val gOf: Map[Int, Int] = widths.map { case (c, w) =>
      c -> math.min(16L * par,
        math.max(1L, math.ceil(w.toDouble * w.toDouble / q).toLong))
        .toInt
    }
    val gLit =
      if (gOf.isEmpty) lit(null).cast("map<int,int>")
      else typedLit(gOf)
    val saltOf = coalesce(element_at(gLit, col("cell").cast("int")),
      lit(1))
    val vecsRep = vecs.select(col("cell").cast("int").as("cell"),
        pmod(xxhash64(col("vec_id")), saltOf.cast("long")).cast("int")
          .as("salt"),
        col("vec_id"), col("vd").cast("array<double>").as("vd"))
      .as[(Int, Int, Long, Array[Double])]
      .groupByKey(t => (t._1, t._2))
    val centsRep = cents.select(col("cell").cast("int").as("cell"),
        explode(sequence(lit(0), saltOf - 1)).as("salt"),
        col("cluster"), col("cv").cast("array<double>").as("cv"))
      .as[(Int, Int, Long, Array[Double])]
      .groupByKey(t => (t._1, t._2))
    vecsRep.cogroup(centsRep) { case (_, vs, cIt) =>
      val cs = cIt.map { case (_, _, cid, cv) => (cid, cv, dotSeq(cv, cv)) }
        .toArray.sortBy(_._1)
      if (cs.isEmpty) Iterator.empty
      else vs.map { case (_, _, id, v) =>
        val nx2 = dotSeq(v, v)
        var bestC = -1L
        var bestD = Double.PositiveInfinity
        var c = 0
        while (c < cs.length) {
          val t = cs(c)
          val d = (nx2 + t._3) - 2.0 * dotSeq(v, t._2)
          if (d < bestD) { bestD = d; bestC = t._1 }
          c += 1
        }
        (id, bestC, bestD, v)
      }
    }.toDF("vec_id", "cluster", "dist", "vd")
  }

  /** TWO-LEVEL quantizer landing — the regime past the flat cap's
    * 512-width runway ([[twoLevelNeeded]], n > ~134M vectors), i.e.
    * the "second quantizer level" the r15 width guard prescribed as an
    * error message:
    *
    *  1. COARSE: `coarseK` (= [[broadcastK]] in production) centroids
    *     trained by the driver-state Lloyd loop ([[lloydBroadcast]])
    *     on a bounded hash-mod sample; the coarse table is ≤ 4096×d
    *     doubles — broadcastable by construction, at any n.
    *  2. Every vector gets its coarse CELL from the broadcast argmin
    *     kernel — recomputed on the fly wherever needed (deterministic
    *     from the coarse table; never landed, never joined).
    *  3. FINE: one quantizer per cell, ALL cells trained together —
    *     the expected-64-per-centroid hash-mod sample (every 4th
    *     vector: width 256 / 4) sweeps through [[cellAssignFull]], means
    *     via the order-free exact-decimal fold (the blocked trainer's
    *     discipline). Seeds are the expected-1-per-64-sample-rows
    *     hash-mod slice — so a cell's fine k tracks its width — with a
    *     min-vec_id fallback seed for any populated cell the hash
    *     missed (every corpus vector must have a same-cell centroid).
    *     Fine cluster ids are their seed vec_ids: globally unique, so
    *     the landed FLAT schema — (cluster, cv) centroids, (vec_id,
    *     cluster, dist) assignment — is exactly the one-level one and
    *     every consumer reads it unchanged.
    *  4. The corpus assignment is coarse-on-the-fly + [[cellAssignFull]]
    *     against the landed fine centroids: each vector pays
    *     d·(coarseK + its cell's fine k) flops instead of the flat
    *     regime's d·k_total — THE point of the second level.
    *
    * Semantics note (StressSpec pins it): the landed assignment is the
    * argmin WITHIN the vector's coarse cell — the IVF contract — not
    * the global argmin over all fine centroids; at this scale the flat
    * oracle no longer applies (the bundled SFs never reach this
    * regime; the probe and spec below exercise it with a forced small
    * coarseK). */
  private[graft] def trainKmeansTwoLevel(s: SparkSession, dir: String,
      n: Long, coarseK: Int, sweeps: Int): Unit = {
    // AQE partition-coalescing OFF for the whole landing (the
    // blockAssign rationale, same non-thread-safety caveat — landings
    // run serially): the cellAssign cogroup stages carry ~fractions of
    // a GB of shuffle bytes but k₂·d FLOPS of kernel work per row, and
    // AQE sizes by bytes — the 4M probe ran its sweep stages on ~3
    // cores before this toggle.
    val aqeKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val aqePrev = s.conf.getOption(aqeKey)
    s.conf.set(aqeKey, "false")
    try trainKmeansTwoLevelBody(s, dir, n, coarseK, sweeps)
    finally aqePrev match {
      case Some(v) => s.conf.set(aqeKey, v)
      case None    => s.conf.unset(aqeKey)
    }
  }

  private def trainKmeansTwoLevelBody(s: SparkSession, dir: String,
      n: Long, coarseK: Int, sweeps: Int): Unit = {
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    def dotSeq(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    // near-one-split spread on every corpus pass: the kernel work per
    // row is k·d FLOPS and a single ~1GB parquet file yields only ~8
    // byte-range splits (measured: the 4M probe's corpus passes ran on
    // 3-4 cores unspread)
    val corpus = Tables.spreadScan(s, s"$dir/embeddings.parquet",
      prepared(s, dir, "vec_id").select(col("vec_id"), col("vd")))
    // level 1: coarse centroids, driver-state Lloyd on a bounded sample
    val cap1 = trainSampleCap(coarseK)
    val slice1 = math.max(1L, n / cap1)
    val csample = (if (slice1 > 1L)
        corpus.filter(pmod(xxhash64(col("vec_id")), lit(slice1)) === 0L)
      else corpus)
      .repartition(s.sparkContext.defaultParallelism)
      .localCheckpoint()
    val coarseArr: Array[(Int, Array[Double], Double)] =
      lloydBroadcast(s, csample, coarseK, sweeps)
        .sortBy(_._1).zipWithIndex.map { case ((_, cv), i) =>
          val a = cv.toArray
          (i, a, dotSeq(a, a))
        }.toArray
    val bcCoarse = s.sparkContext.broadcast(coarseArr)
    // the broadcast coarse-argmin kernel: (vec_id, vd) -> (cell, vec_id, vd)
    def withCells(df: DataFrame): DataFrame =
      df.as[(Long, Array[Double])].mapPartitions { it =>
        val cs = bcCoarse.value
        it.map { case (id, v) =>
          val nx2 = dotSeq(v, v)
          var best = -1
          var bestD = Double.PositiveInfinity
          var c = 0
          while (c < cs.length) {
            val t = cs(c)
            val d = (nx2 + t._3) - 2.0 * dotSeq(v, t._2)
            if (d < bestD) { bestD = d; best = t._1 }
            c += 1
          }
          (best, id, v)
        }
      }.toDF("cell", "vec_id", "vd")
    // level 2: per-cell fine quantizers, all cells in one sweep job
    val fsample = withCells(
        corpus.filter(pmod(xxhash64(col("vec_id")), lit(4L)) === 0L))
      .localCheckpoint()
    val hashSeeds = fsample.filter(
      pmod(xxhash64(col("vec_id"), lit(7L)), lit(64L)) === 0L)
    // one corpus stats pass: per-cell min id (the seed fallback) AND
    // width (the FLOPS-proportional salt budget for the final corpus
    // assignment) — a combinable aggregate onto ≤ coarseK keys,
    // collected (bounded by configuration)
    val cellStats: Map[Int, (Long, Long)] = withCells(corpus)
      .groupBy(col("cell"))
      .agg(min(col("vec_id")).as("mn"), count(lit(1)).as("w"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val corpusWidths = cellStats.map { case (c, (_, w)) => c -> w }
    // fallback seeds: the min-vec_id row of every populated corpus
    // cell the hash slice missed (bounded: <= coarseK ids; the vd
    // recovery is a pushed-down id filter, never a corpus shuffle)
    val seedCells = hashSeeds.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSet
    val fbIds = cellStats.collect {
      case (c, (mn, _)) if !seedCells(c) => mn }.toSeq
    val fallback =
      if (fbIds.isEmpty)
        fsample.limit(0).select(col("cell"), col("vec_id"), col("vd"))
      else withCells(corpus.filter(col("vec_id").isin(fbIds: _*)))
        .select(col("cell"), col("vec_id"), col("vd"))
    var cents = hashSeeds.select(col("cell"), col("vec_id"), col("vd"))
      .unionByName(fallback)
      .select(col("cell"), col("vec_id").as("cluster"),
        col("vd").as("cv"))
      .localCheckpoint()
    val sampleWidths = cellWidthsOf(fsample)
    for (_ <- 1 to sweeps) {
      // means through an order-free INTEGER-MICROS kernel: per-cluster
      // sums of the exact 9dp-long rendering of each coordinate —
      // long addition commutes, so the result is bit-deterministic
      // under any partitioning (the decimal-sum discipline at kernel
      // cost; the r16 first cut exploded 64M (cluster, i, x) rows into
      // a DecimalType hash-agg per sweep and dominated the 4M probe).
      // Training-side only — the oracle contract never sees sweep math.
      val assign = cellAssignFull(s, fsample, cents, sampleWidths)
        .select(col("cluster"), col("vd"))
      val means = assign.as[(Long, Array[Double])]
        .groupByKey(_._1)
        .mapGroups { (cl, it) =>
          var cnt = 0L
          var s9: Array[Long] = null
          it.foreach { case (_, v) =>
            if (s9 == null) s9 = new Array[Long](v.length)
            var i = 0
            while (i < v.length) {
              s9(i) += java.math.BigDecimal.valueOf(v(i))
                .setScale(9, java.math.RoundingMode.HALF_UP)
                .unscaledValue().longValueExact()
              i += 1
            }
            cnt += 1
          }
          // (Σ micros)/1e9 is exact in double (|Σ| < 2^53 for any
          // bounded-norm corpus), then one deterministic /cnt
          (cl, s9.map(m => (m.toDouble / 1e9) / cnt.toDouble).toSeq)
        }
        .toDF("cluster", "mcv")
      cents = cents.join(means, Seq("cluster"), "left")
        .select(col("cell"), col("cluster"),
          coalesce(col("mcv"), col("cv")).as("cv"))
        .localCheckpoint()
    }
    // land the FLAT consumer schema; assign the corpus coarse-on-the-
    // fly + per-cell fine against the SAME checkpointed centroid state
    // the landing wrote (parquet round-trips doubles exactly, so the
    // landed table and `cents` are byte-equivalent)
    cents.select(col("cluster"), col("cv"))
      .write.mode("overwrite").parquet(kmeansCentDir(dir))
    // the level structure lands beside it (both bounded tables):
    // the coarse table for monitoring/debug and the cluster→cell map
    // that makes the cell-containment contract externally checkable
    // (StressSpec re-derives every vector's coarse cell from the
    // landed coarse table and pins containment)
    coarseArr.map { case (cell, cv, _) => (cell, cv.toSeq) }.toSeq
      .toDF("cell", "cv")
      .write.mode("overwrite").parquet(kmeansCoarseDir(dir))
    cents.select(col("cluster"), col("cell"))
      .write.mode("overwrite").parquet(kmeansCellMapDir(dir))
    cellAssignFull(s, withCells(corpus), cents, corpusWidths)
      .select(col("vec_id"), col("cluster"), col("dist"))
      .write.mode("overwrite").parquet(kmeansAssignDir(dir))
    bcCoarse.destroy()
  }

  /** Distributed Lloyd's k-means (corpus-derived k via [[quantizerK]],
    * 5 sweeps) over the embedding
    * corpus — the clustering leg of embedding curation (IVF coarse
    * quantizers, topic balancing, outlier mining). Deterministic end to
    * end: seeds are the training sample's k lowest vec_ids,
    * per-(cluster, dim) means are
    * ordered folds (bit-identical under any partitioning — the
    * centroid-audit discipline), and argmin ties break to the lower
    * cluster id via struct-ordered min_by.
    *
    * Scale: each sweep is ONE scan of the bounded training sample
    * ([[trainSampleCap]]) — the k×d centroid table is broadcast,
    * assignment is the primitive-array argmin kernel (see
    * landAssignment's exactness contract), and the mean recomputation
    * shuffles s·d rows onto k·d keys.
    * The ordered-fold mean materializes one (cluster, dim) group's
    * values per task (bounded by cluster size; on an unbounded corpus
    * swap the fold for a plain associative SUM and accept last-ulp
    * noise, as documented on centroidAudit). Empty clusters keep their
    * previous centroid. Per-sweep centroids are localCheckpoint'ed so
    * the iterative plan doesn't accrete lineage (the dedup_cluster
    * discipline). The final centroid table lands to parquet and the
    * emitted assignment is recomputed against the LANDED table, so the
    * oracle re-derives the exact assignment brute-force in DuckDB.
    *
    * Training AND the one full-corpus assignment ride
    * [[ensureKmeansLanded]]'s memoized landing (the bench times it as
    * its own landing line), so the query-facing [[kmeans]] — like the
    * other three assignment consumers — reads the landed n-row
    * assignment instead of re-running the O(n·k) scan. */
  def kmeans(s: SparkSession, dir: String): DataFrame = {
    ensureKmeansLanded(s, dir) // lands centroids + assignment (memoized)
    s.read.parquet(kmeansAssignDir(dir))
      .select(col("vec_id"), col("cluster"), round(col("dist"), 6).as("dist"))
  }

  /** Cross-run incremental k-means maintenance — the production ANN
    * story the incremental dedup ops already tell, completed for the
    * quantizer: a NEW batch of vectors is assigned against the LANDED
    * centroids (never retraining on arrival), and per-cluster drift —
    * batch mean squared-L2 distance vs the landed corpus mean — gates
    * whether a retrain is due. The batch here is the deterministic
    * ~1/16 id-hash slice (the md5-nibble hashSplit rule, engine-
    * portable), standing in for today's arrivals.
    *
    * Scale: one bounded-broadcast argmin kernel pass over the batch
    * (landAssignment's seam and exactness contract), one groupBy on k
    * clusters for the batch means, one k-row read of the landed
    * assignment's per-cluster means — never a corpus re-scan beyond
    * the landed table, never retraining in the query path. Means use
    * the dimStats exact-decimal discipline (round(dist,9) → DECIMAL
    * sum → double divide), so both engines agree bit-for-bit under any
    * accumulation order; the oracle re-derives the batch assignment
    * brute-force from the landed centroid parquet. */
  def kmeansIncremental(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import s.implicits._
    ensureKmeansLanded(s, dir)
    def dotSeq(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val batchRows = Tables.embeddings(s, dir)
      .filter(graft.functions.HashExprs.md5SliceLong(
        col("vec_id").cast("string"), 32, 1) === 7L)
      .select(col("vec_id"), col("embedding"))
    // past the broadcast cap the batch meets the LANDED centroids
    // through the block cogroup kernel, same as landAssignment — the
    // maintenance loop must not re-acquire driver state training gave up
    val batch = if (quantizerK(s, dir) > broadcastK)
      blockAssign(s,
        batchRows.select(col("vec_id"), asDouble(col("embedding")).as("vd")),
        s.read.parquet(kmeansCentDir(dir)))
    else {
      val cents: Array[(Long, Array[Double], Double)] =
        s.read.parquet(kmeansCentDir(dir)).collect()
          .map { r =>
            val cv = r.getSeq[Double](1).toArray
            (r.getLong(0), cv, dotSeq(cv, cv))
          }
          .sortBy(_._1)
      val bc = s.sparkContext.broadcast(cents)
      batchRows
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          val cs = bc.value
          it.map { case (id, vf) =>
            val v = new Array[Double](vf.length)
            var i = 0
            while (i < v.length) { v(i) = vf(i).toDouble; i += 1 }
            val nx2 = dotSeq(v, v)
            var bestC = -1L
            var bestD = Double.PositiveInfinity
            var c = 0
            while (c < cs.length) {
              val (cid, cv, nc2) = cs(c)
              val d = (nx2 + nc2) - 2.0 * dotSeq(v, cv)
              if (d < bestD) { bestD = d; bestC = cid }
              c += 1
            }
            (id, bestC, bestD)
          }
        }.toDF("vec_id", "cluster", "dist")
    }
    def meanDist = (sum(round(col("dist"), 9).cast(DecimalType(18, 9)))
      .cast("double") / count(lit(1)).cast("double"))
    val corpusStats = s.read.parquet(kmeansAssignDir(dir))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_corpus"), meanDist.as("mean_corpus"))
    val batchStats = batch
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_batch"), meanDist.as("mean_batch"))
    val drift = col("mean_batch") / nullif(col("mean_corpus"), lit(0.0))
    // FULL outer: corpusStats only carries clusters with landed
    // assignment rows, but an empty cluster keeps its previous
    // centroid, so a real arrival batch CAN assign to a cluster with
    // zero corpus rows — that cluster must surface (n_corpus = 0,
    // mean_dist_corpus null) rather than silently drop from the
    // drift report (r14 advice).
    corpusStats.join(batchStats, Seq("cluster"), "full")
      .select(col("cluster"),
        coalesce(col("n_corpus"), lit(0L)).as("n_corpus"),
        coalesce(col("n_batch"), lit(0L)).as("n_batch"),
        round(col("mean_corpus"), 6).as("mean_dist_corpus"),
        round(col("mean_batch"), 6).as("mean_dist_batch"),
        round(drift, 6).as("drift_ratio"),
        coalesce(drift > 1.2, lit(false)).as("retrain"))
  }

  /** Training-sample cap: 64 vectors per centroid (the FAISS clustering
    * subsample discipline — Lloyd's quality saturates well below the
    * full corpus; FAISS's own Clustering warns only below ~39
    * points/centroid). With k = n/256 a FULL-corpus sweep is
    * O(n·k) = O(n²/256) — the r12 sf1→sf3 measurement caught the whole
    * assignment family scaling 3.1–4.9× per 3× data on exactly this —
    * while a 64·k sample makes all five sweeps together cost ~1.25× the
    * single full assignment pass (5·64·k² vs n·k = 256·k²). The 4096
    * floor keeps corpora smaller than one cap-k centroid table training
    * on everything (sampling there saves nothing and would churn the
    * committed small-sf artifacts for no win). */
  private[graft] def trainSampleCap(k: Int): Long =
    math.max(4096L, 64L * k)

  /** The Lloyd sweep loop behind [[kmeans]] — lands the centroid table.
    * Trains on a bounded deterministic sample ([[trainSampleCap]]):
    * the `trainSampleCap(k)` corpus vectors with the smallest id-hash
    * (the centroidTable idiom — a uniform, engine-independent draw),
    * so sweep cost is bounded by k², not n·k. The full corpus is
    * assigned ONCE afterwards, against the LANDED centroids
    * ([[landAssignment]]); the oracle contract is unchanged — DuckDB
    * re-derives assignment from the landed centroid parquet and never
    * sees the training path. */
  /** Per-sweep centroid means from an assignment (cluster, vec_id, vd):
    * per-(cluster, dim) ordered folds (bit-identical under any
    * partitioning — the centroid-audit discipline), re-assembled into
    * ascending-dim vectors. One (cluster, dim) group materializes that
    * cluster's member values — bounded by the training-sample cell
    * width (~64 by trainSampleCap), never corpus width. Shared by both
    * training regimes so the sweep math is one body. */
  private def sweepMeans(assign: DataFrame): DataFrame =
    assign
      .select(col("cluster"), col("vec_id"),
        posexplode(col("vd")).as(Seq("i", "x")))
      .groupBy(col("cluster"), col("i"))
      .agg(collect_list(struct(col("vec_id"), col("x"))).as("xs"))
      .select(col("cluster"), col("i"),
        (aggregate(array_sort(col("xs")), lit(0.0),
          (acc, e) => acc + e.getField("x")) / size(col("xs"))).as("c"))
      .groupBy(col("cluster"))
      .agg(collect_list(struct(col("i"), col("c"))).as("cs"))
      .select(col("cluster"),
        transform(array_sort(col("cs")), e => e.getField("c")).as("cv"))

  /** The past-[[broadcastK]] Lloyd loop: centroid state lives in a
    * checkpointed DataFrame (never collected, never broadcast) and each
    * sweep's assignment runs through [[blockAssign]] — the landed-table
    * + shuffle-join regime the r14 width guard prescribed.
    *
    * Differences from the broadcast loop, all training-side only (the
    * oracle contract is unchanged — DuckDB re-derives assignment from
    * the LANDED centroids and never sees training):
    *  - the training sample is the expected-64·k hash-mod slice
    *    (pmod(xxhash64(id), n/cap) = 0) instead of the exact
    *    smallest-cap-hashes sort — a global sort-limit of a 64·k-row
    *    sample would funnel ~n/4 rows through TakeOrdered at this k;
    *  - seeds are the expected-k hash-mod slice of the sample (cluster
    *    id = vec_id, deterministic, engine-free) instead of the k
    *    lowest ids;
    *  - per-sweep means stay a DataFrame left-joined back onto the
    *    previous centroids (coalesce keeps empty clusters on their
    *    previous centroid, exactly the broadcast loop's rule), computed
    *    with the order-free exact-decimal sum instead of the
    *    small-sample ordered fold (see the sweep body). */
  private def trainKmeansBlocked(s: SparkSession, dir: String,
      n: Long, k: Int, sweeps: Int): Unit = {
    val cap = trainSampleCap(k)
    val corpus = prepared(s, dir, "vec_id")
      .select(col("vec_id"), col("vd"))
    val sliceEvery = math.max(1L, n / cap)
    val sample = (if (sliceEvery > 1L)
        corpus.filter(
          pmod(xxhash64(col("vec_id")), lit(sliceEvery)) === 0L)
      else corpus)
      .repartition(s.sparkContext.defaultParallelism)
      .localCheckpoint()
    val sampleN = sample.count()
    val seedEvery = math.max(1L, sampleN / k.toLong)
    // a distinct hash (seed literal) decorrelates the seed draw from
    // the sample draw so seeds spread uniformly within the sample
    var cents = sample.filter(
        pmod(xxhash64(col("vec_id"), lit(7L)), lit(seedEvery)) === 0L)
      .select(col("vec_id").as("cluster"), col("vd").as("cv"))
      .localCheckpoint()
    for (_ <- 1 to sweeps) {
      val assign = blockAssign(s, sample, cents)
        .join(sample, Seq("vec_id"))
        .select(col("cluster"), col("vd"))
      // Means via the ORDER-FREE exact-decimal discipline (the moments
      // landing's), not the small-sample ordered fold: at this k the
      // sample is n/4 rows × d dims and collect_list's typed-imperative
      // merge dominates the sweep (measured 15+ min/sweep at 1M × 64 on
      // the 4M probe). round(x,9) → DECIMAL(27,9) → associative SUM is
      // bit-deterministic under ANY partitioning and map-side
      // combinable; only the k×d reassembly lists are collected per
      // group (bounded by d). Training-side only — the oracle contract
      // never sees sweep math.
      import org.apache.spark.sql.types.DecimalType
      val means = assign
        .select(col("cluster"), posexplode(col("vd")).as(Seq("i", "x")))
        .groupBy(col("cluster"), col("i"))
        .agg((sum(round(col("x"), 9).cast(DecimalType(27, 9)))
          .cast("double") / count(lit(1)).cast("double")).as("c"))
        .groupBy(col("cluster"))
        .agg(collect_list(struct(col("i"), col("c"))).as("cs"))
        .select(col("cluster"),
          transform(array_sort(col("cs")), e => e.getField("c"))
            .as("mcv"))
      cents = cents.join(means, Seq("cluster"), "left")
        .select(col("cluster"),
          coalesce(col("mcv"), col("cv")).as("cv"))
        .localCheckpoint()
    }
    cents.write.mode("overwrite").parquet(kmeansCentDir(dir))
  }

  private def trainKmeans(s: SparkSession, dir: String): Unit = {
    val n = graft.Tables.rowCount(s, dir, "embeddings")
    val k = quantizerKFor(n)
    val sweeps = 5
    if (k > broadcastK) { trainKmeansBlocked(s, dir, n, k, sweeps); return }
    val cap = trainSampleCap(k)
    val corpus = prepared(s, dir, "vec_id")
      .select(col("vec_id"), col("vd"))
    // repartition BEFORE the checkpoint: limit() collapses the sample
    // to one partition, and every sweep's O(s·k) scoring runs against
    // this cached layout — unspread it would serialize all five sweeps
    // onto a single core (the spreadScan lesson, cache edition). The
    // partition count follows the SAMPLE (≥1024 vectors per task, core
    // count at most): a tiny corpus across all 32 cores pays 5 sweeps
    // of near-empty task constants for no parallelism gain.
    val sampleParts = math.max(1L, math.min(
      s.sparkContext.defaultParallelism.toLong,
      math.min(n, cap) / 1024L)).toInt
    val emb = (if (n > cap)
        corpus.orderBy(xxhash64(col("vec_id")), col("vec_id"))
          .limit(cap.toInt)
      else corpus)
      .repartition(sampleParts)
      .localCheckpoint()
    // Iteration state rides the DRIVER: the centroid table is bounded
    // by quantizerK's cap (k × d ≤ 4096 × 64 doubles), never raw data
    // volume — see [[lloydBroadcast]].
    import s.implicits._
    // the sample is EXACTLY min(n, cap) rows (limit), so the driver
    // regime's collect is hard-bounded; the two-level coarse caller
    // keeps the broadcast loop (its hash-mod slice is only
    // expectation-bounded)
    lloydBroadcast(s, emb, k, sweeps, sampleAtMost = math.min(n, cap))
      .toDF("cluster", "cv")
      .write.mode("overwrite").parquet(kmeansCentDir(dir))
  }

  /** The driver-state Lloyd loop shared by the flat ≤[[broadcastK]]
    * trainer and the two-level COARSE trainer: each sweep collects ≤ k
    * centroid rows and re-broadcasts them — the same
    * driver-bounded-trained-step allowance as the PCA eigensolve. The
    * sweep's argmin runs through the SAME kernel as [[landAssignment]]
    * (one broadcast, primitive-array loop — see that scaladoc for the
    * exactness contract); the per-sweep MEANS math runs in Spark
    * unchanged (ordered folds), and collect→broadcast round-trips
    * doubles binarily, so the returned centroids are bit-identical to
    * the pre-refactor inline loop. Seeds = the k lowest vec_ids of the
    * sample; empty clusters keep their previous centroid. */
  /** Sample-size bound for the all-driver Lloyd regime: ≤ this many
    * sample vectors (× d=64 doubles ≈ 32 MB at the cap) collect ONCE
    * and all sweeps run on the driver — the emb_pq r18 discipline:
    * ~3 stages × sweeps of cluster jobs over a CONSTANT-size sample
    * collapse to one collect. Operand-identical math (same argmin
    * kernel order, same vec_id-ascending mean fold), so the landed
    * centroids are bit-identical to the broadcast loop's. Past the
    * bound the per-sweep broadcast loop below runs unchanged. */
  private[graft] val lloydDriverCap = 65536L

  private def lloydDriver(rows: Array[(Long, Array[Double])], k: Int,
      sweeps: Int): Seq[(Long, Seq[Double])] = {
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    // seeds: the k lowest vec_ids (the orderBy(vec_id).limit(k) draw)
    val sorted = rows.sortBy(_._1)
    var centRows: Seq[(Long, Seq[Double])] =
      sorted.take(k).map { case (id, v) => id -> v.toSeq }.toSeq
    for (_ <- 1 to sweeps) {
      val centArr: Array[(Long, Array[Double], Double)] = centRows
        .map { case (c, cv) =>
          val a = cv.toArray
          (c, a, dot(a, a))
        }
        .sortBy(_._1).toArray
      // same kernel as the executor path: (‖x‖²+‖c‖²) − 2·x·c,
      // centroids ascending id, strict < (lower-id tie-break)
      val byCluster = new java.util.HashMap[Long,
        scala.collection.mutable.ArrayBuffer[(Long, Array[Double])]]
      var r = 0
      while (r < rows.length) {
        val (id, v) = rows(r)
        val nx2 = dot(v, v)
        var bestC = -1L
        var bestD = Double.PositiveInfinity
        var c = 0
        while (c < centArr.length) {
          val t = centArr(c)
          val d = (nx2 + t._3) - 2.0 * dot(v, t._2)
          if (d < bestD) { bestD = d; bestC = t._1 }
          c += 1
        }
        var buf = byCluster.get(bestC)
        if (buf == null) {
          buf = new scala.collection.mutable.ArrayBuffer[(Long, Array[Double])]
          byCluster.put(bestC, buf)
        }
        buf += ((id, v))
        r += 1
      }
      // per-(cluster, dim) means folded in vec_id-ascending order —
      // operand-for-operand the sweepMeans array_sort fold
      val means = new java.util.HashMap[Long, Seq[Double]]
      byCluster.forEach { (cl, members) =>
        val ms = members.sortBy(_._1).toArray
        val d = ms(0)._2.length
        val cv = new Array[Double](d)
        var i = 0
        while (i < d) {
          var acc = 0.0
          var j = 0
          while (j < ms.length) { acc += ms(j)._2(i); j += 1 }
          cv(i) = acc / ms.length
          i += 1
        }
        means.put(cl, cv.toSeq)
      }
      centRows = centRows.map { case (c, prev) =>
        val m = means.get(c)
        c -> (if (m == null) prev else m)
      }
    }
    centRows
  }

  private def lloydBroadcast(s: SparkSession, emb: DataFrame, k: Int,
      sweeps: Int, sampleAtMost: Long = Long.MaxValue):
      Seq[(Long, Seq[Double])] = {
    import s.implicits._
    val typed = emb.as[(Long, Array[Double])]
    if (sampleAtMost <= lloydDriverCap)
      return lloydDriver(typed.collect(), k, sweeps)
    var centRows: Seq[(Long, Seq[Double])] =
      emb.orderBy(col("vec_id")).limit(k)
        .select(col("vec_id"), col("vd")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toSeq
    def dotSeq(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    for (_ <- 1 to sweeps) {
      val centArr: Array[(Long, Array[Double], Double)] = centRows
        .map { case (c, cv) =>
          val a = cv.toArray
          (c, a, dotSeq(a, a))
        }
        .sortBy(_._1).toArray
      val bcC = s.sparkContext.broadcast(centArr)
      // squared L2 distance as (‖x‖² + ‖c‖²) − 2·x·c, centroids in
      // ascending id with strict < — byte-for-byte the landAssignment
      // kernel, so argmin (and its lower-id tie-break) is exactly the
      // min_by-over-struct it replaces
      val assign = typed.mapPartitions { it =>
        val cs = bcC.value
        it.map { case (id, v) =>
          val nx2 = dotSeq(v, v)
          var bestC = -1L
          var bestD = Double.PositiveInfinity
          var c = 0
          while (c < cs.length) {
            val t = cs(c)
            val d = (nx2 + t._3) - 2.0 * dotSeq(v, t._2)
            if (d < bestD) { bestD = d; bestC = t._1 }
            c += 1
          }
          (bestC, id, v)
        }
      }.toDF("cluster", "vec_id", "vd")
      val means = sweepMeans(assign)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      bcC.destroy()
      // empty clusters keep their previous centroid
      centRows = centRows.map { case (c, prev) =>
        c -> means.getOrElse(c, prev) }
    }
    centRows
  }

  /** Landing dir for the PQ codebook — the kmeansCentDir contract:
    * computable from `dir` alone so the static oracle SQL can read the
    * run's codebook. */
  private[graft] def pqCodebookDir(dir: String): String =
    graft.Tables.landingDir("pq", dir)

  /** Product quantization — the compression step between `emb_kmeans`'s
    * coarse quantizer and a shippable ANN index (the IVF-PQ shape): the
    * 64-dim space splits into M = 4 16-dim subspaces, each learns its
    * own k = 16 codebook (Lloyd, 3 sweeps, `kmeans`'s determinism
    * discipline: lowest-vec_id seeds, ordered-fold means, argmin ties to
    * the lower cluster id), and every vector is coded as 4 sub-codes —
    * 64 floats compressed to 4 small ids plus a shared 4×16×16 codebook.
    * Output: per (vector, subspace), the chosen code and the squared
    * reconstruction error — the quantization-loss report that decides
    * whether the codebook is good enough to replace raw vectors.
    *
    * Scale: the codebook TRAINS on a bounded deterministic sample
    * ([[trainSampleCap]](16) vectors with the smallest id-hash — the
    * trainKmeans r13 discipline; Lloyd's quality saturates far below
    * the corpus and a full-corpus sweep made this the slowest LLM op
    * at sf3), so each sweep scans a CONSTANT (cap·M)-row subvector
    * table through the primitive-array argmin kernel (landAssignment's
    * seam and exactness contract — per-sub code tables visited in
    * ascending cluster id with strict <, dist in the (‖x‖²+‖c‖²)−2·x·c
    * operand order; the whole M·k·subdim codebook is ~8 KB, captured in
    * the task closure); means shuffle cap·d values onto the bounded
    * (M·k·subdim) key space. Only the FINAL coding scans the corpus —
    * once, against the LANDED codebook — so the oracle re-derives the
    * exact assignment brute-force in DuckDB and never sees the
    * training path. */
  def pq(s: SparkSession, dir: String): DataFrame = {
    val m = 4
    val subDim = 16
    val k = 16
    val sweeps = 3
    val n = graft.Tables.rowCount(s, dir, "embeddings")
    val cap = trainSampleCap(k)
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("vd"))
    def subsOf(df: DataFrame): DataFrame =
      df.select(col("vec_id"),
          explode(array((0 until m).map(i =>
            struct(lit(i).as("sub"),
              slice(col("vd"), i * subDim + 1, subDim).as("sv"))): _*))
            .as("x"))
        .select(col("vec_id"), col("x.sub").as("sub"), col("x.sv").as("sv"))
        .withColumn("nx2", dotD(col("sv"), col("sv")))
    // training sample: smallest-id-hash draw, spread over the cores the
    // SAMPLE justifies (the trainKmeans repartition-before-checkpoint
    // lesson — limit() collapses to one partition)
    val trainEmb = (if (n > cap)
        emb.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(cap.toInt)
      else emb)
    // seeds: the k lowest vec_ids' subvectors FROM THE SAMPLE; cluster
    // id = seed vec_id (the kmeans convention). Iteration state rides
    // the driver — the codebook is bounded by SCHEMA (m × k × subdim =
    // 4 × 16 × 16 doubles), the kmeans driver-bounded discipline: one
    // ≤ m·k-row collect per sweep instead of a checkpoint + prev-join
    // chain; collect→literal round-trips doubles binarily.
    import s.implicits._
    def centDf(rows: Seq[(Int, Long, Seq[Double])]): DataFrame =
      rows.toDF("sub", "cluster", "cv")
    // the training slice COLLECTS ONCE: ≤ trainSampleCap(k) vectors BY
    // CONSTRUCTION (4096 at k = 16, constant at any corpus size), the
    // same driver-boundedness class as the per-sweep codebook collects
    // the r17 form already did. That form ran each sweep as a Spark
    // job pair (argmin assign + means aggregate) over the 4096-row
    // sample — ~6 jobs of per-job constants for arithmetic a driver
    // loop finishes instantly (guide §1.2: fix the job shape first).
    // The driver sweeps below run the SAME argmin kernel (ascending
    // cluster ids, strict <, the (‖x‖²+‖c‖²)−2·x·c operand order,
    // left-to-right dots — dotD's documented accumulation) and the
    // SAME mean arithmetic (round(x,9) → exact DECIMAL(28,9) 9dp-unit
    // integer sum → decimal→double cast → double divide), so the
    // landed codebook — the only training artifact the oracle or the
    // final coding ever sees — is bit-identical to the Spark-sweep
    // form's.
    val sample: Array[(Long, Array[Double])] = trainEmb
      .select(col("vec_id"), col("vd")).as[(Long, Array[Double])]
      .collect()
    // seeds: the k lowest vec_ids' subvectors FROM THE SAMPLE; cluster
    // id = seed vec_id (the kmeans convention)
    var centRows: Seq[(Int, Long, Seq[Double])] = sample
      .sortBy(_._1).take(k).toSeq.flatMap { case (id, vd) =>
        (0 until m).map(i =>
          (i, id, vd.slice(i * subDim, (i + 1) * subDim).toSeq))
      }
    def dotSeq(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    // per-sub code arrays sorted ascending: the kernel's strict < is
    // then exactly min_by over struct(dist, cluster)
    def codeMap(c: Seq[(Int, Long, Seq[Double])])
        : Map[Int, Array[(Long, Array[Double], Double)]] =
      c.groupBy(_._1).map { case (sub, rows) =>
        sub -> rows.map { case (_, cl, cv) =>
          val a = cv.toArray
          (cl, a, dotSeq(a, a))
        }.sortBy(_._1).toArray
      }
    // (sub, cluster, vec_id, sv, dist) via the argmin kernel
    def assignedK(rows: org.apache.spark.sql.Dataset[
          (Long, Int, Array[Double], Double)],
        cm: Map[Int, Array[(Long, Array[Double], Double)]]) =
      rows.mapPartitions { it =>
        it.map { case (id, sub, sv, nx2) =>
          val cs = cm(sub)
          var bestC = -1L
          var bestD = Double.PositiveInfinity
          var i = 0
          while (i < cs.length) {
            val t = cs(i)
            val d = (nx2 + t._3) - 2.0 * dotSeq(sv, t._2)
            if (d < bestD) { bestD = d; bestC = t._1 }
            i += 1
          }
          (sub, bestC, id, sv, bestD)
        }
      }.toDF("sub", "cluster", "vec_id", "sv", "dist")
    // Spark's mean expression, replicated operand-for-operand:
    // round(x, 9) is the double's shortest-decimal HALF_UP round;
    // the DECIMAL(28,9) cast re-rounds that double's shortest decimal
    // rendering to exact 9dp units; the units sum as integers
    // (order-free); decimal→double is BigDecimal.doubleValue; the
    // member-count division is double arithmetic.
    def unit9(x: Double): Long = {
      val r = java.math.BigDecimal.valueOf(x)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
      java.math.BigDecimal.valueOf(r)
        .setScale(9, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    }
    for (_ <- 1 to sweeps) {
      val cm = codeMap(centRows)
      val sums = new java.util.HashMap[(Int, Long), (Array[Long], Long)]
      sample.foreach { case (_, vd) =>
        var sub = 0
        while (sub < m) {
          val sv = vd.slice(sub * subDim, (sub + 1) * subDim)
          val nx2 = dotSeq(sv, sv)
          val cs = cm(sub)
          var bestC = -1L
          var bestD = Double.PositiveInfinity
          var i = 0
          while (i < cs.length) {
            val t = cs(i)
            val d = (nx2 + t._3) - 2.0 * dotSeq(sv, t._2)
            if (d < bestD) { bestD = d; bestC = t._1 }
            i += 1
          }
          val key = (sub, bestC)
          var e = sums.get(key)
          if (e == null) { e = (new Array[Long](subDim), 0L) }
          var j = 0
          while (j < subDim) { e._1(j) += unit9(sv(j)); j += 1 }
          sums.put(key, (e._1, e._2 + 1L))
          sub += 1
        }
      }
      // empty clusters keep their previous centroid
      centRows = centRows.map { case (sub, c, prev) =>
        val e = sums.get((sub, c))
        if (e == null) (sub, c, prev)
        else (sub, c, e._1.toSeq.map(u =>
          java.math.BigDecimal.valueOf(u, 9).doubleValue / e._2.toDouble))
      }
    }
    centDf(centRows).write.mode("overwrite").parquet(pqCodebookDir(dir))
    // final coding against the LANDED codebook (parquet round-trips
    // doubles exactly), through the same kernel
    val landedRows = s.read.parquet(pqCodebookDir(dir)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2))).toSeq
    assignedK(subsOf(emb).as[(Long, Int, Array[Double], Double)],
        codeMap(landedRows))
      .select(col("vec_id"), col("sub").cast("int").as("subspace"),
        col("cluster").as("code"),
        round(col("dist"), 6).as("recon_se"))
  }

  /** Landing dirs for the shared embedding moment tables — the
    * `Tables.landingDir` contract: computable from `dir` alone. */
  private[graft] def momDir(dir: String): String =
    graft.Tables.landingDir("embmom", dir)
  private[graft] def dimDir(dir: String): String =
    graft.Tables.landingDir("embdim", dir)

  private val momentsLanded = scala.collection.concurrent.TrieMap
    .empty[(Int, String, String), scala.concurrent.Future[Unit]]
  /** Test hook (the DocArtifacts.clearMemo discipline). */
  private[graft] def clearMomentsMemo(): Unit = momentsLanded.clear()

  /** ONE fold pass over the embedding corpus lands the two bounded
    * moment tables every embedding-statistics consumer re-derived for
    * itself before r12 — `embmom` (i, j, n_vecs, sum_xy: the exact-
    * decimal upper-triangle second moments, d·(d+1)/2 rows) and
    * `embdim` (dim, n_vecs, sum_x, sum_abs_x, min_x, max_x: the
    * first-moment/extrema stats, d rows). Consumers: emb_covariance,
    * emb_dim_stats, and emb_pca_project (whose eigensolve collects
    * both) — three corpus-sized moment passes where one suffices, the
    * DocArtifacts landed-artifact discipline applied to the embedding
    * family. The fold is the covariance partial-outer-product
    * (scaled-integer 9dp units, exact and associative — see the
    * overflow-headroom note on [[covariance]]), extended with the
    * |x| sums and per-dim min/max that dimStats needs; every landed
    * value is bit-identical to the inline aggregates it replaces
    * (integer addition of 9dp units IS exact decimal addition, and
    * cast(decimal→double) depends only on the numeric value, not the
    * scale), so downstream results — and the unchanged DuckDB oracles
    * that recompute from the embeddings table — hash-match exactly.
    * Memoized per (session, dir, content-fingerprint); landed, not
    * cached, because Verify/Bench clearCache() between ops. */
  private[graft] def ensureMomentsLanded(
      s: SparkSession, dir: String): Unit = {
    graft.Tables.landOnce(momentsLanded,
      (System.identityHashCode(s.sparkContext), dir,
        graft.Tables.fingerprint(s, dir, "embeddings"))) {
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      // d²/2 scaled-integer products per ROW behind a near-one-split
      // scan (the heavy-per-row spread case; the partials are exact
      // integer units, so the row→partition assignment cannot change
      // the fold)
      val partials = graft.Tables.spreadScan(s, s"$dir/embeddings.parquet",
          Tables.embeddings(s, dir).select(col("embedding")))
        .as[Array[Float]]
        .mapPartitions { it =>
          var d = -1
          var n = 0L
          var xy: Array[Long] = null
          var xs: Array[Long] = null
          var xa: Array[Long] = null
          var mn: Array[Double] = null
          var mx: Array[Double] = null
          while (it.hasNext) {
            val vf = it.next()
            if (d < 0) {
              d = vf.length
              xy = new Array[Long](d * (d + 1) / 2)
              xs = new Array[Long](d)
              xa = new Array[Long](d)
              mn = Array.fill(d)(Double.PositiveInfinity)
              mx = Array.fill(d)(Double.NegativeInfinity)
            }
            require(vf.length == d,
              s"ragged embedding width: ${vf.length} vs $d")
            val v = new Array[Double](d)
            var i = 0
            while (i < d) { v(i) = vf(i).toDouble; i += 1 }
            n += 1
            var idx = 0
            i = 0
            while (i < d) {
              xs(i) = Math.addExact(xs(i), scaled9(v(i)))
              xa(i) = Math.addExact(xa(i), scaled9(Math.abs(v(i))))
              if (v(i) < mn(i)) mn(i) = v(i)
              if (v(i) > mx(i)) mx(i) = v(i)
              var j = i
              while (j < d) {
                xy(idx) = Math.addExact(xy(idx), scaled9(v(i) * v(j)))
                idx += 1; j += 1
              }
              i += 1
            }
          }
          if (d < 0) Iterator.empty
          else {
            def dec(u: Long): BigDecimal =
              BigDecimal(java.math.BigDecimal.valueOf(u, 9))
            val pairs = Array.newBuilder[(Int, Int, BigDecimal)]
            var idx = 0
            var i = 0
            while (i < d) {
              var j = i
              while (j < d) {
                pairs += ((i, j, dec(xy(idx))))
                idx += 1; j += 1
              }
              i += 1
            }
            val dims = (0 until d).map(i =>
              (i, dec(xs(i)), dec(xa(i)), mn(i), mx(i)))
            Iterator((n, d, pairs.result().toSeq, dims))
          }
        }
        .toDF("n", "d", "pairs", "dims")
        // eager collapse barrier (the DocArtifacts discipline): both
        // writes reference the partials, and concurrent actions over a
        // lazily-persisted plan can each run the fold before the cache
        // fills — checkpointing materializes it exactly once
        .localCheckpoint()
      // the per-partition ragged-width `require` only proves
      // consistency WITHIN a partition: two internally-consistent
      // partitions of different widths would fold into a silently
      // corrupted landing (pairs beyond the narrower width carrying
      // n_vecs from only some partials) that three consumers then
      // serve. One distinct width across partials, asserted on the
      // checkpointed (#partitions)-row table, closes that seam.
      val widths = partials.select(countDistinct(col("d"))).first().getLong(0)
      require(widths <= 1,
        s"embeddings table mixes $widths distinct vector widths across " +
          "partitions — refusing to land a merged moment table")
      // landed sums stay DECIMAL (scale 9 — the cast is exact since
      // every partial has ≤9 decimals); consumers cast to double at
      // read, which equals the inline sum-then-cast value exactly
      val mom = partials
        .select(col("n"), explode(col("pairs")).as("p"))
        .groupBy(col("p._1").as("i"), col("p._2").as("j"))
        .agg(sum(col("n")).as("n_vecs"),
          sum(col("p._3")).cast(DecimalType(38, 9)).as("sum_xy"))
      val dims = partials
        .select(col("n"), explode(col("dims")).as("q"))
        .groupBy(col("q._1").as("dim"))
        .agg(sum(col("n")).as("n_vecs"),
          sum(col("q._2")).cast(DecimalType(38, 9)).as("sum_x"),
          sum(col("q._3")).cast(DecimalType(38, 9)).as("sum_abs_x"),
          min(col("q._4")).as("min_x"),
          max(col("q._5")).as("max_x"))
      // the two writes share the persisted partials and distinct output
      // dirs: CONCURRENT actions (the DocArtifacts discipline) — wall
      // time is the wider write, not the sum of two job submissions
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      Await.result(Future.sequence(Seq(
        Future(mom.write.mode("overwrite").parquet(momDir(dir))),
        Future(dims.write.mode("overwrite").parquet(dimDir(dir))))),
        scala.concurrent.duration.Duration.Inf)
      ()
    }
  }

  /** Per-dimension corpus statistics — the anisotropy / dead-dimension
    * audit run before shipping an embedding index: per dim, the count,
    * exact-decimal sums of the (9dp-rounded) values and |values|, and
    * min/max. Sums follow the unigram-logprob discipline (round → exact
    * DECIMAL → associative SUM): order-independent, map-side combinable
    * and bit-identical across engines with no ordered fold. Rides the
    * shared moments landing ([[ensureMomentsLanded]]) — the values are
    * byte-identical to the inline n·d → d aggregate this replaced, but
    * the corpus-sized pass is paid once for the whole embedding-stats
    * family. SUMs are emitted rather than means (embNormalize's
    * divide-then-round rationale); consumers divide by n_vecs. */
  def dimStats(s: SparkSession, dir: String): DataFrame = {
    ensureMomentsLanded(s, dir)
    s.read.parquet(dimDir(dir))
      .select(col("dim").cast("int").as("dim"), col("n_vecs"),
        col("sum_x").cast("double").as("sum_x"),
        col("sum_abs_x").cast("double").as("sum_abs_x"),
        round(col("min_x"), 6).as("min_x"),
        round(col("max_x"), 6).as("max_x"))
      .orderBy(col("dim"))
  }

  /** Replicates Spark's `round(x, 9).cast(DecimalType(_, 9))` exactly —
    * toString-based BigDecimal conversion at both steps, HALF_UP — and
    * returns the 10⁻⁹-unit unscaled integer, so per-partition integer
    * accumulation reproduces the decimal-sum discipline bit-for-bit
    * (exact addition is associative + commutative; order is free). */
  private[graft] def scaled9Slow(x: Double): Long = {
    val r = java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    java.math.BigDecimal.valueOf(r)
      .setScale(9, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  }

  /** Fast path for `scaled9Slow`, exact by construction: away from a
    * 9dp rounding boundary, nearest-integer(x·10⁹) computed in doubles
    * equals the BigDecimal result — the FP error of the ×10⁹ multiply
    * (≤ ~0.03 units for |x| ≤ 0.5, i.e. a few ulps of x·10⁹) plus the
    * shortest-repr delta (< 10⁻⁷ units) cannot move the result across a
    * boundary that is ≥ 0.1 units away. Inside the 0.1-unit guard band
    * (or for |x·10⁹| ≥ 2⁵⁰, where the +0.5 trick loses exactness) the
    * slow toString path decides — rare, so the per-product cost is a
    * multiply and a floor instead of two BigDecimal constructions. */
  private[graft] def scaled9(x: Double): Long = {
    val a = x * 1e9
    if (Math.abs(a) < (1L << 50).toDouble) {
      val f = Math.floor(a + 0.5)
      val db = a + 0.5 - f // in [0,1): near 0 or 1 = near a boundary
      if (db > 0.1 && db < 0.9) return f.toLong
    }
    scaled9Slow(x)
  }

  /** Upper-triangle covariance / correlation audit over the embedding
    * dimensions — the whitening / redundant-dimension check run before an
    * index or a projection ships. The corpus-sized work — each partition
    * folding its vectors into ONE d·(d+1)/2-long integer accumulator of
    * 9dp product units (a per-partition partial outer product, so what
    * crosses the exchange is ONE row per partition, not the former
    * n·d²-row explode: r8's one throughput gap, 2,080 rows per vector
    * at d = 64) — lives in the shared moments landing
    * ([[ensureMomentsLanded]]), paid once for the embedding-stats
    * family. The partials merge as exact decimals on the bounded d² key
    * space; the sums equal the dimStats discipline's (round → exact
    * DECIMAL → associative SUM) bit-for-bit because integer addition of
    * 9dp units IS exact decimal addition. Overflow headroom: with
    * |x| ≤ B a partition of n rows needs n·B²·10⁹ < 2⁶³ — n ≲ 2.3e9
    * rows at B = 2, far beyond what a size-bounded parquet split can
    * hold (`Math.addExact` fails loudly rather than wrapping if that
    * ever breaks). First moments and diagonal second moments re-attach
    * via two broadcast joins of the d-row tables; cov/corr arithmetic
    * is written term-for-term as the oracle's, so the doubles are
    * bit-identical. */
  def covariance(s: SparkSession, dir: String): DataFrame = {
    ensureMomentsLanded(s, dir)
    val mom = s.read.parquet(momDir(dir))
      .select(col("i"), col("j"), col("n_vecs"),
        col("sum_xy").cast("double").as("sum_xy"))
    val firsts = s.read.parquet(dimDir(dir))
      .select(col("dim").as("d"), col("sum_x").cast("double").as("sum_x"))
    val diag = mom.filter(col("i") === col("j"))
      .select(col("i").as("d"), col("sum_xy").as("sum_xx"))
    val dTab = firsts.join(diag, "d")
    val n = col("n_vecs").cast("double")
    val cov = col("sum_xy") / n - (col("sx_i") / n) * (col("sx_j") / n)
    val varI = col("sxx_i") / n - (col("sx_i") / n) * (col("sx_i") / n)
    val varJ = col("sxx_j") / n - (col("sx_j") / n) * (col("sx_j") / n)
    mom
      .join(broadcast(dTab.select(col("d").as("i"),
        col("sum_x").as("sx_i"), col("sum_xx").as("sxx_i"))), "i")
      .join(broadcast(dTab.select(col("d").as("j"),
        col("sum_x").as("sx_j"), col("sum_xx").as("sxx_j"))), "j")
      .select(col("i").cast("int").as("dim_i"),
        col("j").cast("int").as("dim_j"),
        col("n_vecs"), col("sum_xy"),
        // + 0.0 collapses IEEE negative zero, which the two engines
        // round to inconsistently
        (round(cov, 6) + lit(0.0)).as("cov"),
        (round(cov / nullif(sqrt(varI) * sqrt(varJ), lit(0.0)), 6)
          + lit(0.0)).as("corr"))
      .orderBy(col("dim_i"), col("dim_j"))
  }

  /** Landing dir for the PCA component table — the kmeansCentDir
    * contract: computable from `dir` alone so the static oracle SQL can
    * read the run's components. */
  private[graft] def pcaCompDir(dir: String): String =
    graft.Tables.landingDir("pca", dir)

  /** PCA projection — the dimensionality-reduction leg of embedding
    * curation (whitening, 2-D corpus maps, variance audits): the top
    * p = 4 principal components of the embedding covariance, and every
    * vector's centered projection onto them.
    *
    * Scale split, explicitly: the covariance and mean tables are
    * BOUNDED by d² = 64² — they're `emb_covariance` / `emb_dim_stats`
    * aggregates, so collecting them to the driver is O(d²) no matter
    * how many vectors flow in (the same bounded-artifact rule as a
    * broadcast dim). The eigensolve (power iteration + deflation, 100
    * sweeps, fixed uniform init, sign fixed by first non-tiny
    * coordinate) is sequential driver math on that 64×64 matrix —
    * deterministic to the bit. The corpus-sized work — projecting every
    * vector — happens distributed against the BROADCAST landed
    * component table. Components land with a precomputed `mu_dot`
    * (mean·component) so both engines compute dot(v,c) − mu_dot with
    * identical float steps; the oracle re-derives every projection from
    * the landed components in DuckDB. */
  def pcaProject(s: SparkSession, dir: String): DataFrame = {
    val p = 4
    val iters = 100
    val covRows = covariance(s, dir)
      .select(col("dim_i"), col("dim_j"), col("cov")).collect()
    val d = covRows.iterator.map(_.getInt(1)).max + 1
    val m = Array.ofDim[Double](d, d)
    covRows.foreach { r =>
      m(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      m(r.getInt(1))(r.getInt(0)) = r.getDouble(2)
    }
    val means = dimStats(s, dir)
      .select(col("dim"), col("sum_x"),
        col("n_vecs").cast("double").as("n")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1) / r.getDouble(2)).toMap
    def matVec(v: Array[Double]): Array[Double] =
      Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * v(j)).sum)
    // re-orthogonalize against the found components EVERY sweep (not
    // one-shot deflation): close eigenvalues otherwise leak earlier
    // directions back in and leave the basis only ~1e-4 orthogonal
    val found = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val comps = (0 until p).map { c =>
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      for (_ <- 0 until iters) {
        var w = matVec(v)
        found.foreach { u =>
          val dp = (0 until d).map(i => w(i) * u(i)).sum
          w = Array.tabulate(d)(i => w(i) - dp * u(i))
        }
        val nrm = math.sqrt(w.map(x => x * x).sum)
        if (nrm > 0.0) v = w.map(_ / nrm)
      }
      val k = v.indexWhere(x => math.abs(x) > 1e-12)
      if (k >= 0 && v(k) < 0) v = v.map(x => -x)
      val av = matVec(v)
      val lam = (0 until d).map(i => v(i) * av(i)).sum
      found += v
      val muDot = (0 until d).map(i => means(i) * v(i)).sum
      (c, v.toSeq, lam, muDot)
    }
    import s.implicits._
    comps.toDF("comp", "cv", "eigval", "mu_dot")
      .coalesce(1).write.mode("overwrite").parquet(pcaCompDir(dir))
    val landed = s.read.parquet(pcaCompDir(dir))
    Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("vd"))
      .crossJoin(broadcast(landed))
      .select(col("vec_id"), col("comp").cast("int").as("comp"),
        // + 0.0 collapses IEEE negative zero (the covariance rationale)
        (round(dotD(col("vd"), col("cv")) - col("mu_dot"), 6) + lit(0.0))
          .as("proj"),
        round(col("eigval"), 6).as("eigval"))
  }

  /** ANN recall report — the index-quality eval every vector store
    * publishes before an approximate index replaces brute force: per
    * query and per method (sign-LSH, IVF), how many of the exact
    * brute-force top-k the approximate index recovered. Both
    * approximate results and the exact baseline are the operators
    * above; the overlap is a left-semi equi-join on (query, neighbor),
    * so the eval costs the two index probes plus a per-query count —
    * nothing pairwise. Fully composition-oracled since r8: the index
    * ops' landed artifacts (LSH planes, IVF centroids) let DuckDB
    * re-derive both approximate top-k sets and the exact baseline, so
    * the recall numbers hash-check end to end; specs additionally bound
    * recall against the same floors the index ops already carry. */
  /** Landing dir for the per-method neighbor tables — the
    * lshBucketsDir contract: computable from `dir` alone. */
  private[graft] def annTopkDir(dir: String): String =
    graft.Tables.landingDir("ann_topk", dir)

  /** Land-once memo for the three methods' top-k neighbor tables
    * (method, query_id, neighbor_id, cosine, rank) — the artifact a
    * recall/quality evaluation consumes. Without it recall_eval
    * re-derived all three ANN pipelines per call (the r17 profile:
    * ~2.1s of the op's 2.9s was re-building outputs the bench had
    * already produced as their own ops). The neighbor table is the
    * natural landed intermediate of an eval stage — at 100 TB the
    * per-method results are materialized artifacts of their own runs,
    * and the evaluator only ever joins them. */
  private val annTopkLanded = scala.collection.concurrent.TrieMap
    .empty[(Int, String, String), scala.concurrent.Future[Unit]]
  private[graft] def ensureAnnTopkLanded(
      s: SparkSession, dir: String): Unit = {
    graft.Tables.landOnce(annTopkLanded,
      (System.identityHashCode(s.sparkContext), dir,
        graft.Tables.fingerprint(s, dir, "embeddings"))) {
      bruteForceTopk(s, dir).withColumn("method", lit("bf"))
        .unionAll(lshTopk(s, dir).withColumn("method", lit("lsh")))
        .unionAll(ivfTopk(s, dir).withColumn("method", lit("ivf")))
        .write.mode("overwrite").parquet(annTopkDir(dir))
    }
  }

  def recallEval(s: SparkSession, dir: String): DataFrame = {
    ensureAnnTopkLanded(s, dir)
    val landed = s.read.parquet(annTopkDir(dir))
    val bf = landed.filter(col("method") === "bf")
      .select(col("query_id"), col("neighbor_id"))
    def evalOf(method: String): DataFrame = {
      val approx = landed.filter(col("method") === method)
      val hits = bf.join(approx.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
      bf.groupBy(col("query_id")).agg(count(lit(1)).as("k_eff"))
        .join(hits, Seq("query_id"), "left")
        .select(lit(method).as("method"), col("query_id"), col("k_eff"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"))
    }
    evalOf("lsh")
      .unionAll(evalOf("ivf"))
      .withColumn("recall",
        round(col("n_hits").cast("double") / col("k_eff").cast("double"), 6))
      .orderBy(col("method"), col("query_id"))
  }

  /** Document↔embedding coverage audit — the referential gate before any
    * ANN/semantic-dedup stage ships: every training doc should carry an
    * embedding and every embedding should point at a live doc. One
    * full-outer equi-join on the id + conditional counts (one shuffle on
    * the id key, count-combinable), emitting the one-row reconciliation
    * (totals, matched, and each orphan side) a pipeline gate asserts on. */
  def docCoverage(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"))
    val v = Tables.embeddings(s, dir).select(col("vec_id"))
    d.join(v, d("doc_id") === v("vec_id"), "full_outer")
      .agg(
        sum(when(d("doc_id").isNotNull, 1L).otherwise(0L)).as("n_docs"),
        sum(when(v("vec_id").isNotNull, 1L).otherwise(0L)).as("n_vecs"),
        sum(when(d("doc_id").isNotNull && v("vec_id").isNotNull, 1L)
          .otherwise(0L)).as("n_matched"),
        sum(when(v("vec_id").isNull, 1L).otherwise(0L)).as("n_doc_only"),
        sum(when(d("doc_id").isNull, 1L).otherwise(0L)).as("n_vec_only"))
  }

  /** Matryoshka truncation audit — the "can we ship half the dims"
    * report an embedding-storage owner reads before truncating: cosine
    * between each vector and its dim-prefix is prefix_norm/full_norm
    * (the cross terms vanish), so the audit needs NO pairwise work —
    * one projection, then per-label means. Retention is quantized to
    * DECIMAL(18,9) per row before summing, so the aggregate is exact
    * under any accumulation order; the final /count is one IEEE step.
    * Reports d/2 and d/4 retention per label. */
  def matryoshkaAudit(s: SparkSession, dir: String): DataFrame = {
    def dec9(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      round(c, 9).cast(org.apache.spark.sql.types.DecimalType(18, 9))
    val base = Tables.embeddings(s, dir)
      .select(col("label"), asDouble(col("embedding")).as("vd"))
      .withColumn("nrm", sqrt(dotD(col("vd"), col("vd"))))
      .withColumn("h2",
        slice(col("vd"), lit(1), (size(col("vd")) / lit(2)).cast("int")))
      .withColumn("h4",
        slice(col("vd"), lit(1), (size(col("vd")) / lit(4)).cast("int")))
      .withColumn("ret_half", dec9(sqrt(dotD(col("h2"), col("h2")))
        / nullif(col("nrm"), lit(0.0))))
      .withColumn("ret_quarter", dec9(sqrt(dotD(col("h4"), col("h4")))
        / nullif(col("nrm"), lit(0.0))))
    base.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("ret_half")).cast("double")
          / count(col("ret_half")).cast("double"), 6)
          .as("avg_ret_half"),
        round(sum(col("ret_quarter")).cast("double")
          / count(col("ret_quarter")).cast("double"), 6)
          .as("avg_ret_quarter"),
        min(col("ret_half")).cast("double").as("min_ret_half"))
      .orderBy(col("label"))
  }

  /** k-NN graph over the landed k-means cells — the neighborhood
    * structure SemDeDup-style curation and graph clustering start
    * from: each vector's top-5 cosine neighbors WITHIN its cluster
    * (cluster-local candidates — never all-pairs), deterministic ties
    * (rounded cosine DESC, neighbor id ASC). Rides `emb_kmeans`'s
    * landed centroid table, so DuckDB re-derives assignment, candidate
    * set and ranking from the same artifact. The per-vector rank
    * window partitions on vec_id — cluster-sized lists spread across
    * every vector, no global sort anywhere. */
  def knnGraph(s: SparkSession, dir: String): DataFrame = {
    ensureKmeansLanded(s, dir) // lands centroids + assignment (memoized)
    // cluster per vector from the LANDED assignment (one linear
    // equi-join of two n-row tables) instead of re-paying the O(n·k)
    // broadcast scan — the landed values are the same min_by the scan
    // produced, so the oracle's brute-force re-derivation still matches
    val assigned = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("vd"))
      .join(s.read.parquet(kmeansAssignDir(dir))
        .select(col("vec_id"), col("cluster")), "vec_id")
      .withColumn("nrm", sqrt(dotD(col("vd"), col("vd"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = assigned.select(col("cluster"), col("vec_id"),
      col("vd").as("vd_a"), col("nrm").as("nrm_a"))
    val b = assigned.select(col("cluster"), col("vec_id").as("nbr_id"),
      col("vd").as("vd_b"), col("nrm").as("nrm_b"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("nbr_id"))
    a.join(b, Seq("cluster")).filter(col("vec_id") =!= col("nbr_id"))
      .withColumn("cosine",
        round(cosineWithNorms(col("vd_a"), col("vd_b"),
          col("nrm_a"), col("nrm_b")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("vec_id"), col("rank"), col("nbr_id"),
        col("cluster"), col("cosine"))
  }

  /** ANN index shard plan — the layout step between training the
    * quantizer and serving it: k-means cells striped across 8 index
    * shards in size-rank order (rank r → shard (r−1) mod 8 — the
    * deterministic round-robin that keeps the biggest cells apart),
    * reported per shard with its cluster count, vector mass and
    * balance vs the even share. Assignment comes from the landed
    * kmeans_assign table (the O(n·k) scan is paid once in the landing);
    * ranking/striping ride the BOUNDED cluster table (k is fixed — an
    * aggregate, not data). */
  def indexShards(s: SparkSession, dir: String): DataFrame = {
    ensureKmeansLanded(s, dir) // lands centroids + assignment (memoized)
    // cell sizes straight off the LANDED assignment — a k-row count
    // aggregate over n landed rows; the O(n·k) scan is paid once in the
    // landing, not per consumer
    val sizes = s.read.parquet(kmeansAssignDir(dir))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vectors"))
    val w = Window.orderBy(col("n_vectors").desc, col("cluster"))
    val striped = sizes
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("shard_id", pmod(col("rank") - 1L, lit(8L)))
    val total = striped.groupBy().agg(sum(col("n_vectors")).as("n_all"))
    striped.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("n_vectors")).as("n_vectors"))
      .crossJoin(broadcast(total))
      .withColumn("balance",
        round(col("n_vectors").cast("double") * lit(8.0)
          / col("n_all").cast("double"), 6))
      .drop("n_all")
      .orderBy(col("shard_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_index_shards" -> (indexShards _),
    "emb_matryoshka_audit" -> (matryoshkaAudit _),
    "emb_knn_graph" -> (knnGraph _),
    "ann_recall_eval" -> (recallEval _),
    "emb_doc_coverage" -> (docCoverage _),
    "emb_covariance" -> (covariance _),
    "ann_bruteforce_topk" -> (bruteForceTopk _),
    "ann_lsh_topk" -> (lshTopk _),
    "ann_ivf_topk" -> (ivfTopk _),
    "ann_ivf_kmeans_topk" -> (ivfKmeansTopk _),
    "emb_normalize" -> (embNormalize _),
    "emb_kmeans" -> (kmeans _),
    "emb_pq" -> (pq _),
    "emb_kmeans_incremental" -> (kmeansIncremental _),
    "emb_pca_project" -> (pcaProject _),
    "emb_dim_stats" -> (dimStats _),
    "emb_centroid_audit" -> (centroidAudit _))

  private val oraclesBase: Map[String, String] = Map(
    // assignment re-derived from the landed centroids; rank-striped
    // shards over the bounded cluster table
    "emb_index_shards" ->
      s"""WITH c AS (SELECT cluster, cv
        |  FROM '${kmeansCentDir("__SFDIR__")}/*.parquet'),
        |e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings),
        |a AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT e.vec_id, c.cluster,
        |      (list_dot_product(vd, vd) + list_dot_product(cv, cv))
        |        - 2.0 * list_dot_product(vd, cv) AS dist
        |    FROM e, c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |    ORDER BY dist, cluster) = 1),
        |s AS (
        |  SELECT cluster, COUNT(*) AS n_vectors
        |  FROM a GROUP BY cluster),
        |r AS (
        |  SELECT *, CAST(row_number() OVER (ORDER BY n_vectors DESC,
        |    cluster) AS BIGINT) AS rank
        |  FROM s),
        |sh AS (
        |  SELECT (rank - 1) % 8 AS shard_id, COUNT(*) AS n_clusters,
        |    CAST(SUM(n_vectors) AS BIGINT) AS n_vectors
        |  FROM r GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_vectors) AS BIGINT) AS n_all FROM sh)
        |SELECT shard_id, n_clusters, n_vectors,
        |  ROUND(CAST(n_vectors AS DOUBLE) * 8.0
        |    / CAST(n_all AS DOUBLE), 6) AS balance
        |FROM sh CROSS JOIN t ORDER BY shard_id""".stripMargin,
    // prefix-norm / full-norm identity; DECIMAL(18,9) quantized terms
    // sum exactly, one IEEE division + round at the end
    "emb_matryoshka_audit" ->
      """WITH e AS (
        |  SELECT label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings),
        |r AS (
        |  SELECT label,
        |    CAST(ROUND(sqrt(list_dot_product(
        |        vd[1:CAST(len(vd) // 2 AS INT)],
        |        vd[1:CAST(len(vd) // 2 AS INT)]))
        |      / NULLIF(sqrt(list_dot_product(vd, vd)), 0.0), 9)
        |      AS DECIMAL(18,9)) AS ret_half,
        |    CAST(ROUND(sqrt(list_dot_product(
        |        vd[1:CAST(len(vd) // 4 AS INT)],
        |        vd[1:CAST(len(vd) // 4 AS INT)]))
        |      / NULLIF(sqrt(list_dot_product(vd, vd)), 0.0), 9)
        |      AS DECIMAL(18,9)) AS ret_quarter
        |  FROM e)
        |SELECT label, COUNT(*) AS n_vecs,
        |  ROUND(CAST(SUM(ret_half) AS DOUBLE)
        |    / CAST(COUNT(ret_half) AS DOUBLE), 6) AS avg_ret_half,
        |  ROUND(CAST(SUM(ret_quarter) AS DOUBLE)
        |    / CAST(COUNT(ret_quarter) AS DOUBLE), 6) AS avg_ret_quarter,
        |  CAST(MIN(ret_half) AS DOUBLE) AS min_ret_half
        |FROM r GROUP BY label ORDER BY label""".stripMargin,
    // assignment, candidates and ranking re-derived from the landed
    // centroid table; ties broken on (rounded cosine DESC, nbr id)
    "emb_knn_graph" ->
      s"""WITH c AS (SELECT cluster, cv
        |  FROM '${kmeansCentDir("__SFDIR__")}/*.parquet'),
        |e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings),
        |a AS (
        |  SELECT vec_id, cluster, vd FROM (
        |    SELECT e.vec_id, c.cluster, e.vd,
        |      (list_dot_product(vd, vd) + list_dot_product(cv, cv))
        |        - 2.0 * list_dot_product(vd, cv) AS dist
        |    FROM e, c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |    ORDER BY dist, cluster) = 1),
        |p AS (
        |  SELECT x.vec_id, y.vec_id AS nbr_id, x.cluster,
        |    ROUND(list_dot_product(x.vd, y.vd)
        |      / NULLIF(sqrt(list_dot_product(x.vd, x.vd))
        |          * sqrt(list_dot_product(y.vd, y.vd)), 0.0), 6)
        |      AS cosine
        |  FROM a x JOIN a y ON x.cluster = y.cluster
        |    AND x.vec_id <> y.vec_id),
        |k AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY vec_id
        |    ORDER BY cosine DESC, nbr_id) AS BIGINT) AS rank
        |  FROM p)
        |SELECT vec_id, rank, nbr_id, cluster, cosine
        |FROM k WHERE rank <= 5""".stripMargin,
    "emb_doc_coverage" ->
      """SELECT
        |  CAST(SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN v.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_vecs,
        |  CAST(SUM(CASE WHEN d.doc_id IS NOT NULL
        |    AND v.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_matched,
        |  CAST(SUM(CASE WHEN v.vec_id IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_doc_only,
        |  CAST(SUM(CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_vec_only
        |FROM documents d FULL JOIN embeddings v ON d.doc_id = v.vec_id""".stripMargin,
    // pair products generated expression-side exactly as the op does
    // (range is end-exclusive = Spark's 0-based transform index; emb is
    // 1-indexed in DuckDB), 9dp-round → exact decimal sums, cov/corr
    // arithmetic term-for-term identical
    "emb_covariance" ->
      """WITH e AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |p AS (
        |  SELECT unnest(flatten(list_transform(range(0, len(emb)),
        |    i -> list_transform(range(i, len(emb)),
        |      j -> {'i': i, 'j': j,
        |        'xy': CAST(ROUND(emb[i + 1] * emb[j + 1], 9)
        |          AS DECIMAL(28,9))})))) AS s
        |  FROM e),
        |mom AS (
        |  SELECT s.i AS i, s.j AS j, COUNT(*) AS n_vecs,
        |    CAST(SUM(s.xy) AS DOUBLE) AS sum_xy
        |  FROM p GROUP BY s.i, s.j),
        |m1 AS (
        |  SELECT u.d AS d,
        |    CAST(SUM(CAST(ROUND(u.x, 9) AS DECIMAL(18,9))) AS DOUBLE)
        |      AS sum_x
        |  FROM (SELECT unnest(list_transform(range(0, len(emb)),
        |      i -> {'d': i, 'x': emb[i + 1]})) AS u FROM e)
        |  GROUP BY u.d),
        |diag AS (SELECT i AS d, sum_xy AS sum_xx FROM mom WHERE i = j),
        |joined AS (
        |  SELECT mom.i, mom.j, mom.n_vecs, mom.sum_xy,
        |    mi.sum_x AS sx_i, mj.sum_x AS sx_j,
        |    di.sum_xx AS sxx_i, dj.sum_xx AS sxx_j,
        |    CAST(mom.n_vecs AS DOUBLE) AS n
        |  FROM mom
        |  JOIN m1 mi ON mi.d = mom.i JOIN m1 mj ON mj.d = mom.j
        |  JOIN diag di ON di.d = mom.i JOIN diag dj ON dj.d = mom.j)
        |SELECT CAST(i AS INT) AS dim_i, CAST(j AS INT) AS dim_j,
        |  n_vecs, sum_xy,
        |  ROUND(sum_xy / n - (sx_i / n) * (sx_j / n), 6) + 0.0 AS cov,
        |  ROUND((sum_xy / n - (sx_i / n) * (sx_j / n))
        |    / NULLIF(sqrt(sxx_i / n - (sx_i / n) * (sx_i / n))
        |      * sqrt(sxx_j / n - (sx_j / n) * (sx_j / n)), 0), 6) + 0.0
        |    AS corr
        |FROM joined ORDER BY dim_i, dim_j""".stripMargin,
    // brute-force reassignment against the centroid table kmeans()
    // landed: every vector must map to the same nearest centroid with
    // the same (term-order-identical) squared distance. The __SFDIR__
    // token resolves to the verified sf dir's slug at dump time
    // (SparkEntry.oracleSqlFor), so any sf checks its own landed run.
    "emb_kmeans" ->
      s"""WITH c AS (SELECT cluster, cv
        |  FROM '${kmeansCentDir("__SFDIR__")}/*.parquet'),
        |e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings),
        |d AS (SELECT e.vec_id, c.cluster,
        |    (list_dot_product(vd, vd) + list_dot_product(cv, cv))
        |      - 2.0 * list_dot_product(vd, cv) AS dist
        |  FROM e, c)
        |SELECT vec_id, cluster, ROUND(dist, 6) AS dist FROM d
        |QUALIFY row_number() OVER (PARTITION BY vec_id
        |  ORDER BY dist, cluster) = 1""".stripMargin,
    // batch = the md5-nibble slice; assignment re-derived brute-force
    // from the landed centroids (the emb_kmeans oracle's shape), corpus
    // means from the landed assignment, exact-decimal mean arithmetic
    "emb_kmeans_incremental" ->
      s"""WITH c AS (SELECT cluster, cv
        |  FROM '${kmeansCentDir("__SFDIR__")}/*.parquet'),
        |a AS (SELECT cluster, dist
        |  FROM '${kmeansAssignDir("__SFDIR__")}/*.parquet'),
        |corpus AS (SELECT cluster, COUNT(*) AS n_corpus,
        |    CAST(SUM(CAST(ROUND(dist, 9) AS DECIMAL(18,9))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS mean_corpus
        |  FROM a GROUP BY cluster),
        |b AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings
        |  WHERE CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 32, 1)
        |    AS BIGINT) = 7),
        |d AS (SELECT b.vec_id, c.cluster,
        |    (list_dot_product(vd, vd) + list_dot_product(cv, cv))
        |      - 2.0 * list_dot_product(vd, cv) AS dist
        |  FROM b, c),
        |asg AS (SELECT vec_id, cluster, dist FROM d
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |    ORDER BY dist, cluster) = 1),
        |bat AS (SELECT cluster, COUNT(*) AS n_batch,
        |    CAST(SUM(CAST(ROUND(dist, 9) AS DECIMAL(18,9))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS mean_batch
        |  FROM asg GROUP BY cluster)
        |SELECT COALESCE(corpus.cluster, bat.cluster) AS cluster,
        |  COALESCE(n_corpus, 0) AS n_corpus,
        |  COALESCE(n_batch, 0) AS n_batch,
        |  ROUND(mean_corpus, 6) AS mean_dist_corpus,
        |  ROUND(mean_batch, 6) AS mean_dist_batch,
        |  ROUND(mean_batch / NULLIF(mean_corpus, 0), 6) AS drift_ratio,
        |  COALESCE(mean_batch / NULLIF(mean_corpus, 0) > 1.2, FALSE)
        |    AS retrain
        |FROM corpus FULL JOIN bat ON corpus.cluster = bat.cluster"""
        .stripMargin,
    // components from the landed parquet; proj = dot(v,c) − mu_dot with
    // identical float steps in both engines; +0.0 collapses -0.0
    "emb_pca_project" ->
      s"""WITH c AS (SELECT comp, cv, eigval, mu_dot
        |  FROM '${pcaCompDir("__SFDIR__")}/*.parquet'),
        |e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings)
        |SELECT vec_id, CAST(comp AS INT) AS comp,
        |  ROUND(list_dot_product(vd, cv) - mu_dot, 6) + 0.0 AS proj,
        |  ROUND(eigval, 6) AS eigval
        |FROM e CROSS JOIN c""".stripMargin,
    // the kmeans oracle's shape per subspace: codebook from the landed
    // parquet, distance term-for-term identical, ties to lower cluster
    "emb_pq" ->
      s"""WITH c AS (SELECT sub, cluster, cv
        |  FROM '${pqCodebookDir("__SFDIR__")}/*.parquet'),
        |e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings),
        |sp AS (SELECT unnest(range(0, 4)) AS sub),
        |sv AS (SELECT vec_id, sub,
        |    vd[sub * 16 + 1 : sub * 16 + 16] AS sv
        |  FROM e CROSS JOIN sp),
        |d AS (SELECT s.vec_id, s.sub, c.cluster,
        |    (list_dot_product(sv, sv) + list_dot_product(cv, cv))
        |      - 2.0 * list_dot_product(sv, cv) AS dist
        |  FROM sv s JOIN c ON c.sub = s.sub)
        |SELECT vec_id, CAST(sub AS INT) AS subspace, cluster AS code,
        |  ROUND(dist, 6) AS recon_se
        |FROM d
        |QUALIFY row_number() OVER (PARTITION BY vec_id, sub
        |  ORDER BY dist, cluster) = 1""".stripMargin,
    "emb_dim_stats" ->
      """WITH idx AS (
        |  SELECT vec_id, embedding,
        |    unnest(generate_series(1, len(embedding))) AS i
        |  FROM embeddings),
        |flat AS (SELECT i, CAST(embedding[i] AS DOUBLE) AS x FROM idx)
        |SELECT CAST(i - 1 AS INT) AS dim, COUNT(*) AS n_vecs,
        |  CAST(SUM(CAST(ROUND(x, 9) AS DECIMAL(18,9))) AS DOUBLE) AS sum_x,
        |  CAST(SUM(CAST(ROUND(abs(x), 9) AS DECIMAL(18,9))) AS DOUBLE)
        |    AS sum_abs_x,
        |  ROUND(MIN(x), 6) AS min_x, ROUND(MAX(x), 6) AS max_x
        |FROM flat GROUP BY i ORDER BY dim""".stripMargin,
    "emb_centroid_audit" ->
      """WITH idx AS (
        |  SELECT label, vec_id, embedding,
        |    unnest(generate_series(1, len(embedding))) AS i
        |  FROM embeddings),
        |flat AS (
        |  SELECT label, vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM idx),
        |cent AS (
        |  SELECT label, i,
        |    CAST(SUM(CAST(ROUND(x, 9) AS DECIMAL(18,9))) AS DOUBLE)
        |      / COUNT(*) AS c
        |  FROM flat GROUP BY label, i),
        |carr AS (
        |  SELECT label, array_agg(c ORDER BY i) AS cv
        |  FROM cent GROUP BY label),
        |ed AS (
        |  SELECT label, vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings)
        |SELECT e.label, e.vec_id,
        |  ROUND(list_dot_product(e.emb, c.cv)
        |    / NULLIF(sqrt(list_dot_product(e.emb, e.emb))
        |        * sqrt(list_dot_product(c.cv, c.cv)), 0.0), 6)
        |    AS cos_centroid
        |FROM ed e JOIN carr c USING (label)""".stripMargin,
    "emb_normalize" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, vd, sqrt(list_dot_product(vd, vd)) AS nrm,
        |    len(vd) AS dims
        |  FROM e),
        |err AS (
        |  SELECT vec_id, nrm, dims,
        |    list_sum(list_transform(vd, x ->
        |      CAST(ROUND(abs(x / NULLIF(nrm, 0.0)
        |        - ROUND(x / NULLIF(nrm, 0.0) * 127.0) / 127.0)
        |        * 1000000000.0) AS BIGINT))) AS err_nanos
        |  FROM n)
        |SELECT vec_id, ROUND(nrm, 6) AS norm,
        |  CAST(err_nanos AS DOUBLE) / 1000000000.0 AS sum_q_err,
        |  CAST(dims AS BIGINT) AS n_dims
        |FROM err""".stripMargin,
    // candidate generation re-derived from the landed bucket table
    // (collide in ANY of the L tables), scoring + ranking brute-force;
    // only the seeded hyperplane hash stays Spark-side
    "ann_lsh_topk" ->
      s"""WITH b AS (SELECT vec_id, table_id, bucket
        |  FROM '${lshBucketsDir("__SFDIR__")}/*.parquet'),
        |e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings),
        |c AS (SELECT b.table_id, b.bucket, b.vec_id AS neighbor_id, e.vd
        |  FROM b JOIN e USING (vec_id)),
        |q AS (SELECT b.table_id, b.bucket, b.vec_id AS query_id,
        |    e.vd AS q_vd
        |  FROM b JOIN e USING (vec_id) WHERE b.vec_id < 5),
        |scored AS (
        |  SELECT DISTINCT query_id, neighbor_id,
        |    ROUND(list_dot_product(q_vd, vd)
        |      / NULLIF(sqrt(list_dot_product(q_vd, q_vd))
        |         * sqrt(list_dot_product(vd, vd)), 0.0), 6) AS cosine
        |  FROM q JOIN c USING (table_id, bucket)
        |  WHERE neighbor_id <> query_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 10""".stripMargin,
    // assignment (nearest cell, ties to lower cell id), nprobe=6 probes
    // and ranking re-derived from the landed sampled-centroid table
    "ann_ivf_topk" ->
      s"""WITH c AS (SELECT cell_id, c_vd
        |  FROM '${ivfCentDir("__SFDIR__")}/*.parquet'),
        |cn AS (SELECT cell_id, c_vd,
        |    sqrt(list_dot_product(c_vd, c_vd)) AS c_nrm FROM c),
        |en AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd,
        |    sqrt(list_dot_product(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE)), list_transform(embedding,
        |      x -> CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |a AS (
        |  SELECT vec_id AS neighbor_id, vd, nrm, cell_id FROM (
        |    SELECT en.vec_id, en.vd, en.nrm, cn.cell_id,
        |      list_dot_product(vd, c_vd) / NULLIF(nrm * c_nrm, 0.0) AS sim
        |    FROM en CROSS JOIN cn)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |    ORDER BY sim DESC, cell_id) = 1),
        |p AS (
        |  SELECT query_id, cell_id FROM (
        |    SELECT en.vec_id AS query_id, cn.cell_id,
        |      list_dot_product(vd, c_vd) / NULLIF(nrm * c_nrm, 0.0) AS sim
        |    FROM en CROSS JOIN cn WHERE en.vec_id < 5)
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, cell_id) <= 6),
        |scored AS (
        |  SELECT p.query_id, a.neighbor_id,
        |    ROUND(list_dot_product(q.vd, a.vd)
        |      / NULLIF(q.nrm * a.nrm, 0.0), 6) AS cosine
        |  FROM p JOIN a USING (cell_id) JOIN en q ON q.vec_id = p.query_id
        |  WHERE a.neighbor_id <> p.query_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 10""".stripMargin,
    // same probe plan against the TRAINED quantizer kmeans() landed;
    // nprobe=3
    "ann_ivf_kmeans_topk" ->
      s"""WITH c AS (SELECT cluster AS cell_id, cv AS c_vd
        |  FROM '${kmeansCentDir("__SFDIR__")}/*.parquet'),
        |cn AS (SELECT cell_id, c_vd,
        |    sqrt(list_dot_product(c_vd, c_vd)) AS c_nrm FROM c),
        |en AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd,
        |    sqrt(list_dot_product(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE)), list_transform(embedding,
        |      x -> CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |a AS (
        |  SELECT vec_id AS neighbor_id, vd, nrm, cell_id FROM (
        |    SELECT en.vec_id, en.vd, en.nrm, cn.cell_id,
        |      list_dot_product(vd, c_vd) / NULLIF(nrm * c_nrm, 0.0) AS sim
        |    FROM en CROSS JOIN cn)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |    ORDER BY sim DESC, cell_id) = 1),
        |p AS (
        |  SELECT query_id, cell_id FROM (
        |    SELECT en.vec_id AS query_id, cn.cell_id,
        |      list_dot_product(vd, c_vd) / NULLIF(nrm * c_nrm, 0.0) AS sim
        |    FROM en CROSS JOIN cn WHERE en.vec_id < 5)
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, cell_id) <= 3),
        |scored AS (
        |  SELECT p.query_id, a.neighbor_id,
        |    ROUND(list_dot_product(q.vd, a.vd)
        |      / NULLIF(q.nrm * a.nrm, 0.0), 6) AS cosine
        |  FROM p JOIN a USING (cell_id) JOIN en q ON q.vec_id = p.query_id
        |  WHERE a.neighbor_id <> p.query_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 10""".stripMargin,
    "ann_bruteforce_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q_emb
        |  FROM embeddings WHERE vec_id < 5),
        |c AS (
        |  SELECT vec_id AS neighbor_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    ROUND(list_dot_product(q_emb, emb)
        |      / (sqrt(list_dot_product(q_emb, q_emb))
        |         * sqrt(list_dot_product(emb, emb))), 6) AS cosine
        |  FROM q, c WHERE neighbor_id <> query_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 10""".stripMargin)

  /** `ann_recall_eval` oracled by COMPOSITION: the brute-force, LSH and
    * IVF oracle queries above (all re-derived from landed artifacts)
    * run as subqueries, and DuckDB recomputes the per-method overlap
    * counts and recall — the whole index-quality report is now
    * hash-checked, not just spec-floored. */
  val oracles: Map[String, String] = oraclesBase + ("ann_recall_eval" ->
    s"""WITH bf AS (SELECT query_id, neighbor_id
      |  FROM (${oraclesBase("ann_bruteforce_topk")})),
      |lshq AS (SELECT query_id, neighbor_id
      |  FROM (${oraclesBase("ann_lsh_topk")})),
      |ivfq AS (SELECT query_id, neighbor_id
      |  FROM (${oraclesBase("ann_ivf_topk")})),
      |k AS (SELECT query_id, COUNT(*) AS k_eff FROM bf GROUP BY query_id),
      |hl AS (SELECT bf.query_id AS query_id, COUNT(*) AS n_hits
      |  FROM bf JOIN lshq ON bf.query_id = lshq.query_id
      |    AND bf.neighbor_id = lshq.neighbor_id
      |  GROUP BY bf.query_id),
      |hi AS (SELECT bf.query_id AS query_id, COUNT(*) AS n_hits
      |  FROM bf JOIN ivfq ON bf.query_id = ivfq.query_id
      |    AND bf.neighbor_id = ivfq.neighbor_id
      |  GROUP BY bf.query_id),
      |r AS (
      |  SELECT 'lsh' AS method, k.query_id, k.k_eff,
      |    COALESCE(hl.n_hits, 0) AS n_hits
      |  FROM k LEFT JOIN hl ON hl.query_id = k.query_id
      |  UNION ALL
      |  SELECT 'ivf' AS method, k.query_id, k.k_eff,
      |    COALESCE(hi.n_hits, 0) AS n_hits
      |  FROM k LEFT JOIN hi ON hi.query_id = k.query_id)
      |SELECT method, query_id, k_eff, n_hits,
      |  ROUND(CAST(n_hits AS DOUBLE) / CAST(k_eff AS DOUBLE), 6) AS recall
      |FROM r ORDER BY method, query_id""".stripMargin)
}
