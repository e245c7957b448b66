package graft

import org.apache.spark.sql.functions._

/** Scale-behavior stress checks: synthetic worst cases the SF data
  * doesn't produce naturally. */
class StressSpec extends SparkSpec {
  import spark.implicits._

  test("minhash LSH survives a duplicate storm and finds all copy pairs") {
    // replicate every document 3x with shifted ids — the candidate
    // generator must handle exploding bucket collisions and still emit
    // each exact-copy pair exactly once
    val docs = Tables.documents(spark, sfTiny).select("doc_id", "text")
    val copies = (0 until 3).map(i =>
      docs.select((col("doc_id") + lit(i * 1000000)).as("doc_id"),
        col("text"))).reduce(_ unionAll _)

    // run the same pipeline as Dedup.minhashLsh against the storm table
    import graft.functions.TextFns._
    import graft.functions.{ShingleHash64, SketchExprs}
    val base = copies
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"),
        ShingleHash64.shingleHash64(col("toks"), 3).as("hs"))
      .filter(size(col("hs")) > 0)
      .withColumn("sig", SketchExprs.minhashSig(col("hs"), 32))
      .select(col("doc_id"), col("hs"),
        bandHashes(col("sig"), 8, 4).as("bands"))
    val banded = base.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band_id", "band_hash")))
    val a = banded.select(col("band_id"), col("band_hash"),
      col("doc_id").as("doc_a"))
    val b = banded.select(col("band_id"), col("band_hash"),
      col("doc_id").as("doc_b"))
    val unsalted = a.join(b, Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the production (salted) candidate generator must emit EXACTLY the
    // plain self-join's pair set — salting redistributes, never drops
    val pairs = operators.Dedup.saltedBandPairs(banded, target = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == unsalted, "salted candidates must equal plain self-join")

    val nDocs = docs.count()
    // every doc's 3 copies form 3 pairs; all must be candidates
    val copyPairs = (0L until nDocs).flatMap { d =>
      val ids = Seq(d, d + 1000000, d + 2000000)
      for (x <- ids; y <- ids if x < y) yield (x, y)
    }.toSet
    val missed = copyPairs -- pairs
    assert(missed.isEmpty, s"missed copy pairs: ${missed.take(5)}")
  }

  test("band salting caps join-group width on a single-bucket storm " +
      "without losing a pair") {
    // 400 byte-identical docs: identical signatures → ONE band bucket of
    // width 400 in every band — the exact quadratic single-task blowup
    val target = 64
    val n = 400
    val storm = (0 until n)
      .map(i => (i.toLong, 7L)).toDF("doc_id", "band_hash")
      .select(col("doc_id"), lit(0).as("band_id"), col("band_hash"))
    val pairs = operators.Dedup.saltedBandPairs(storm, target)
    assert(pairs.count() == n.toLong * (n - 1) / 2,
      "every unordered pair must survive salting exactly once")
    // the A side of the salted join never concentrates a bucket on one
    // group: each (band, hash, salt) holds ~w/g ≤ target rows (hash
    // split, so allow 2x slack)
    val g = math.ceil(n.toDouble / target).toInt
    val maxGroup = storm
      .select(pmod(xxhash64(col("doc_id")), lit(g.toLong)).as("salt"))
      .groupBy(col("salt")).count()
      .agg(max(col("count"))).first().getLong(0)
    assert(maxGroup <= 2L * target,
      s"salted group width $maxGroup exceeds 2x target $target")
    assert(g >= 6, "the storm bucket must actually have split")
  }

  test("ngram-jaccard's 1-band candidate generation survives a duplicate " +
      "storm: salted pairs equal the plain bucket self-join") {
    // the min-shingle bucket key is a STRING (md5) — proves saltedBandPairs
    // is key-type generic, and that the 1-band path loses no pair under a
    // 5x copy storm (one bucket of width 5 per distinct doc)
    import graft.functions.TextFns._
    val docs = Tables.documents(spark, sfTiny).select("doc_id", "text")
    val storm = (0 until 5).map(i =>
      docs.select((col("doc_id") + lit(i * 1000000)).as("doc_id"),
        col("text"))).reduce(_ unionAll _)
    val base = storm
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), wordShingles(col("toks"), 3).as("shingles"))
      .withColumn("bucket",
        array_min(transform(col("shingles"), x => md5(x))))
    val banded = base.select(col("doc_id"), lit(0).as("band_id"),
      col("bucket").as("band_hash"))
    val plain = base.select(col("bucket"), col("doc_id").as("doc_a"))
      .join(base.select(col("bucket"), col("doc_id").as("doc_b")), "bucket")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = operators.Dedup.saltedBandPairs(banded, target = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == plain,
      "salted 1-band candidates must equal the plain bucket self-join")
    assert(salted.nonEmpty)
  }

  test("simhash survives a near-dup storm: salted chunk pairs equal the " +
      "plain pigeonhole self-join and keep every exact-copy pair") {
    // 3x exact copies → identical 64-bit fingerprints → every 16-bit
    // chunk bucket becomes a width-3k storm; the salted pigeonhole must
    // emit exactly the plain self-join's Hamming ≤ 3 pair set
    val docs = Tables.documents(spark, sfTiny).select("doc_id", "text")
    val copies = (0 until 3).map(i =>
      docs.select((col("doc_id") + lit(i * 1000000)).as("doc_id"),
        col("text"))).reduce(_ unionAll _)
    import graft.functions.TextFns._
    import graft.functions.{ShingleHash64, SketchExprs}
    val base = copies
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"),
        ShingleHash64.shingleHash64(col("toks"), 3).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), SketchExprs.simhash64(col("hs")).as("fp"))
    val chunked = base.select(col("doc_id"), col("fp"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("fp"), i * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band_id", "band_hash")))
    // reference: the UNSALTED pigeonhole join (the pre-r11 plan)
    val a = chunked.select(col("band_id"), col("band_hash"),
      col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val b = chunked.select(col("band_id"), col("band_hash"),
      col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    val plain = a.join(b, Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .distinct().filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // production: the salted candidate generator + fp re-attach
    val salted = operators.Dedup
      .saltedBandPairs(chunked.select(col("doc_id"), col("band_id"),
        col("band_hash")), target = 64)
      .join(base.select(col("doc_id").as("doc_a"), col("fp").as("fp_a")),
        "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("fp").as("fp_b")),
        "doc_b")
      .filter(bit_count(col("fp_a").bitwiseXOR(col("fp_b"))) <= 3)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == plain,
      "salted simhash pairs must equal the plain pigeonhole self-join")
    // every doc's 3 identical copies (hamming 0) must all pair up
    val nDocs = docs.count()
    val copyPairs = (0L until nDocs).flatMap { d =>
      val ids = Seq(d, d + 1000000, d + 2000000)
      for (x <- ids; y <- ids if x < y) yield (x, y)
    }.toSet
    val missed = copyPairs -- salted
    assert(missed.isEmpty, s"missed exact-copy pairs: ${missed.take(5)}")
  }

  test("salted candidate machinery at adversarial widths: buckets at the " +
      "salt boundary (63/64/65/128/129) lose and invent no pair") {
    // the salt group count flips at exact multiples of target — the
    // off-by-one surface items 2 and 3 of the r10 verdict lean on
    val target = 64
    for (w <- Seq(1, 2, 63, 64, 65, 128, 129)) {
      val bucket = (0 until w)
        .map(i => (i.toLong, 0, "storm")).toDF("doc_id", "band_id",
          "band_hash")
      val pairs = operators.Dedup.saltedBandPairs(bucket, target)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for (x <- 0 until w; y <- 0 until w if x < y)
        yield (x.toLong, y.toLong)).toSet
      assert(pairs == expected,
        s"w=$w: salted self-pairs diverge from the exact a<b set " +
          s"(missing ${(expected -- pairs).size}, " +
          s"extra ${(pairs -- expected).size})")
    }
    // the two-sided incremental probe at the same widths: corpus bucket
    // of width w probed by a 5-doc batch sharing the band — every
    // (batch, corpus) combination exactly once; a batch band ABSENT
    // from the index yields nothing
    for (w <- Seq(1, 63, 64, 65, 128, 129)) {
      val corpus = (0 until w)
        .map(i => (i.toLong, 0, "storm")).toDF("doc_id", "band_id",
          "band_hash")
      val batch = ((0 until 5).map(i => (1000L + i, 0, "storm")) :+
        ((2000L, 0, "absent_band")))
        .toDF("doc_id", "band_id", "band_hash")
      val probed = operators.Dedup.saltedProbePairs(corpus, batch, target)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for (bd <- 0 until 5; c <- 0 until w)
        yield (1000L + bd, c.toLong)).toSet
      assert(probed == expected,
        s"w=$w: probe pairs diverge (missing ${(expected -- probed).size}, " +
          s"extra ${(probed -- expected).size})")
    }
  }

  test("embedding-cosine pair budget: bundled scales pass, a doubling " +
      "past 30x trips the guard") {
    import operators.Dedup.{checkCosinePairBudget, cosinePairBudget}
    // measured enumeration shape: 10 uniform labels → Σ w(w−1)/2 ≈ n²/20
    def enumFor(n: Long): Long = n * n / 20L
    // the committed scale points must stay runnable
    for (n <- Seq(2000L, 20000L, 60000L))
      checkCosinePairBudget(n, enumFor(n))
    // ~sf10 (200k vectors): the exact baseline's own enumeration is
    // 2e9 pairs — past the linear budget, the guard must fail LOUDLY
    val n10 = 200000L
    assert(enumFor(n10) > cosinePairBudget(n10))
    val e = intercept[IllegalArgumentException] {
      checkCosinePairBudget(n10, enumFor(n10))
    }
    assert(e.getMessage.contains("dedup_semantic"),
      "guard message must point at the production paths")
    // and the real op still constructs (guard passes) on bundled data
    assert(operators.Dedup.embeddingCosine(spark, sfTiny).columns
      .contains("cosine"))
  }

  test("quantizer training input is bounded: 64 vectors/centroid, " +
      "constant past the k cap") {
    import operators.Similarity.{quantizerKFor, trainSampleCap,
      maxQuantizerK}
    // below the floor the whole (tiny) corpus trains — no churn there
    assert(trainSampleCap(quantizerKFor(500L)) == 4096L)
    // in the derived-k regime the sample is 64·k = n/4: each Lloyd
    // sweep costs s·k = n²/1024 — 4× under the full-corpus n²/256 —
    // and all five sweeps together ≈ 1.25× the ONE full assignment
    assert(trainSampleCap(quantizerKFor(60000L)) == 64L * (60000L / 256L))
    // the derived-k rule continues past the broadcast cap (the r15
    // landed-state regime — 64·k keeps the n/4 sample)
    assert(trainSampleCap(quantizerKFor(2000000L)) == 64L * 7812L)
    // past the FLAT cap (262144) the training input pins at a CONSTANT
    // 16.7M vectors at ANY corpus size: training cost stops growing,
    // assignment is linear in n (the width guard trips first — reaching
    // here requires the deliberate second quantizer level)
    for (n <- Seq(1000000000L, 100000000000L))
      assert(trainSampleCap(quantizerKFor(n)) == 64L * maxQuantizerK)
  }

  test("blockAssign equals the broadcast argmin kernel at adversarial " +
      "block widths, and scales linearly in n at fixed k") {
    import operators.Similarity.{ensureKmeansLanded, blockAssign,
      kmeansCentDir, kmeansAssignDir}
    ensureKmeansLanded(spark, sfTiny)
    val cents = spark.read.parquet(kmeansCentDir(sfTiny))
    val vecs = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vd"))
    val landed = spark.read.parquet(kmeansAssignDir(sfTiny))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // parity: forcing many blocks (blockSize 3 over k=8 → 3 hash
    // blocks, cross-block min-reduce on every vector) must reproduce
    // the landed broadcast-kernel assignment BIT-identically, ties
    // included
    for (bs <- Seq(1, 3, 8192)) {
      val got = blockAssign(spark, vecs, cents, blockSize = bs)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      assert(got == landed, s"blockSize=$bs diverged from the kernel")
    }
    // fixed-k wall-time linearity: 8× the vectors through the block
    // path stays well under 8× the wall time + spark constants
    import spark.implicits._
    def rep(m: Int) = vecs.as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        (0 until m).map(i => (id + i * 10000000L, v)) }
      .toDF("vec_id", "vd").localCheckpoint()
    val small = rep(1)
    val big = rep(8)
    def time(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime
      blockAssign(spark, df, cents, blockSize = 3)
        .foreach((_: org.apache.spark.sql.Row) => ())
      (System.nanoTime - t0) / 1e9
    }
    time(small) // warm the path once (codegen + shuffle setup)
    // take the min of repeated timings on BOTH sides to damp GC /
    // scheduler noise — a single loaded-machine outlier on the 8x run
    // must not fail a structurally linear path — and keep wide
    // absolute slack: this asserts "not quadratic", not a benchmark
    val t1 = Seq.fill(2)(time(small)).min
    val t8 = Seq.fill(2)(time(big)).min
    val bound = 8.0 * math.max(t1, 0.5) + 6.0
    assert(t8 <= bound,
      s"8x vectors took ${t8}s vs ${t1}s — past the linear bound $bound")
  }

  test("landed kmeans assignment equals brute-force argmin against the " +
      "landed centroids") {
    operators.Similarity.ensureKmeansLanded(spark, sfTiny)
    val cents = spark.read
      .parquet(operators.Similarity.kmeansCentDir(sfTiny))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val assign = spark.read
      .parquet(operators.Similarity.kmeansAssignDir(sfTiny))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
    assert(assign.size == vecs.length)
    // mirror the plan's exact arithmetic ((‖x‖²+‖c‖²)−2·x·c, sequential
    // left-to-right folds) so FP rounding cannot flip a near-tie
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    vecs.foreach { case (id, v) =>
      val nx2 = dot(v, v)
      val best = cents.map { case (c, cv) =>
        ((nx2 + dot(cv, cv)) - 2.0 * dot(v, cv), c)
      }.min // ties to the lower cluster id via the (dist, cluster) order
      assert(assign(id) == best._2,
        s"vec $id assigned ${assign(id)}, brute-force says ${best._2}")
    }
  }

  test("hash-min CC converges on a worst-case 60-long chain") {
    import spark.implicits._
    // a path graph maximizes diameter: label 1 must walk 59 hops
    // (under the r19 edge cap this takes the driver union-find regime)
    val chain = (1L to 59L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = operators.Dedup.clusterOfPairs(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 60)
    assert(labels.values.forall(_ == 1L),
      s"chain must collapse to one component: ${labels.toSeq.sortBy(_._1).take(5)}")
  }

  test("CC regimes agree: driver union-find == distributed hash-min " +
      "on a multi-component random graph") {
    import spark.implicits._
    // deterministic pseudo-random graph with several components, rings
    // and tails — both regimes must emit the SAME (node -> min label)
    val rnd = new scala.util.Random(42)
    val edges = (
      (1L to 59L).map(i => (i, i + 1)) ++                // chain 1..60
      (100L to 119L).map(i => (i, 100L + (i - 99L) % 20L)) ++ // ring
      Seq((200L, 201L), (202L, 203L), (201L, 203L)) ++   // merged pair
      (0 until 80).map { _ =>
        val a = 300L + rnd.nextInt(40)
        val b = 300L + rnd.nextInt(40)
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2)
    ).toDF("doc_a", "doc_b")
    val viaDriver = operators.Dedup.clusterOfPairs(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaFixpoint = operators.Dedup.clusterOfPairsDistributed(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaFixpoint,
      s"regimes disagree: ${viaDriver.toSeq.sorted.take(5)} vs " +
        s"${viaFixpoint.toSeq.sorted.take(5)}")
  }

  test("near-linear scaling: 10x corpus stays within 2x-per-10x wall time") {
    // local evidence for the "survives 100x" claim: any accidental
    // all-pairs regression in these ops would blow the 10x run up
    // quadratically (100x work), far past the generous 20x allowance
    val tmp = java.nio.file.Files.createTempDirectory("graft_scale")
    def gen(mult: Int): String = {
      val dir = s"$tmp/x$mult"
      // replicas get a marker token spliced between words, so replicas
      // of the same doc share no 3-gram shingles across replicas (the
      // 10x corpus keeps the 1x dup-rate rather than becoming one
      // giant dup storm, which would be legitimately quadratic output)
      val docs = (0 until mult).map(i =>
        Tables.documents(spark, sfTiny).select(
          (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          regexp_replace(col("text"), " ", s" r$i ").as("text"),
          col("lang"), col("source"), col("n_chars"))).reduce(_ unionAll _)
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // embedding replicas are perturbed per dimension so copies don't
      // stack into a single cosine-identical LSH bucket
      val embs = (0 until mult).map(i =>
        Tables.embeddings(spark, sfTiny).select(
          (col("vec_id") + lit(i * 1000000L)).as("vec_id"),
          transform(col("embedding"), (x, j) =>
            (x + lit(0.002f) * lit(i.toFloat) *
              (pmod(j, lit(7)).cast("float") - lit(3.0f))).cast("float"))
            .as("embedding"),
          col("label"))).reduce(_ unionAll _)
      embs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }
    val dir1 = gen(1)
    val dir10 = gen(10)
    val ops: Seq[(String, String => org.apache.spark.sql.DataFrame)] = Seq(
      "dedup_minhash_lsh" -> (d => {
        operators.DocArtifacts.clearMemo()
        operators.Dedup.clearMhLshMemo()
        operators.Dedup.minhashLsh(spark, d) }),
      "dedup_cluster" -> (d => operators.Dedup.cluster(spark, d)),
      "smp_shuffle" -> (d => operators.Sampling.shuffleOrder(spark, d)),
      "ann_lsh_topk" -> (d => operators.Similarity.lshTopk(spark, d)),
      "emb_kmeans" -> (d => operators.Similarity.kmeans(spark, d)),
      "txt_ccnet_bucket" -> (d => operators.Text.ccnetBucket(spark, d)),
      "smp_interleave" -> (d => operators.Sampling.interleave(spark, d)),
      "dedup_containment" -> (d => operators.Dedup.containment(spark, d)),
      // doc-artifact consumers clear the shared landing memo so each
      // timed run pays the FULL tokenize→land→consume pipeline
      "txt_novelty" -> (d => {
        operators.DocArtifacts.clearMemo()
        operators.Text.novelty(spark, d) }),
      "txt_boilerplate_ngrams" -> (d => {
        operators.DocArtifacts.clearMemo()
        operators.Text.boilerplateNgrams(spark, d) }),
      "txt_boilerplate_scrub" -> (d => {
        operators.DocArtifacts.clearMemo()
        operators.Text.boilerplateScrub(spark, d) }),
      "corpus_token_budget_trim" -> (d => {
        operators.DocArtifacts.clearMemo()
        operators.Corpus.tokenBudgetTrim(spark, d) }),
      "corpus_clean" -> (d => {
        operators.DocArtifacts.clearMemo()
        operators.Dedup.clearTuningMemo()
        operators.Corpus.clearCleanMemo()
        operators.Corpus.clean(spark, d) }),
      "txt_bigram_logprob" -> (d => operators.Text.bigramLogprob(spark, d)),
      "mm_shard_pack" -> (d => operators.Multimodal.shardPack(spark, d)),
      "dedup_source_overlap" -> (d => {
        operators.DocArtifacts.clearMemo()
        operators.Dedup.sourceOverlap(spark, d) }),
      // r7's heavy additions: the tuning suite (memo cleared so each
      // timed run pays the FULL shingle→candidate landing, not the memo
      // hit) and the trained-quantizer family
      "dedup_threshold_sweep" -> (d => {
        operators.DocArtifacts.clearMemo()
        operators.Dedup.clearTuningMemo()
        operators.Dedup.thresholdSweep(spark, d) }),
      "dedup_band_tuning" -> (d => {
        operators.DocArtifacts.clearMemo()
        operators.Dedup.clearTuningMemo()
        operators.Dedup.bandTuning(spark, d) }),
      "dedup_minhash_calibration" -> (d => {
        operators.DocArtifacts.clearMemo()
        operators.Dedup.clearTuningMemo()
        operators.Dedup.minhashCalibration(spark, d) }),
      "emb_pq" -> (d => operators.Similarity.pq(spark, d)),
      "emb_pca_project" -> (d => operators.Similarity.pcaProject(spark, d)),
      // the r13 plan-shape changes get their own scaling pins (VERDICT
      // r13 #6): contamination's hashed-shingle vocabulary join must
      // stay linear in corpus shingles
      "corpus_contamination" -> (d => operators.Corpus.contamination(spark, d)))
    def run(f: String => org.apache.spark.sql.DataFrame,
        d: String): Double = {
      val t0 = System.nanoTime()
      f(d).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    ops.foreach { case (_, f) => run(f, dir1) } // JVM/codegen warm-up
    ops.foreach { case (name, f) =>
      var t1 = run(f, dir1)
      var t10 = run(f, dir10)
      // 10x data, 2x slack => 20x; max(t1, 0.5s) + 2s absorb the fixed
      // per-job constants that dominate sub-second local runs
      def bound = 20.0 * math.max(t1, 0.5) + 2.0
      if (t10 > bound) {
        // wall-clock on a shared box: one re-measure of BOTH points
        // absorbs an ambient load spike without loosening the bound —
        // a real quadratic blowup (100x work) fails both attempts
        val r1 = run(f, dir1)
        val r10 = run(f, dir10)
        t1 = math.min(t1, r1); t10 = math.min(t10, r10)
      }
      info(f"$name: 1x=$t1%.2fs 10x=$t10%.2fs ratio=${t10 / t1}%.1fx")
      assert(t10 <= bound,
        f"$name scaled superlinearly: 1x=$t1%.2fs -> 10x=$t10%.2fs")
    }
  }

  test("grouped prefix-sum family survives a dominant source: 90% of the " +
      "corpus in one source costs no more than a balanced corpus") {
    // the 256-bucket claim for the grouped two-pass plan, proven the way
    // the duplicate storm is: a plan that put each SOURCE in one task
    // (plain partitionBy(source) window) would serialize 90% of the
    // corpus through one task on the dominant corpus while the balanced
    // corpus parallelizes — a wall-clock gap the ≤2x bound catches.
    // Both corpora are the same 10x replica set; only `source` differs.
    val tmp = java.nio.file.Files.createTempDirectory("graft_skew")
    def gen(tag: String, sourceOf: Int => org.apache.spark.sql.Column)
        : String = {
      val dir = s"$tmp/$tag"
      val docs = (0 until 10).map(i =>
        Tables.documents(spark, "/root/testdata/sf0.01").select(
          (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          regexp_replace(col("text"), " ", s" r$i ").as("text"),
          col("lang"), sourceOf(i).as("source"), col("n_chars")))
        .reduce(_ unionAll _)
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    // balanced: ten equal sources; dominant: replicas 0-8 share one
    val balanced = gen("balanced", i => lit(s"s$i"))
    val dominant = gen("dominant",
      i => if (i < 9) lit("s_dom") else lit("s9"))
    val ops: Seq[(String, String => org.apache.spark.sql.DataFrame)] = Seq(
      "corpus_token_budget_trim" -> (d => {
        operators.DocArtifacts.clearMemo()
        operators.Corpus.tokenBudgetTrim(spark, d) }),
      "smp_interleave" -> (d => operators.Sampling.interleave(spark, d)))
    def run(f: String => org.apache.spark.sql.DataFrame,
        d: String): Double = {
      val t0 = System.nanoTime()
      f(d).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    ops.foreach { case (_, f) => run(f, balanced) } // warm-up
    ops.foreach { case (name, f) =>
      var tBal = run(f, balanced)
      var tDom = run(f, dominant)
      // 2x slack + 1s constant absorber, one re-measure of both points
      // against ambient load (the near-linear test's discipline)
      def bound = 2.0 * math.max(tBal, 0.5) + 1.0
      if (tDom > bound) {
        val rb = run(f, balanced)
        val rd = run(f, dominant)
        tBal = math.min(tBal, rb); tDom = math.min(tDom, rd)
      }
      info(f"$name: balanced=$tBal%.2fs dominant=$tDom%.2fs")
      assert(tDom <= bound,
        f"$name pays a dominant-source penalty: balanced=$tBal%.2fs " +
          f"dominant=$tDom%.2fs")
    }
    // and the structural claim behind the wall-clock one: the dominant
    // source's rows really do spread across the bucket space, so no
    // single (source, bucket) task ever holds the whole source
    operators.DocArtifacts.clearMemo()
    val spreadBuckets = operators.DocArtifacts
      .stats(spark, dominant)
      .filter(col("source") === "s_dom")
      .select(col("q_bucket")).distinct().count()
    assert(spreadBuckets >= 64,
      s"dominant source occupies only $spreadBuckets of 256 buckets")
  }

  test("salted join equals plain join under extreme single-key skew") {
    val salts = 16
    // one hot key with 50k rows + 1k uniform rows
    val fact = ((1 to 50000).map(i => (1L, i.toDouble)) ++
      (1 to 1000).map(i => (i.toLong % 100 + 2, i.toDouble)))
      .toDF("k", "v")
    val dim = (1L to 101L).map(k => (k, s"dim_$k")).toDF("dk", "name")
    val salted = operators.Scale
      .saltedEquiJoin(fact, dim, "k", "dk", salts, Seq("k", "v"))
      .groupBy(col("name")).agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toString)).toSet
    val plain = fact.join(dim, col("k") === col("dk"))
      .groupBy(col("name")).agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toString)).toSet
    assert(salted == plain)
    // the hot key actually spread: its salt values cover > 1 partition
    val spread = fact.filter(col("k") === 1)
      .select(pmod(xxhash64(col("k"), col("v")), lit(salts.toLong)))
      .distinct().count()
    assert(spread > salts / 2, s"hot key only spread over $spread salts")
  }

  test("two-level quantizer: full coverage, cell containment, exact " +
      "dists, bit-determinism (forced small coarseK)") {
    import operators.Similarity._
    def land(): String = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_twolevel").toString
      Tables.embeddings(spark, sfTiny)
        .write.parquet(s"$dir/embeddings.parquet")
      val n = Tables.rowCount(spark, dir, "embeddings")
      trainKmeansTwoLevel(spark, dir, n, coarseK = 8, sweeps = 3)
      dir
    }
    val dir = land()
    val n = Tables.rowCount(spark, dir, "embeddings")
    val assign = spark.read.parquet(kmeansAssignDir(dir))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // full coverage: every corpus vector is assigned exactly once
    assert(assign.size == n,
      s"assigned ${assign.size} of $n vectors")
    val cents = spark.read.parquet(kmeansCentDir(dir))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    val cellOf = spark.read.parquet(kmeansCellMapDir(dir))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cents.keySet == cellOf.keySet, "cluster/cell map must cover " +
      "exactly the landed centroid table")
    val coarse = spark.read.parquet(kmeansCoarseDir(dir))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    assert(coarse.length == 8)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    def d2(v: Array[Double], c: Array[Double]): Double =
      (dot(v, v) + dot(c, c)) - 2.0 * dot(v, c)
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vd"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    vecs.foreach { case (id, v) =>
      val (cl, dist) = assign(id)
      // cell containment: the assigned fine cluster lives in the
      // vector's own coarse cell (re-derived brute-force, ascending
      // strict-< — the kernel's exact order)
      val myCell = coarse.minBy { case (c, cv) => (d2(v, cv), c) }._1
      assert(cellOf(cl) == myCell,
        s"vec $id assigned to cluster $cl of cell ${cellOf(cl)} but " +
          s"its coarse cell is $myCell")
      // the landed dist is the exact squared-L2 to the assigned
      // centroid, and the assigned centroid is the argmin WITHIN the
      // cell (ties to the lower cluster id)
      assert(dist == d2(v, cents(cl)), s"vec $id dist mismatch")
      val cellClusters = cellOf.collect {
        case (c, cell) if cell == myCell => c }.toSeq.sorted
      val best = cellClusters.minBy(c => (d2(v, cents(c)), c))
      assert(cl == best, s"vec $id: $cl is not the cell argmin $best")
    }
    // bit-determinism: a second landing from the same bytes is
    // identical, assignment and centroids both
    val dir2 = land()
    val assign2 = spark.read.parquet(kmeansAssignDir(dir2))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(assign2 == assign, "two-level landing must be deterministic")
    val cents2 = spark.read.parquet(kmeansCentDir(dir2))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    assert(cents2.keySet == cents.keySet &&
      cents.keySet.forall(k => cents2(k).sameElements(cents(k))))
  }

  test("two-level regime boundary: flat runway ends at 512 width, the " +
      "coarse capacity guard prescribes the third level") {
    import operators.Similarity._
    // inside the flat runway: no two-level, width guard passes
    for (n <- Seq(500L, 2000000L, 512L * maxQuantizerK))
      assert(!twoLevelNeeded(n))
    // past it: the two-level regime takes over (the r15 guard's own
    // prescription) instead of an error
    for (n <- Seq(512L * maxQuantizerK + maxQuantizerK,
        1000L * 1000 * 1000)) {
      assert(twoLevelNeeded(n))
      assertCoarseCapacity(n) // inside two-level capacity: no throw
    }
    // the NEXT wall: past ~4.3B vectors the per-cell fine k outgrows
    // the per-task bound — loud, named, with the prescription
    val e = intercept[IllegalStateException] {
      assertCoarseCapacity(5L * 1000 * 1000 * 1000) }
    assert(e.getMessage.contains("third level"))
  }
}
