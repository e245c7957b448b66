package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-checked loaders for the driver-generated parquet tables.
  *
  * Mirrors the reference's landed data layout (one object per source,
  * cf. /root/reference/lambda/lambda_function.py:314-350 `load_to_s3`):
  * each logical table is a parquet path under a scale-factor directory.
  * Column pruning / predicate pushdown happen at these scans — every
  * operator must keep its filters/projections Catalyst-visible so they
  * reach here (checked in specs via explain).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Required columns per table — checked at load so a drifted landing
    * fails fast with the missing columns named, instead of surfacing as
    * an unresolved-attribute error deep inside some operator's plan.
    * (Column check only, from parquet footer metadata — no data scan.) */
  private val requiredColumns: Map[String, Set[String]] = Map(
    "region" -> Set("r_regionkey", "r_name"),
    "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment"),
    "supplier" -> Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Set("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice"),
    "orders" -> Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"),
    "events" -> Set("event_id", "ts", "user_id", "event_type", "value",
      "props"),
    "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Set("vec_id", "embedding", "label"))

  /** Plan memo: `spark.read.parquet` re-reads footers and re-infers the
    * schema on every call (~55ms locally) — ~15s of a 190-op sweep over
    * the same ten immutable tables is pure re-inference. A production
    * engine caches exactly this in its catalog (that is what a
    * metastore holds); this memo is that cache, keyed per (session,
    * dir, table) with the content fingerprint stored IN the entry so a
    * regenerated table replaces (not accumulates beside) its stale
    * plan. A weak-key map cannot express this cache — the DataFrame
    * value strongly references its SparkSession, which would pin the
    * weak key forever — so entries are keyed by context identity and
    * purged explicitly: every lookup drops entries whose context has
    * stopped (checked through a WeakReference so the memo itself never
    * pins a context that has otherwise been dropped). */
  private final case class PlanEntry(fp: String, df: DataFrame,
      sc: java.lang.ref.WeakReference[org.apache.spark.SparkContext])
  private val planMemo =
    scala.collection.concurrent.TrieMap.empty[(Int, String, String),
      PlanEntry]

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    planMemo.foreach { case (k, e) =>
      val live = Option(e.sc.get()).exists(!_.isStopped)
      if (!live) planMemo.remove(k)
    }
    val sc = spark.sparkContext
    val key = (System.identityHashCode(sc), dir, name)
    val fp = fingerprint(spark, dir, name)
    planMemo.get(key) match {
      case Some(e) if e.fp == fp => e.df
      case _ =>
        val df = spark.read.parquet(s"$dir/$name.parquet")
        val missing = requiredColumns.getOrElse(name, Set.empty) --
          df.columns.toSet
        require(missing.isEmpty,
          s"table '$name' at $dir is missing required columns: " +
            missing.toSeq.sorted.mkString(", "))
        planMemo.put(key,
          PlanEntry(fp, df, new java.lang.ref.WeakReference(sc)))
        df
    }
  }

  /** Name-dispatched loader applying per-table quirks (events' NANOS
    * timestamps) — the entry point for anything loading tables by
    * config-supplied name rather than a typed accessor. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case other => apply(spark, dir, other)
    }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** events.ts lands as either TIMESTAMP(MICROS) (maps straight to
    * TimestampType) or TIMESTAMP(NANOS), which Spark 4 refuses to map;
    * with the legacy conf the NANOS case reads as raw nanos LONG and is
    * floor-divided to micros — the same truncation DuckDB applies, so
    * oracle timestamps agree under both layouts. (`div`, not `/`:
    * double division would lose precision above 2^53.) */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Spread a scan for expensive PER-ROW expression work: a small
    * landing arrives as ONE parquet split, which serializes the per-doc
    * work onto one core. Repartitions ONLY when the scan has fewer
    * splits than the cluster has slots; a corpus-scale scan already has
    * them and skips the shuffle, so the guard keeps this a local-small
    * fix, never a 100 TB re-exchange.
    *
    * Use SPARINGLY: the partition probe (`df.rdd`) plus the shuffle
    * cost ~0.3-0.5s per call locally, which LOSES on light scans — a
    * broad application across the tokenizing text ops measured a net
    * +10.6s at sf0.1 and was reverted. It pays only where a one-shot
    * pipeline does heavy per-row string work behind a single action
    * (the tuning landing: string 3-gram shingles + per-shingle md5 +
    * signatures for every doc, amortized across four consumers). */
  def spread(s: SparkSession, df: DataFrame): DataFrame = {
    val slots = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < slots) df.repartition(slots) else df
  }

  /** `spread` for a scan whose source path is known: the split count
    * comes from the FILE LISTING (Σ ceil(bytes / maxPartitionBytes),
    * the scan planner's own arithmetic) instead of materializing
    * `df.rdd` — the probe was ~0.3-0.5s per landing locally and a real
    * job on a cluster. Same guard semantics: repartition only when the
    * scan has fewer splits than the cluster has slots. */
  def spreadScan(s: SparkSession, path: String, df: DataFrame): DataFrame = {
    val slots = s.sparkContext.defaultParallelism
    val maxBytes = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(s.conf.get(
        "spark.sql.files.maxPartitionBytes", "128MB"))
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    var splits = 0L
    if (fs.exists(p)) {
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet"))
          splits += (st.getLen + maxBytes - 1) / maxBytes
      }
    }
    if (splits < slots) df.repartition(slots) else df
  }

  /** Landing-dir contract for derived artifacts that static oracle SQL
    * must be able to name: computable from `dir` alone (no session or
    * timestamp component — the oracle SQL and the landing write resolve
    * the same path), namespaced by OS user so concurrent users on one
    * host cannot clobber each other's artifacts, with a stable 8-hex
    * MurmurHash3 of the RAW dir string appended so two dirs that
    * sanitize to the same token (the `[^0-9a-zA-Z]` collapse) cannot
    * share a path. */
  def landingDir(tag: String, dir: String): String = {
    val user = Option(System.getProperty("user.name")).getOrElse("anon")
      .replaceAll("[^0-9a-zA-Z]", "_")
    // oracle TEMPLATES are built with the literal `__SFDIR__` token and
    // resolved later (SparkEntry.oracleSqlFor): the hash must resolve
    // with them, so the token case emits a hash placeholder instead of
    // hashing the token string itself
    val h =
      if (dir == "__SFDIR__") "__SFHASH__"
      else f"${scala.util.hashing.MurmurHash3.stringHash(dir)}%08x"
    s"${System.getProperty("java.io.tmpdir")}/graft_${user}_${tag}_" +
      dir.replaceAll("[^0-9a-zA-Z]", "_") + "_" + h
  }

  /** Exact row count of one landed table, answered from parquet FOOTER
    * metadata on the driver — no Spark job. This is catalog metadata: a
    * production engine serves COUNT(*) from its metastore statistics,
    * and the sketch operators (q19/q20) need only the row count's BIT
    * LENGTH to pin θ — paying a per-query count job for it doubles the
    * job count of every sketch query. Memoized on the content
    * fingerprint so a regenerated table re-counts. */
  private val rowCountMemo =
    scala.collection.concurrent.TrieMap.empty[String, Long]
  def rowCount(s: SparkSession, dir: String, name: String): Long =
    rowCountMemo.getOrElseUpdate(
      s"$dir/$name@${fingerprint(s, dir, name)}", {
        val conf = s.sparkContext.hadoopConfiguration
        val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
        val fs = p.getFileSystem(conf)
        if (!fs.exists(p)) 0L // absent table: 0 rows
        else {
          val it = fs.listFiles(p, true)
          var n = 0L
          while (it.hasNext) {
            val st = it.next()
            if (st.getPath.getName.endsWith(".parquet")) {
              val r = org.apache.parquet.hadoop.ParquetFileReader.open(
                org.apache.parquet.hadoop.util.HadoopInputFile
                  .fromPath(st.getPath, conf))
              try n += r.getRecordCount finally r.close()
            }
          }
          n
        }
      })

  /** Footer min/max STATISTICS of one primitive column, folded across
    * every file and row group on the driver — catalog metadata exactly
    * like [[rowCount]] (a production engine serves filter-less MIN/MAX
    * from its metastore / file statistics; Spark itself does the same
    * through `spark.sql.parquet.aggregatePushdown`). No data pages are
    * decoded and no Spark job runs. Returns Some((lo, hi)) over the
    * column's non-null values; None when the column is absent, a chunk
    * lacks trustworthy statistics, the physical type is not a plain
    * numeric (decimal/binary/etc. need logical-type decoding this
    * helper deliberately does not attempt), or every chunk is all-null
    * — callers MUST treat None as "derive it from a scan instead".
    * Memoized on the content fingerprint like rowCount. */
  private val colMinMaxMemo = scala.collection.concurrent.TrieMap
    .empty[String, Option[(Double, Double)]]
  def columnMinMax(s: SparkSession, dir: String, name: String,
      column: String): Option[(Double, Double)] =
    colMinMaxMemo.getOrElseUpdate(
      s"$dir/$name/$column@${fingerprint(s, dir, name)}", {
        import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
        import scala.jdk.CollectionConverters._
        val conf = s.sparkContext.hadoopConfiguration
        val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
        val fs = p.getFileSystem(conf)
        if (!fs.exists(p)) None
        else try {
          var lo = Double.PositiveInfinity
          var hi = Double.NegativeInfinity
          var sawValues = false
          var trusted = true
          val it = fs.listFiles(p, true)
          while (trusted && it.hasNext) {
            val st = it.next()
            if (st.getPath.getName.endsWith(".parquet")) {
              val r = org.apache.parquet.hadoop.ParquetFileReader.open(
                org.apache.parquet.hadoop.util.HadoopInputFile
                  .fromPath(st.getPath, conf))
              try {
                val blocks = r.getFooter.getBlocks
                var bi = 0
                while (trusted && bi < blocks.size()) {
                  val b = blocks.get(bi)
                  val chunk = b.getColumns.asScala
                    .find(_.getPath.toDotString == column)
                  chunk match {
                    case None => trusted = false // column absent
                    case Some(c) =>
                      val pt = c.getPrimitiveType
                      // plain numerics only: a logical annotation
                      // (decimal over ints, date, …) changes the raw
                      // value's meaning — refuse rather than mis-scale
                      val plain = pt.getLogicalTypeAnnotation == null &&
                        Set(INT32, INT64, FLOAT, DOUBLE)
                          .contains(pt.getPrimitiveTypeName)
                      val stats = c.getStatistics
                      if (!plain || stats == null || stats.isEmpty)
                        trusted = false
                      else if (!stats.hasNonNullValue) {
                        // all-null chunk is fine ONLY when the null
                        // count proves it; otherwise stats are unset
                        if (!(stats.isNumNullsSet &&
                            stats.getNumNulls == c.getValueCount))
                          trusted = false
                      } else {
                        def d(v: Any): Double = v match {
                          case x: java.lang.Integer => x.toDouble
                          case x: java.lang.Long => x.toDouble
                          case x: java.lang.Float => x.toDouble
                          case x: java.lang.Double => x
                          case _ => trusted = false; 0.0
                        }
                        val mn = d(stats.genericGetMin)
                        val mx = d(stats.genericGetMax)
                        if (trusted) {
                          sawValues = true
                          if (mn < lo) lo = mn
                          if (mx > hi) hi = mx
                        }
                      }
                  }
                  bi += 1
                }
              } finally r.close()
            }
          }
          if (trusted && sawValues) Some((lo, hi)) else None
        } catch { case scala.util.control.NonFatal(_) => None }
      })

  /** Cheap content fingerprint of one landed table under `dir` — file
    * count, total bytes, and max modification time from the filesystem
    * listing (footer-free, no data scan). Keys the landed-artifact
    * memos (`ensureTuningLanded`, `ensureKmeansLanded`) so a
    * regenerated or mutated source table re-lands instead of silently
    * serving artifacts derived from the old bytes. Goes through the
    * Hadoop FileSystem API, so every supported scheme (file://,
    * hdfs://, s3a://) fingerprints the same way. */
  def fingerprint(s: SparkSession, dir: String, name: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else {
      val it = fs.listFiles(p, true)
      var n = 0L
      var bytes = 0L
      var mtime = 0L
      // name:length listing hash: parquet writers emit fresh UUID part
      // names on every rewrite, so this catches a table rewritten within
      // mtime granularity with identical total bytes and file count —
      // the one blind spot of the (n, bytes, mtime) triple
      val entries = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val st = it.next()
        n += 1
        bytes += st.getLen
        mtime = math.max(mtime, st.getModificationTime)
        entries += s"${st.getPath.getName}=${st.getLen}"
      }
      val nh = scala.util.hashing.MurmurHash3
        .orderedHash(entries.sorted)
      f"$n:$bytes:$mtime:$nh%08x"
    }
  }

  /** Run a landing `body` exactly once per key ACROSS THREADS. The
    * landing memos (DocArtifacts / Dedup tuning / kmeans / clean
    * manifest) were `getOrElseUpdate`, which does NOT mutually exclude
    * concurrent evaluators: two threads arriving with the same
    * (session, dir, fingerprint) key would both run the overwrite
    * parquet writes into the same dirs, and a reader could observe a
    * half-overwritten artifact. Concurrent consumers are real — the
    * landings themselves fan out writes on the global ExecutionContext,
    * and a user embedding the library drives ops from multiple threads.
    * Here the memo holds a Future per key installed atomically with
    * `putIfAbsent`: exactly one thread executes the landing; later
    * arrivals block on its completion. A FAILED landing removes its
    * entry before completing the promise, so a subsequent call retries
    * instead of caching the failure forever. */
  def landOnce[K](memo: scala.collection.concurrent.TrieMap[K,
      scala.concurrent.Future[Unit]], key: K)(body: => Unit): Unit = {
    val p = scala.concurrent.Promise[Unit]()
    memo.putIfAbsent(key, p.future) match {
      case Some(f) =>
        scala.concurrent.Await.result(
          f, scala.concurrent.duration.Duration.Inf)
      case None =>
        try { body; p.success(()) }
        catch { case e: Throwable =>
          memo.remove(key); p.failure(e); throw e }
    }
  }
}
