package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's scale posture baked in
  * (SURVEY §3/§4) — one place owns the conf, so every entry point
  * (Verify, Bench, PlansDump, a user's cluster job) runs the same
  * engine:
  *
  *  - AQE on, with partition coalescing and skew-join splitting: the
  *    runtime re-plan that replaces hand-tuned partition counts at
  *    100 TB (SURVEY §4).
  *  - `spark.sql.shuffle.partitions` sized by the CALLER from the
  *    parallelism actually available (local cores here; ~2-3× total
  *    executor cores on a cluster) — never the 200 default.
  *  - Session timezone pinned to UTC: timestamp arithmetic must not
  *    depend on where a driver happens to run.
  *  - `parquet.nanosAsLong` on: the landed `events` table carries
  *    TIMESTAMP(NANOS), which Spark 4 otherwise refuses (see
  *    Tables.events for the micros truncation that matches DuckDB).
  */
object GraftSession {

  /** Local session for the harness mains and tests: the production conf
    * posture on a `local[cores]` master, UI off. */
  def local(cores: Int): SparkSession =
    tuned(SparkSession.builder().master(s"local[$cores]"), cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  /** Apply graft's conf posture to any builder (cluster deployments call
    * this with their own master/resource settings). */
  def tuned(b: SparkSession.Builder,
      shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // scale guards (single-task-window detector; warns by default,
      // fails when spark.graft.failOnSingleTaskWindow=true)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // filter-less COUNT/MIN/MAX answered from parquet footers instead
      // of data pages (off by default; exact same results, skips decode)
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // split size sized to the harness SF (the §4 discipline: partition
      // knobs follow the data actually in front of the engine, never the
      // defaults): the bench tables land as ONE file per table, so the
      // 128MB default puts a whole 100MB+ fact scan in a single task.
      // 4MB keeps single-digit-MB tables at one split while a 100MB
      // fact file fans out across the cores (row-group permitting). A
      // cluster deployment against real multi-file data keeps its own
      // value via the builder it passes to `tuned`.
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // report the bucketed landings' per-bucket SORT ORDER to the
      // planner: the bucket writer repartitions to one file per bucket
      // (Scale.ensureBucketsLanded), which is exactly the regime this
      // flag requires — with it the co-located orderkey SMJs
      // (q4/q17/etl_fk_audit) skip their sort nodes entirely (the sf3
      // lineitem-orders SMJ measured 3.4s WITH the re-sort, 1.1s
      // without); off, Spark conservatively re-sorts every bucketed
      // scan because a multi-file bucket only guarantees order within
      // each file
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      // timezone-naive parquet timestamps (timestamp[us] with no tz)
      // must read as TimestampType, not TIMESTAMP_NTZ: the session is
      // pinned UTC so the values are identical, every chrono function
      // (unix_micros, window, watermark) accepts them, and scan-level
      // filter pushdown stays intact — no per-column casts
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
}
