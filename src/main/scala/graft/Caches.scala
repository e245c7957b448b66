package graft

import org.apache.spark.sql.SparkSession

/** Session-level cache release (SURVEY §4 cache contract): operators
  * persist / localCheckpoint derived tables (signature tables before
  * self-joins, exploded token streams feeding two consumers) and hand
  * the caller a LAZY result — the cache must live until the result is
  * materialized, so the operator itself cannot unpersist. The contract:
  * after materializing an operator's output, the caller releases
  * everything via this helper. Verify and Bench call it between ops, so
  * a full 190-op sweep holds at most one op's working set at a time.
  *
  * `catalog.clearCache()` only drops Dataset.persist entries tracked by
  * the CacheManager; `localCheckpoint` blocks are RDD-level persists
  * visible only through `getPersistentRDDs` — both must be released or
  * a long session accretes dead blocks (the r7 hygiene finding).
  */
object Caches {

  /** Drop every cached Dataset and persistent RDD in the session. Safe
    * between operators: landed artifacts (k-means centroids, tuning
    * candidates, simhash fingerprints) live in parquet, not cache, and
    * train-once memos key on the artifact being landed, not cached. */
  def release(s: SparkSession): Unit = {
    s.catalog.clearCache()
    s.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
