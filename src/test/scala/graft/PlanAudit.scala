package graft

/** One-shot audit harness (not run in CI): prints per-operator physical
  * plan smells so a human can review plan quality in bulk. */
class PlanAudit extends SparkSpec {
  test("audit: plan smells per operator") {
    val skip = Set("stream_windowed_counts", "stream_sessionize",
      "etl_partitioned_write", "etl_json_landing", "q17_bucketed_join",
      "mm_binary_pipeline")
    println("=====AUDIT START=====")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!skip.contains(name)) {
        try {
          val df = fn(spark, sfTiny)
          df.collect()
          val p = df.queryExecution.executedPlan.toString
          val exch = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
          val bcast = p.linesIterator.count(_.contains("BroadcastHashJoin"))
          val smj = p.linesIterator.count(_.contains("SortMergeJoin"))
          val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
          val cart = p.linesIterator.count(_.contains("CartesianProduct"))
          println(f"AUDIT| $name%-24s exch=$exch bhj=$bcast smj=$smj bnlj=$bnlj cart=$cart")
        } catch { case e: Throwable =>
          println(s"AUDIT| $name ERR ${e.getMessage.take(80)}")
        }
      }
    }
    println("=====AUDIT END=====")
  }
}
