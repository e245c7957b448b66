package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** graft's `SparkSessionExtensions`: scale guards injected into every
  * session built by GraftSession (or any session configured with
  * `spark.sql.extensions=graft.plans.GraftExtensions`).
  *
  * The one rule the library refuses to leave to code review: a `Window`
  * with `orderBy` but no `partitionBy` moves EVERY row to one task —
  * fine on a laptop, fatal on a 100 TB input. The engine's own
  * operators never plan one over an unbounded input (they use
  * graft.operators.Ranking's two-pass bucket ranking; PlanAudit asserts
  * it), so the guard exists for USER queries built on this library: it
  * warns by default and fails fast when
  * `spark.graft.failOnSingleTaskWindow=true`.
  *
  * Windows whose input subtree contains an Aggregate are exempt — the
  * pre-aggregated (calendar-bounded) report tables are exactly where a
  * tiny global window is the right plan.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => SingleTaskWindowGuard)
}

object SingleTaskWindowGuard extends Rule[LogicalPlan] {

  val FailKey = "spark.graft.failOnSingleTaskWindow"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case w: Window if w.partitionSpec.isEmpty &&
          w.child.collectFirst { case a: Aggregate => a }.isEmpty =>
        val msg = "single-task window: Window with orderBy but no " +
          "partitionBy over a non-aggregated input sorts EVERY row in " +
          "one task at scale. Use graft.operators.Ranking (two-pass " +
          "bucket ranking) for global ranks/ntiles, or pre-aggregate " +
          s"to a bounded table. Set $FailKey=false to only warn. " +
          s"Window: ${w.windowExpressions.map(_.name).mkString(", ")}"
        if (conf.getConfString(FailKey, "false") == "true")
          throw new IllegalStateException(msg)
        else logWarning(msg)
      case _ => ()
    }
    plan
  }
}
