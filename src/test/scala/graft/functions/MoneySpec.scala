package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The centralized cents contract (r19): fast and decimal paths agree
  * exactly on contract-conforming data, the fast path's known
  * divergence on NEGATIVES is real (why the gate exists), and the
  * footer gate reads true statistics. */
class MoneySpec extends SparkSpec {

  test("fast == decimal cents on an exhaustive 2dp grid (0..5000.00)") {
    import spark.implicits._
    // every 2dp value in [0, 5000]: 500k rows, both extractions equal
    val df = spark.range(0L, 500001L)
      .select((col("id").cast("double") / 100.0).as("v"))
    val bad = df.select(
        Money.centsFast(col("v")).as("f"),
        Money.centsDecimal(col("v")).as("d"))
      .filter(col("f") =!= col("d")).count()
    assert(bad == 0L, s"$bad grid values diverge")
  }

  test("fast == decimal at the contract's magnitude edge (~1e9)") {
    import spark.implicits._
    val vals = Seq(999999999.99, 999999999.98, 123456789.01,
      987654321.99, 1e9)
    val bad = vals.toDF("v").select(
        Money.centsFast(col("v")).as("f"),
        Money.centsDecimal(col("v")).as("d"))
      .filter(col("f") =!= col("d")).count()
    assert(bad == 0L)
  }

  test("negative 2dp values DIVERGE on the fast path — the gate's reason") {
    import spark.implicits._
    // -1.00: fast = (-100 + 0.5).cast(long) = -99 (truncation toward
    // zero); decimal = -100. The advisor's refund example, pinned.
    val r = Seq(-1.00).toDF("v").select(
      Money.centsFast(col("v")).as("f"),
      Money.centsDecimal(col("v")).as("d")).head()
    assert(r.getLong(0) == -99L && r.getLong(1) == -100L)
  }

  test("footer gate: events.value passes, synthetic negatives fail") {
    assert(Money.fastPathHolds(spark, sfTiny, "events", "value"),
      "bundled events.value is positive 2dp money — footer gate must pass")
    // a table with a negative min must refuse the fast path
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_money").toString
    Seq(-1.25, 2.50, 3.75).toDF("value")
      .write.mode("overwrite").parquet(s"$tmp/refunds.parquet")
    assert(!Money.fastPathHolds(spark, tmp, "refunds", "value"))
    // absent table / absent column also refuse
    assert(!Money.fastPathHolds(spark, tmp, "nope", "value"))
  }

  test("columnMinMax reads exact footer stats for a plain double column") {
    val mm = graft.Tables.columnMinMax(spark, sfTiny, "lineitem",
      "l_quantity")
    assert(mm.isDefined)
    val (lo, hi) = mm.get
    // cross-check against the scan-side aggregate
    val r = graft.Tables.lineitem(spark, sfTiny)
      .agg(min(col("l_quantity")), max(col("l_quantity"))).head()
    assert(lo == r.getDouble(0) && hi == r.getDouble(1),
      s"footer ($lo,$hi) != scan (${r.getDouble(0)},${r.getDouble(1)})")
  }
}
