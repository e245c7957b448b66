package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.RollingHash.rollingHash

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def reference(s: String): Long =
    RollingHash.hashBytes(s.getBytes("UTF-8"))

  test("matches the byte-level reference implementation") {
    val inputs = Seq("", "a", "hello world", "héllo ünïcode ✓",
      "the fast key order sort table")
    val got = inputs.toDF("s")
      .select(rollingHash(col("s")).as("h")).as[Long].collect()
    assert(got.toSeq == inputs.map(reference))
  }

  test("codegen and interpreted paths agree") {
    val df = Seq("spark graft rolling hash").toDF("s")
    val viaCodegen = df.select(rollingHash(col("s"))).first().getLong(0)
    // force interpreted eval through the expression directly
    val interpreted = RollingHash(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "spark graft rolling hash")).eval(null)
    assert(viaCodegen == interpreted)
  }

  test("null input yields null") {
    val df = Seq[Option[String]](None).toDF("s")
    assert(df.select(rollingHash(col("s"))).first().isNullAt(0))
  }

  test("non-string input is rejected at analysis") {
    val df = Seq(1L).toDF("x")
    intercept[Exception] { df.select(rollingHash(col("x"))).collect() }
  }
}
