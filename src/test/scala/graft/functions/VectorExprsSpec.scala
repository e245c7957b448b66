package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorExprs._

class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  test("sorted_upper_bound equals the aggregate fold it replaces, " +
      "on duplicates, extremes and empty boundary arrays") {
    val rnd = new scala.util.Random(11)
    val bounds = Seq(
      Seq.empty[Double],
      Seq(0.0),
      Seq(1.0, 1.0, 1.0),                      // all-duplicate boundaries
      (1 to 63).map(_.toDouble / 8).sorted,
      Seq(Double.NegativeInfinity, -1e300, 0.0, 1e-300, 1e300,
        Double.PositiveInfinity))
    val vs = Seq(-1e301, -5.0, -0.0, 0.0, 1e-300, 0.99, 1.0, 1.01,
      7.875, 8.0, 1e301, Double.NegativeInfinity,
      Double.PositiveInfinity) ++ (1 to 40).map(_ => rnd.nextDouble * 16 - 4)
    for (b <- bounds) {
      val df = vs.toDF("v").withColumn("bs",
        array(b.map(x => lit(x)): _*).cast("array<double>"))
      val got = df.select(sortedUpperBound(col("v"), col("bs")))
        .collect().map(_.getInt(0))
      val want = df.select(aggregate(col("bs"), lit(0),
          (acc, x) => acc + when(col("v") >= x, 1).otherwise(0)))
        .collect().map(_.getInt(0))
      assert(got.toSeq == want.toSeq, s"diverged on bounds $b")
    }
  }

  test("sorted_upper_bound: interpreted eval agrees with codegen, " +
      "null propagates, wrong type rejected") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val arr = new GenericArrayData(Array[Any](1.0, 2.0, 4.0))
    val expr = SortedUpperBound(
      Literal(2.5), Literal.create(arr, ArrayType(DoubleType)))
    val viaEval = expr.eval(null).asInstanceOf[Int]
    val viaDf = Seq(2.5).toDF("v")
      .select(sortedUpperBound(col("v"),
        array(lit(1.0), lit(2.0), lit(4.0))))
      .first().getInt(0)
    assert(viaEval == viaDf && viaEval == 2)
    val nulls = Seq(Some(2.5), None).toDF("v")
      .select(sortedUpperBound(col("v"), array(lit(1.0)))).collect()
    assert(!nulls(0).isNullAt(0) && nulls(1).isNullAt(0))
    intercept[Exception] {
      Seq("x").toDF("v")
        .select(sortedUpperBound(col("v"), array(lit(1.0)))).collect()
    }
  }
}
