package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.HashExprs._

class HashExprsSpec extends SparkSpec {
  import spark.implicits._

  test("md5_slice_long equals conv(substring(md5(x), p, l), 16, 10) " +
      "for every slice geometry the operators use") {
    val df = (Seq("", "a", "hello world", "doc:42:text",
      "éü中文 multibyte") ++
      (1 to 50).map(i => s"row $i payload " + ("x" * i))).toDF("t")
    for ((pos, len) <- Seq((1, 13), (1, 6), (32, 1), (17, 15), (5, 4))) {
      val got = df.select(md5SliceLong(col("t"), pos, len)).collect()
        .map(_.getLong(0))
      val want = df.select(conv(substring(md5(col("t")), pos, len), 16, 10)
        .cast("long")).collect().map(_.getLong(0))
      assert(got.toSeq == want.toSeq, s"slice ($pos, $len) diverged")
    }
  }

  test("md5_slice_long: interpreted eval agrees with codegen, null " +
      "propagates, bad geometry rejected at construction") {
    val df = Seq(Some("abc"), None).toDF("t")
    val rows = df.select(md5SliceLong(col("t"), 1, 13)).collect()
    assert(!rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0), "null input must stay null")
    // interpreted path (expression.eval outside codegen)
    val expr = Md5SliceLong(
      org.apache.spark.sql.catalyst.expressions.Literal("abc"), 1, 13)
    val viaEval = expr.eval(null).asInstanceOf[Long]
    assert(viaEval == rows(0).getLong(0),
      "interpreted eval must match the codegen'd column value")
    intercept[IllegalArgumentException](Md5SliceLong(expr.child, 0, 4))
    intercept[IllegalArgumentException](Md5SliceLong(expr.child, 30, 4))
    intercept[IllegalArgumentException](Md5SliceLong(expr.child, 1, 16))
  }

  test("min_md5_hex equals array_min(transform(arr, md5)) including " +
      "empty → null") {
    val df = Seq(
      Seq("a quick brown", "quick brown fox", "brown fox jumps"),
      Seq("one"),
      Seq.empty[String]).toDF("arr")
    val got = df.select(minMd5Hex(col("arr"))).collect()
    val want = df.select(array_min(transform(col("arr"), x => md5(x))))
      .collect()
    (got zip want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g.isNullAt(0) == w.isNullAt(0), s"row $i null mismatch")
      if (!g.isNullAt(0))
        assert(g.getString(0) == w.getString(0), s"row $i value mismatch")
    }
    assert(got(2).isNullAt(0), "empty array must yield null")
  }

  test("min_md5_hex: interpreted eval agrees; wrong type rejected") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val arr = new GenericArrayData(Array[Any](
      UTF8String.fromString("zebra"), UTF8String.fromString("apple")))
    val expr = MinMd5Hex(Literal.create(arr, ArrayType(StringType)))
    val viaEval = expr.eval(null).asInstanceOf[UTF8String].toString
    val viaDf = Seq(Seq("zebra", "apple")).toDF("a")
      .select(minMd5Hex(col("a"))).first().getString(0)
    assert(viaEval == viaDf)
    intercept[Exception] {
      Seq(Seq(1L)).toDF("a").select(minMd5Hex(col("a"))).collect()
    }
  }
}
