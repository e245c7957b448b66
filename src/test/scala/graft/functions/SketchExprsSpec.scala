package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFns._
import graft.functions.SketchExprs._

class SketchExprsSpec extends SparkSpec {
  import spark.implicits._

  private def hs = shingleHashes(wordShinglesFromText(col("text"), 3))

  test("minhash_sig: k minima, equal docs agree, empty → null") {
    val df = Seq("q w e r t y", "q w e r t y", "x").toDF("text")
    val rows = df.select(minhashSig(hs, 16).as("sig")).collect()
    assert(rows(0).getSeq[Long](0).length == 16)
    assert(rows(0).getSeq[Long](0) == rows(1).getSeq[Long](0))
    assert(rows(2).isNullAt(0))
  }

  test("minhash_sig: codegen and interpreted agree") {
    val df = Seq("a b c d e f g").toDF("text")
    val viaCodegen = df.select(minhashSig(hs, 8)).first().getSeq[Long](0)
    val hsVals = df.select(hs).first().getSeq[Long](0)
    val expected = (0 until 8).map(i =>
      hsVals.map(h => org.apache.spark.sql.catalyst.expressions.XXH64
        .hashLong(h, i.toLong)).min)
    assert(viaCodegen == expected)
  }

  test("simhash64: identical docs collide, near-identical docs are close") {
    val df = Seq(
      "m n b v c x z l k j h g f d s",
      "m n b v c x z l k j h g f d s",
      "m n b v c x z l k j h g f d a").toDF("text")
    val fps = df.select(simhash64(hs).as("fp")).collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    assert(java.lang.Long.bitCount(fps(0) ^ fps(2)) < 32)
  }

  test("simhash64: empty shingles → null; wrong type rejected") {
    val empty = Seq("x").toDF("text")
    assert(empty.select(simhash64(hs)).first().isNullAt(0))
    intercept[Exception] {
      Seq(1L).toDF("x").select(simhash64(col("x"))).collect()
    }
  }
}
