package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFns._

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("wordShingles: happy path, distinctness, short-doc guard") {
    val df = Seq(
      "a b c d",      // 2 distinct 3-grams
      "a b a b a b",  // duplicated shingles collapse
      "a b",          // < n tokens → empty
      "").toDF("text")
    val got = df.select(wordShinglesFromText(col("text"), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1).sorted == Seq("a b a", "b a b"))
    assert(got(2).isEmpty)
    assert(got(3).isEmpty)
  }

  test("jaccard: identical=1, disjoint=0") {
    val df = Seq(("x", "x")).toDF("a", "b")
    val j = df.select(jaccard(
      wordShinglesFromText(lit("a b c d e"), 3),
      wordShinglesFromText(lit("a b c d e"), 3))).first().getDouble(0)
    assert(j == 1.0)
    val j0 = df.select(jaccard(
      wordShinglesFromText(lit("a b c"), 3),
      wordShinglesFromText(lit("x y z"), 3))).first().getDouble(0)
    assert(j0 == 0.0)
  }

  test("minhash signatures: equal docs → equal sigs; sig length k") {
    val df = Seq("q w e r t y u i", "q w e r t y u i").toDF("text")
    val sigs = df.select(
      minHashSignature(shingleHashes(wordShinglesFromText(col("text"), 3)), 16).as("sig"))
      .as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0).length == 16)
  }

  test("simhash: identical docs collide; null on empty shingles") {
    val df = Seq("m n b v c x z", "m n b v c x z", "x").toDF("text")
    val fps = df.select(simHash(shingleHashes(wordShinglesFromText(col("text"), 3))).as("fp"))
      .collect()
    assert(fps(0).getLong(0) == fps(1).getLong(0))
    assert(fps(2).isNullAt(0))
  }
}
