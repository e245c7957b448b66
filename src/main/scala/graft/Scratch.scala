package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFns._

/** Throwaway probe (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val base = Tables.documents(spark, dir).select(
      col("doc_id"), wordShingles(col("text"), 3).as("shingles"))
    time("shingle+minhash sig compute")(
      base.withColumn("sig", minHashSignature(col("shingles"), 32))
        .select(sum(size(col("sig")))).first())
    val bucketed = base
      .withColumn("bucket", array_min(transform(col("shingles"), x => md5(x))))
    time("bucket counts")(
      bucketed.groupBy("bucket").count().orderBy(col("count").desc).show(5))
    val ids = bucketed.select(col("doc_id").as("da"), col("bucket"))
    val ids2 = bucketed.select(col("doc_id").as("db"), col("bucket"))
    time("ngram pair count")(
      println("pairs=" + ids.join(ids2, "bucket").filter(col("da") < col("db")).count()))
    // minhash band pairs
    val banded = base.filter(size(col("shingles")) > 0)
      .withColumn("sig", minHashSignature(col("shingles"), 32))
      .select(col("doc_id"),
        posexplode(bandHashes(col("sig"), 8, 4)).as(Seq("band_id", "band_hash")))
    val ba = banded.select(col("band_id"), col("band_hash"), col("doc_id").as("da"))
    val bb = banded.select(col("band_id"), col("band_hash"), col("doc_id").as("db"))
    time("minhash band pair count")(
      println("pairs=" + ba.join(bb, Seq("band_id", "band_hash"))
        .filter(col("da") < col("db")).count()))
    // simhash chunk pairs
    val fps = base.filter(size(col("shingles")) > 0)
      .withColumn("fp", simHash(col("shingles")))
    time("simhash fp compute")(fps.select(sum(col("fp"))).first())
    val chunked = fps.select(col("doc_id"), col("fp"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("fp"), i * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk_id", "chunk_val")))
    val ca = chunked.select(col("chunk_id"), col("chunk_val"), col("doc_id").as("da"))
    val cb = chunked.select(col("chunk_id"), col("chunk_val"), col("doc_id").as("db"))
    time("simhash chunk pair count")(
      println("pairs=" + ca.join(cb, Seq("chunk_id", "chunk_val"))
        .filter(col("da") < col("db")).count()))
    spark.stop()
  }
}
