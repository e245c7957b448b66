package graft

import org.apache.spark.sql.functions._

/** Throwaway r18 probe 2: decompose the doc-artifacts base stage. */
object LandProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.local(32)
    s.sparkContext.setLogLevel("ERROR")
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name%-36s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    import graft.functions.TextFns._
    def sel(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("source"), col("n_chars"),
        tokens(col("text")).as("toks"), md5(col("text")).as("h"),
        md5(lower(regexp_replace(trim(col("text")), "\\s+", " ")))
          .as("norm_h"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    t("scan only noop")(noop(Tables.documents(s, dir)))
    t("select noop, no spread")(noop(sel(Tables.documents(s, dir))))
    val spread = Tables.spreadScan(s, s"$dir/documents.parquet",
      Tables.documents(s, dir))
    t("select noop, spread")(noop(sel(spread)))
    t("select noop, spread 2nd")(noop(sel(spread)))
    t("tokens only, spread")(noop(spread.select(tokens(col("text")).as("t"))))
    t("md5 only, spread")(noop(spread.select(md5(col("text")).as("h"))))
    t("normh only, spread")(noop(spread.select(
      md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("h"))))
    t("localCheckpoint")(sel(spread).localCheckpoint())
    t("localCheckpoint 2nd")(sel(spread).localCheckpoint())
    s.stop()
  }
}
