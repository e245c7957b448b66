package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Inventory-sync guard — the same checks as OperatorsSpec's survey
    * guard, run at driver time: a red test nobody runs must still show
    * up loudly in CORRECTNESS output. Returns one message per drift. */
  private[graft] def surveyDrift(
      surveyPath: String = "/root/repo/SURVEY.md"): Seq[String] =
    try {
      val survey = {
        val src = scala.io.Source.fromFile(surveyPath, "UTF-8")
        try src.mkString finally src.close()
      }
      val section = survey.substring(
        survey.indexOf("## §2"), survey.indexOf("## §3"))
      val listed = "- \\[x\\] `([a-z0-9_]+)`".r
        .findAllMatchIn(section).map(_.group(1)).toSet
      val implemented = SparkEntry.queries.keySet
      val marked = section.split("- \\[x\\] `").drop(1).collect {
        case e if e.contains("*(rows-only)*") => e.takeWhile(_ != '`')
      }.toSet
      val noOracle = implemented -- SparkEntry.oracleSql.keySet
      def msg(label: String, names: Set[String]): Seq[String] =
        if (names.isEmpty) Nil
        else Seq(s"$label: ${names.toSeq.sorted.mkString(", ")}")
      msg("in SURVEY §2 but not implemented", listed -- implemented) ++
        msg("implemented but not in SURVEY §2", implemented -- listed) ++
        msg("marked rows-only but oracled", marked -- noOracle) ++
        msg("no oracle but not marked rows-only", noOracle -- marked)
    } catch { case e: Throwable => Seq(s"guard could not run: $e") }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    surveyDrift().foreach(m => System.err.println(s"[verify] SURVEY_DRIFT $m"))
    // optional third arg (local iteration only; the driver passes two):
    // comma-list of query names to dump
    val only = args.drop(2).headOption.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally Caches.release(spark) // ops persist/checkpoint derived tables
    }
    // JSON string escape (shared with Bench): backslash, quote, and ALL
    // control chars (<0x20) — a tab or CR in builder-authored SQL would
    // otherwise make the driver's json.load fail and silently zero the
    // round's correctness.
    val json = SparkEntry.oracleSqlFor(sfDir)
      .map { case (k, v) => s"${Bench.jstr(k)}: ${Bench.jstr(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
