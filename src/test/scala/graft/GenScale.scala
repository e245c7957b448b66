package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10× scale-up of an existing SF directory — the sf1
  * evidence generator behind the "constants amortize at scale" claim
  * (r10 verdict item 3). NOT a driver-testdata replacement: the driver's
  * sf dirs are read-only and its seed/distributions are its own; this
  * tool replicates an existing dir k× with per-replica perturbation so
  * relative distributions, FK structure and dup-rates survive the
  * scale-up, writing under target/ (never committed, never shipped).
  *
  * Perturbation discipline (the StressSpec near-linear test's, extended
  * to every table):
  *  - all keys offset by replica·10⁷ — FK edges (orders→customer,
  *    lineitem→orders/part/supplier, events→user) follow their replica;
  *  - money-ish doubles get +replica·0.01, ROUNDED back to 2dp so the
  *    stored doubles stay canonical 2dp values (a raw double add emits
  *    84197.12999999999, whose double→decimal cast rounds differently
  *    across engines), and replicas don't create exact cross-replica
  *    ties that a tie-sensitive top-k could order differently;
  *  - document text gets a per-replica VOCABULARY rename (every token
  *    suffixed; replica 0 = identity), so the 10× corpus keeps the 1×
  *    shingle dup-rate and bucket-width distribution; n_chars is
  *    recomputed to stay consistent with the perturbed text;
  *  - embeddings get a per-dimension nudge so replicas don't stack into
  *    single cosine-identical LSH buckets;
  *  - dimension tables bounded by the world, not the data (region,
  *    nation), are copied as-is — scale factor does not grow them.
  *
  * Usage: sbt "Test/runMain graft.GenScale <srcDir> <dstDir> [k]"
  */
object GenScale {

  private val Off = 10000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.drop(1).headOption
      .getOrElse("/root/repo/target/testdata/sf1")
    val k = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    // optional comma-list table filter (e.g. "embeddings" for the
    // quantizer-family k-cap probe — replicating 10M events to study a
    // 200k-vector training curve would be pure waste)
    val onlyT = args.drop(3).headOption.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    // the driver's layout is one parquet FILE per table (TESTDATA.md),
    // and the streaming ops' pathGlobFilter depends on it — write via a
    // temp dir and move the single part file into place
    def write(name: String, df: => DataFrame): Unit =
      if (onlyT.forall(_.contains(name))) writeAll(name, df)
    def writeAll(name: String, df: DataFrame): Unit = {
      val tmp = s"$dst/__tmp_$name"
      // one FILE per table (driver layout), but MANY row groups: a
      // single 128MB-default row group makes the whole table one
      // unsplittable scan task in every engine — a layout no real
      // deployment produces and one that serializes the scan stage of
      // every op (profiled: q1 at sf1 spent ~8s in its one scan task).
      // 2MB groups give the scan planner real split points.
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", (2 * 1024 * 1024).toString)
        .parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file for $name"))
      val target = new java.io.File(s"$dst/$name.parquet")
      if (target.exists()) target.delete()
      java.nio.file.Files.move(part.toPath, target.toPath)
      new java.io.File(tmp).listFiles().foreach(_.delete())
      new java.io.File(tmp).delete()
      println(s"[genscale] $name: ${spark.read
        .parquet(s"$dst/$name.parquet").count()} rows")
    }
    def replicate(df: DataFrame)(f: (DataFrame, Int) => DataFrame)
        : DataFrame =
      (0 until k).map(i => f(df, i)).reduce(_ unionAll _)

    // world-bounded dimensions: copy
    write("region", read("region"))
    write("nation", read("nation"))

    write("customer", replicate(read("customer")) { (d, i) =>
      d.select((col("c_custkey") + lit(i * Off)).as("c_custkey"),
        col("c_name"), col("c_nationkey"),
        round(col("c_acctbal") + lit(i * 0.01), 2).as("c_acctbal"),
        col("c_mktsegment"))
    })
    write("supplier", replicate(read("supplier")) { (d, i) =>
      d.select((col("s_suppkey") + lit(i * Off)).as("s_suppkey"),
        col("s_name"), col("s_nationkey"),
        round(col("s_acctbal") + lit(i * 0.01), 2).as("s_acctbal"))
    })
    write("part", replicate(read("part")) { (d, i) =>
      d.select((col("p_partkey") + lit(i * Off)).as("p_partkey"),
        col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
        round(col("p_retailprice") + lit(i * 0.01), 2).as("p_retailprice"))
    })
    write("orders", replicate(read("orders")) { (d, i) =>
      d.select((col("o_orderkey") + lit(i * Off)).as("o_orderkey"),
        (col("o_custkey") + lit(i * Off)).as("o_custkey"),
        col("o_orderstatus"),
        round(col("o_totalprice") + lit(i * 0.01), 2).as("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
    })
    write("lineitem", replicate(read("lineitem")) { (d, i) =>
      d.select((col("l_orderkey") + lit(i * Off)).as("l_orderkey"),
        (col("l_partkey") + lit(i * Off)).as("l_partkey"),
        (col("l_suppkey") + lit(i * Off)).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"),
        round(col("l_extendedprice") + lit(i * 0.01), 2).as("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    })
    write("events", replicate(read("events")) { (d, i) =>
      d.select((col("event_id") + lit(i * Off)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(i * Off)).as("user_id"),
        col("event_type"),
        round(col("value") + lit(i * 0.01), 2).as("value"),
        col("props"))
    })
    write("documents", replicate(read("documents")) { (d, i) =>
      // per-replica VOCABULARY rename (every token suffixed), not a
      // spliced marker token: a splice like " q3 " puts the same
      // "q3 <word> q3" shingles in every replica-3 doc, which collapses
      // the min-md5 shingle buckets into corpus-wide storms (quadratic
      // candidate pairs — the brute-force DuckDB oracles never finish).
      // Suffixing keeps the shingle structure isomorphic to the source
      // corpus: within-replica dup-rate identical, cross-replica vocab
      // disjoint, bucket widths distributed like the original's.
      val text = if (i == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", s"$$1x$i")
      d.select((col("doc_id") + lit(i * Off)).as("doc_id"),
        text.as("text"), col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    })
    write("embeddings", replicate(read("embeddings")) { (d, i) =>
      d.select((col("vec_id") + lit(i * Off)).as("vec_id"),
        transform(col("embedding"), (x, j) =>
          (x + lit(0.002f) * lit(i.toFloat) *
            (pmod(j, lit(7)).cast("float") - lit(3.0f))).cast("float"))
          .as("embedding"),
        col("label"))
    })
    spark.stop()
  }
}
