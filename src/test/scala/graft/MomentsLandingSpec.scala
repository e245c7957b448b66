package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Similarity

/** The shared embedding-moments landing (r12): the landed tables must
  * equal the inline explode-based aggregates byte for byte — the
  * emb_covariance / emb_dim_stats / emb_pca_project hash oracles all
  * recompute from the raw embeddings in DuckDB, so any drift between
  * the scaled-integer fold and the round→DECIMAL→SUM discipline it
  * replaces shows up here before it shows up as a driver hash miss. */
class MomentsLandingSpec extends SparkSpec {

  test("landed moment tables equal the inline decimal aggregates " +
      "byte for byte") {
    Similarity.clearMomentsMemo()
    Similarity.ensureMomentsLanded(spark, sfTiny)

    val exploded = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "xf")))
      .select(col("vec_id"), col("i"), col("xf").cast("double").as("x"))

    // embdim vs the inline per-dim aggregate (the pre-r12 dimStats plan)
    val gotDim = spark.read.parquet(Similarity.dimDir(sfTiny))
      .select(col("dim"), col("n_vecs"),
        col("sum_x").cast("double"), col("sum_abs_x").cast("double"),
        col("min_x"), col("max_x"))
      .orderBy(col("dim")).collect().map(_.toSeq)
    val wantDim = exploded
      .groupBy(col("i"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(round(col("x"), 9).cast(DecimalType(18, 9)))
          .cast("double").as("sum_x"),
        sum(round(abs(col("x")), 9).cast(DecimalType(18, 9)))
          .cast("double").as("sum_abs_x"),
        min(col("x")).as("min_x"),
        max(col("x")).as("max_x"))
      .select(col("i").cast("int"), col("n_vecs"), col("sum_x"),
        col("sum_abs_x"), col("min_x"), col("max_x"))
      .orderBy(col("i")).collect().map(_.toSeq)
    assert(gotDim.length == 64)
    assert(gotDim.toSeq == wantDim.toSeq)

    // embmom vs the inline upper-triangle product aggregate (the r8
    // n·d²-row explode the fold replaced — fine at sf0.001 test scale)
    val gotMom = spark.read.parquet(Similarity.momDir(sfTiny))
      .select(col("i"), col("j"), col("n_vecs"),
        col("sum_xy").cast("double"))
      .orderBy(col("i"), col("j")).collect().map(_.toSeq)
    val wantMom = exploded.as("a")
      .join(exploded.as("b"), col("a.vec_id") === col("b.vec_id")
        && col("a.i") <= col("b.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(round(col("a.x") * col("b.x"), 9).cast(DecimalType(18, 9)))
          .cast("double").as("sum_xy"))
      .orderBy(col("i"), col("j")).collect().map(_.toSeq)
    assert(gotMom.length == 64 * 65 / 2)
    assert(gotMom.toSeq == wantMom.toSeq)
  }

  test("consumers ride one landing: covariance and dim stats read the " +
      "landed tables, and their joint values stay self-consistent") {
    // variance from the mom diagonal must equal the dimStats-derived
    // variance term for every dim (the pca eigensolve depends on the
    // two tables agreeing — they are one fold, so this is a structural
    // identity, not a tolerance check)
    val mom = spark.read.parquet(Similarity.momDir(sfTiny))
    val dim = spark.read.parquet(Similarity.dimDir(sfTiny))
    val joined = mom.filter(col("i") === col("j"))
      .select(col("i").as("dim"), col("n_vecs").as("n_mom"),
        col("sum_xy").cast("double").as("sum_xx"))
      .join(dim.select(col("dim"), col("n_vecs").as("n_dim"),
        col("sum_x").cast("double").as("sum_x")), "dim")
      .collect()
    assert(joined.length == 64)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_mom") == r.getAs[Long]("n_dim"))
      val n = r.getAs[Long]("n_dim").toDouble
      val v = r.getAs[Double]("sum_xx") / n -
        math.pow(r.getAs[Double]("sum_x") / n, 2)
      // v ≥ 0 is the STRUCTURAL identity (E[x²] ≥ E[x]² up to the 9dp
      // landing quantization); strict positivity would be a property of
      // this corpus, not of the landing — a future test table with a
      // constant (dead) dimension must not fail here
      assert(v >= -1e-9, s"negative variance at dim ${r.getAs[Int]("dim")}")
    }
  }

  test("moments memo re-lands when the embeddings table is rewritten") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mom")
    val dir = tmp.toString
    def land(n: Int): Unit =
      Tables.embeddings(spark, sfTiny).limit(n)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    land(10)
    assert(Similarity.dimStats(spark, dir)
      .select(max(col("n_vecs"))).collect()(0).getLong(0) == 10)
    Thread.sleep(5) // mtime granularity guard
    land(20)
    assert(Similarity.dimStats(spark, dir)
      .select(max(col("n_vecs"))).collect()(0).getLong(0) == 20,
      "rewritten embeddings must re-land (fingerprint-keyed memo)")
  }
}
