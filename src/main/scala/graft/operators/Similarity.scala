package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.VectorFns

/** Similarity-search block (SURVEY §2E) over the `embeddings` table.
  * Brute force is the correctness baseline (and the oracle); LSH and IVF
  * are the 100 TB paths — each vector lands in O(1) buckets, per-bucket
  * local top-k, global merge (SURVEY §4).
  */
object Similarity {

  private val K = 10
  /** Query set: a fixed, small id prefix — broadcast side of every probe. */
  private def querySet(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

  /** Exact brute-force cosine top-k per query. The query side is tiny and
    * broadcast; the corpus is scanned once — this is the oracle baseline,
    * not the scale path. Ranking uses the rounded score with id tie-break
    * so ordering is reproducible across engines. */
  def bruteForceTopk(s: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.embeddings(s, dir)
      .select(col("vec_id").as("neighbor_id"), col("embedding"))
    val scored = broadcast(querySet(s, dir))
      .join(corpus, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorFns.cosine(col("q_emb"), col("embedding")), 6)
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
  }

  /** Sign-LSH approximate top-k: L=2 independent hash tables of 4
    * hyperplane sign bits each (OR-amplification — a candidate matches if
    * it collides in ANY table); queries probe only their own buckets.
    * Plane count scales with corpus size (log₂(n/target_bucket)); recall
    * is spec-checked against brute force. */
  def lshTopk(s: SparkSession, dir: String): DataFrame = {
    val planes = 4
    val tables = 2
    def bucketed(df: DataFrame, emb: String): DataFrame =
      df.withColumn("table_id",
        explode(array((0 until tables).map(lit(_)): _*)))
        .withColumn("bucket",
          // per-table plane family: offset the plane index by table
          VectorFns.signLshBucketSeeded(col(emb), planes, 64, col("table_id")))
    val corpus = bucketed(Tables.embeddings(s, dir)
      .select(col("vec_id").as("neighbor_id"), col("embedding")), "embedding")
    val qs = bucketed(querySet(s, dir), "q_emb")
    val scored = broadcast(qs)
      .join(corpus, Seq("table_id", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("q_emb"), col("neighbor_id"),
        col("embedding"))
      .distinct()
      .select(col("query_id"), col("neighbor_id"),
        round(VectorFns.cosine(col("q_emb"), col("embedding")), 6)
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
  }

  /** IVF-style approximate top-k: coarse centroids are a deterministic
    * strided sample of the corpus (kmeans-lite single assignment); every
    * vector joins its nearest cell, queries probe `nprobe` nearest cells.
    * Two broadcast joins + one windowed top-k — no cross product. */
  def ivfTopk(s: SparkSession, dir: String): DataFrame = {
    val nprobe = 4
    val centroids = Tables.embeddings(s, dir)
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cell_id"), col("embedding").as("c_emb"))
    // assign corpus vectors to their nearest centroid
    val assignW = Window.partitionBy(col("neighbor_id"))
      .orderBy(col("sim").desc, col("cell_id"))
    val assigned = Tables.embeddings(s, dir)
      .select(col("vec_id").as("neighbor_id"), col("embedding"))
      .crossJoin(broadcast(centroids))
      .select(col("neighbor_id"), col("embedding"), col("cell_id"),
        VectorFns.cosine(col("embedding"), col("c_emb")).as("sim"))
      .withColumn("rn", row_number().over(assignW))
      .filter(col("rn") === 1)
      .select(col("neighbor_id"), col("embedding"), col("cell_id"))
    // queries probe their nprobe nearest cells
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cell_id"))
    val probes = querySet(s, dir)
      .crossJoin(broadcast(centroids))
      .select(col("query_id"), col("q_emb"), col("cell_id"),
        VectorFns.cosine(col("q_emb"), col("c_emb")).as("sim"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("cell_id"))
    val scored = broadcast(probes)
      .join(assigned, Seq("cell_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorFns.cosine(col("q_emb"), col("embedding")), 6)
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce_topk" -> (bruteForceTopk _),
    "ann_lsh_topk" -> (lshTopk _),
    "ann_ivf_topk" -> (ivfTopk _))

  val oracles: Map[String, String] = Map(
    "ann_bruteforce_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q_emb
        |  FROM embeddings WHERE vec_id < 5),
        |c AS (
        |  SELECT vec_id AS neighbor_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    ROUND(list_dot_product(q_emb, emb)
        |      / (sqrt(list_dot_product(q_emb, q_emb))
        |         * sqrt(list_dot_product(emb, emb))), 6) AS cosine
        |  FROM q, c WHERE neighbor_id <> query_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 10""".stripMargin)
}
