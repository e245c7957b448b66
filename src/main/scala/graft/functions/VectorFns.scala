package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure Catalyst
  * expressions (SURVEY §2E). Elements are widened to double before any
  * arithmetic so accumulation is deterministic and oracle-comparable;
  * reductions are sequential left folds, matching DuckDB's list_* fold
  * order.
  */
object VectorFns {

  /** Widen a float vector to double — materialize once per row before
    * reuse (same compute-once discipline as TextFns). */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product of already-double arrays (no per-call widening) — the
    * native codegen expression; same sequential fold as DuckDB's
    * list_dot_product, so oracle parity holds bit-for-bit. */
  def dotD(a: Column, b: Column): Column = VectorExprs.dotProduct(a, b)

  /** Cosine from materialized double vectors + precomputed norms: one
    * fold per pair instead of three (norms are per-row, not per-pair).
    * Same arithmetic as cosine(), so oracle parity holds. */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    dotD(a, b) / nullif(na * nb, lit(0.0))

  /** Sequential-fold dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero-norm vectors: the denominator
    * nulls out instead of dividing by zero (which THROWS under Spark 4's
    * default ANSI mode), and null comparisons are false in both engines. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Sign-bit LSH bucket from `planes` deterministic pseudo-random
    * hyperplanes: plane p's component d is a hash-derived value in
    * [-0.5, 0.5); bucket = the concatenated sign bits. Seeded hashing
    * replaces RNG state so every executor derives identical planes. */
  def signLshBucket(v: Column, planes: Int): Column =
    signLshBucketSeeded(v, planes, lit(0))

  /** As signLshBucket, with a per-table seed column mixed into the plane
    * hashes — L independent hash tables for OR-amplified LSH. The plane
    * index range follows the VECTOR's length (a fixed dims constant
    * would null-pad short vectors through zip_with and poison the fold
    * into one degenerate bucket). */
  def signLshBucketSeeded(
      v: Column, planes: Int, seed: Column): Column = {
    val vd = asDouble(v)
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), size(vd) - 1), (x, d) =>
          x * (pmod(xxhash64(seed, lit(p), d), lit(1000L)).cast("double")
            / 1000.0 - 0.5)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
