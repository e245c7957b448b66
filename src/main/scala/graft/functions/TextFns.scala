package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text-shaping Column builders (SURVEY §2D/§2F). Everything here
  * is built from codegen'd built-ins — no UDFs — so the hot paths stay
  * inside WholeStageCodegen.
  */
object TextFns {

  /** Whitespace tokens of a trimmed document. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word n-gram shingles (space-joined), distinct. Guarded so docs with
    * fewer than n tokens yield an empty array (Spark's sequence() would
    * otherwise run backwards). 1-based element_at matches DuckDB list
    * indexing in the oracles. */
  def wordShingles(text: Column, n: Int): Column = {
    val w = tokens(text)
    val grams = transform(
      sequence(lit(1), size(w) - lit(n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(w, i + lit(o))): _*))
    array_distinct(when(size(w) >= n, grams)
      .otherwise(array().cast("array<string>")))
  }

  /** k seeded 64-bit hashes of a shingle: xxhash64 with the seed mixed in
    * as a leading column — k independent permutation families for MinHash. */
  def seededHash(seed: Int, c: Column): Column = xxhash64(lit(seed), c)

  /** MinHash signature: array of k per-seed minima over the shingle set.
    * Pure expression tree (k × array_min(transform(...))) — no explode, no
    * shuffle; empty shingle sets give null signature entries. */
  def minHashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(shingles, x => seededHash(i, x)))): _*)

  /** LSH band hashes: the signature is cut into `bands` rows of length
    * `r`; each band re-hashed to one 64-bit bucket key. */
  def bandHashes(sig: Column, bands: Int, r: Int): Column =
    array((0 until bands).map(b =>
      xxhash64(lit(b) +: (0 until r).map(j =>
        element_at(sig, b * r + j + 1)): _*)): _*)

  /** Exact Jaccard of two distinct-element arrays, rounded for
    * cross-engine double parity. */
  def jaccard(a: Column, b: Column): Column =
    round(size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double"), 6)

  /** 64-bit SimHash from a shingle array: majority vote per bit over the
    * shingles' xxhash64 values. Expression-only: for each bit i, count
    * shingles with bit i set; set fp bit where count*2 > n. */
  def simHash(shingles: Column): Column = {
    val n = size(shingles)
    val bitSums = (0 until 64).map { i =>
      aggregate(shingles, lit(0L),
        (acc, x) => acc + shiftright(xxhash64(x), i).bitwiseAND(lit(1L)))
    }
    val fp = bitSums.zipWithIndex.map { case (cnt, i) =>
      when(cnt * 2 > n.cast("long"), shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    when(n > 0, fp)
  }
}
