package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text-shaping Column builders (SURVEY §2D/§2F). Everything here
  * is built from codegen'd built-ins — no UDFs — so the hot paths stay
  * inside WholeStageCodegen.
  *
  * Cost discipline: expensive producers (tokenize, shingle, shingle-hash)
  * are designed to be materialized ONCE as named columns by callers —
  * Catalyst's CollapseProject keeps non-cheap expressions used more than
  * once in their own projection, so `withColumn("toks", tokens(c))` is a
  * real compute-once barrier. Re-splitting the text inside every lambda
  * element access was measured 3-30× slower at sf0.1.
  */
object TextFns {

  /** Whitespace tokens of a trimmed document. Materialize before reuse. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word n-gram shingles (space-joined, distinct) from a materialized
    * token-array column. Guarded so docs with fewer than n tokens yield
    * an empty array (Spark's sequence() would otherwise run backwards).
    * 1-based element_at matches DuckDB list indexing in the oracles. */
  def wordShingles(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - lit(n - 1)),
      i => concat_ws(" ",
        (0 until n).map(o => element_at(toks, i + lit(o))): _*))
    array_distinct(when(size(toks) >= n, grams)
      .otherwise(array().cast("array<string>")))
  }

  /** Convenience for tests / one-shot use: shingles straight from text.
    * Production operators materialize tokens first (see object doc). */
  def wordShinglesFromText(text: Column, n: Int): Column =
    wordShingles(tokens(text), n)

  /** One 64-bit content hash per shingle — the ONLY string hashing pass;
    * every MinHash/SimHash derivation below works on these longs. */
  def shingleHashes(shingles: Column): Column =
    transform(shingles, x => xxhash64(x))

  /** Seeded permutation family over the precomputed longs: xxhash64 on an
    * 8-byte value (cheap, and overflow-free under ANSI mode — a raw
    * multiply-shift would throw on long overflow in Spark 4). */
  private def perm(h: Column, i: Int): Column = xxhash64(lit(i), h)

  /** MinHash signature from a materialized shingle-hash column. */
  def minHashSignature(hs: Column, k: Int): Column =
    array((0 until k).map(i => array_min(transform(hs, h => perm(h, i)))): _*)

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

  /** 64-bit SimHash from a materialized shingle-hash column: majority
    * vote per bit over the shingles' hashes — long shifts only. */
  def simHash(hs: Column): Column = {
    val n = size(hs)
    val bitSums = (0 until 64).map { i =>
      aggregate(hs, lit(0L),
        (acc, h) => acc + shiftright(h, i).bitwiseAND(lit(1L)))
    }
    val fp = bitSums.zipWithIndex.map { case (cnt, i) =>
      when(cnt * 2 > n.cast("long"), shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    when(n > 0, fp)
  }
}
