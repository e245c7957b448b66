package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** THE money→cents extraction, centralized (r18 advice): every operator
  * that needs exact integer cents from a 2dp money double goes through
  * here, so the fast path's data contract lives in ONE place and is
  * CHECKED against footer statistics instead of assumed.
  *
  * Contract of [[centsFast]]: the column holds POSITIVE exact-2dp money
  * values ≤ [[maxFastValue]]. For such a value v (the nearest double to
  * an exact 2dp decimal), v·100 lands within ~1e-5 of the true cents
  * integer (|v| ≤ 1e9 keeps the accumulated double error ≤
  * 100·v·2⁻⁵²·k ≪ 0.5), so floor(v·100 + 0.5) IS that integer — the
  * same value `cast(v as decimal(18,2))·100` produces, at pure
  * double-multiply cost instead of a per-row BigDecimal round-trip
  * (measured ~30% of q1's wall, r18 batch 3). The cast-to-long
  * truncates toward zero, so a NEGATIVE value would round differently
  * from decimal HALF_UP (−1.005·100+0.5 = −99.9 → −99, not −100 —
  * the r18 advisor's refund example); that is why the fast path is
  * GATED, not assumed.
  *
  * [[cents]] picks the path from [[fastPathHolds]] — a driver-side
  * parquet-footer min/max check (Tables.columnMinMax; catalog metadata,
  * no job, memoized). Footers that are missing, untrusted, or show
  * min < 0 / max > maxFastValue fall back to the DECIMAL extraction,
  * which is exact for ANY 2dp value at BigDecimal cost. Both paths
  * yield the same long on contract-conforming data (MoneySpec). */
object Money {

  /** Fast-path envelope: |v| ≤ 1e9 keeps v·100 within ~1e-5 of the
    * true cents integer at double precision (comment above). */
  val maxFastValue: Double = 1e9

  /** floor(v·100 + 0.5) — exact cents ONLY under the positive-2dp
    * contract; callers gate on [[fastPathHolds]] (or a stronger
    * caller-proven bound) before using this directly. */
  def centsFast(c: Column): Column = (c * 100 + 0.5).cast("long")

  /** Exact cents through DECIMAL(18,2) — correct for any 2dp value
    * (HALF_UP ties, negatives included), per-row BigDecimal cost. */
  def centsDecimal(c: Column): Column =
    (c.cast(DecimalType(18, 2)) * 100).cast("long")

  /** Cents extraction with the contract check folded in. */
  def cents(c: Column, fastOk: Boolean): Column =
    if (fastOk) centsFast(c) else centsDecimal(c)

  /** Does the fast-path contract PROVABLY hold for `table.column` under
    * `dir`? True iff footer statistics exist, are trusted, and show
    * 0 ≤ min ∧ max ≤ [[maxFastValue]]. (The exact-2dp half of the
    * contract is the data model's own declaration — money columns are
    * written as 2dp — and is not checkable from footers; the sign and
    * magnitude halves, which decide rounding correctness, are.) */
  def fastPathHolds(s: SparkSession, dir: String, table: String,
      column: String): Boolean =
    graft.Tables.columnMinMax(s, dir, table, column)
      .exists { case (lo, hi) => lo >= 0.0 && hi <= maxFastValue }
}
