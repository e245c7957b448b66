package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native md5 sampling/bucketing expressions.
  *
  * The engine's deterministic sampling convention is "integer value of a
  * SLICE of the md5 hex digest" (SURVEY §5: cross-engine exact, no RNG).
  * The built-in spelling `conv(substring(md5(x), p, l), 16, 10)` is
  * semantically right but pays, PER ROW: a MessageDigest provider lookup
  * (commons-codec creates a new digest each call), a 32-char hex string,
  * a substring copy, and a radix parse — measured ~3× the digest's own
  * cost on the q19/q20 sketch scans. These expressions compute the same
  * values from the raw 16-byte digest with a REUSED MessageDigest
  * instance (one per operator via codegen mutable state; thread-local in
  * interpreted eval) and no intermediate strings.
  *
  * Oracle parity: a slice of the hex digest read as base-16 equals the
  * corresponding nibbles of the digest read big-endian — both engines
  * agree bit for bit, and the DuckDB side keeps the md5()/substring
  * spelling.
  */
object HashExprs {
  /** One reusable MD5 instance per (thread | codegen operator). */
  def newDigest(): java.security.MessageDigest =
    java.security.MessageDigest.getInstance("MD5")
  private val local =
    ThreadLocal.withInitial[java.security.MessageDigest](() => newDigest())

  /** Long value of hex digits [pos, pos+len) (1-based, ≤ 15 digits) of
    * md5's 32-digit hex form — computed from the digest bytes. */
  def md5Slice(md: java.security.MessageDigest, bytes: Array[Byte],
      pos: Int, len: Int): Long = {
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = pos - 1
    val end = pos - 1 + len
    while (i < end) {
      val b = d(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }
  def md5SliceLocal(bytes: Array[Byte], pos: Int, len: Int): Long =
    md5Slice(local.get(), bytes, pos, len)

  /** Minimum md5 over an array of strings, returned as the digest's
    * lowercase-hex form. Min over raw digests compared as UNSIGNED
    * bytes ≡ min over hex strings (lowercase hex is monotone in the
    * digest value), so one hex encode happens at the end instead of one
    * per element. Empty/null array → null (array_min convention). */
  def minMd5(md: java.security.MessageDigest, arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    if (n == 0) return null
    var best: Array[Byte] = null
    var j = 0
    while (j < n) {
      // shingle arrays are containsNull=false by construction; a null
      // element would have made the md5 lambda null-propagate, which
      // array_min skips — matched here by skipping nulls
      if (!arr.isNullAt(j)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(j).getBytes)
        if (best == null || unsignedLess(d, best)) best = d
      }
      j += 1
    }
    if (best == null) null else UTF8String.fromString(toHex(best))
  }
  def minMd5Local(arr: ArrayData): UTF8String = minMd5(local.get(), arr)

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }
  private def toHex(d: Array[Byte]): String = {
    val hex = "0123456789abcdef"
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def md5SliceLong(c: Column, pos: Int, len: Int): Column =
    GraftColumnBridge.toColumn(
      Md5SliceLong(GraftColumnBridge.toExpression(c), pos, len))
  def minMd5Hex(c: Column): Column =
    GraftColumnBridge.toColumn(
      MinMd5Hex(GraftColumnBridge.toExpression(c)))
}

/** conv(substring(md5(child), pos, len), 16, 10) :: BIGINT, digest-direct
  * (see HashExprs). len ≤ 15 keeps the value positive in a long. */
case class Md5SliceLong(child: Expression, pos: Int, len: Int)
    extends UnaryExpression {
  require(pos >= 1 && len >= 1 && pos + len <= 33 && len <= 15,
    s"md5 hex slice out of range: pos=$pos len=$len")
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_slice_long expects STRING, got ${t.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    HashExprs.md5SliceLocal(
      input.asInstanceOf[UTF8String].getBytes, pos, len)
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val he = "graft.functions.HashExprs"
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v => s"$v = $he.newDigest();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $he.md5Slice($md, $c.getBytes(), $pos, $len);")
  }
  override protected def withNewChildInternal(
      newChild: Expression): Md5SliceLong = copy(child = newChild)
  override def prettyName: String = "md5_slice_long"
}

/** array_min(transform(child, x -> md5(x))), digest-direct: one hex
  * encode total instead of one 32-char string per element (see
  * HashExprs.minMd5). */
case class MinMd5Hex(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_md5_hex expects ARRAY<STRING>, got ${t.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    HashExprs.minMd5Local(input.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val he = "graft.functions.HashExprs"
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v => s"$v = $he.newDigest();")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $he.minMd5($md, $c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }
  override protected def withNewChildInternal(
      newChild: Expression): MinMd5Hex = copy(child = newChild)
  override def prettyName: String = "min_md5_hex"
}
