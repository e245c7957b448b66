package graft.functions

import java.util.{HashSet => JHashSet}

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingle hashes straight from a token array: each
  * n-gram is hashed by chaining xxhash64 over its tokens' bytes — the
  * intermediate shingle strings (concat + array_distinct, interpreted
  * per element) never materialize. Feeds MinHashSig / SimHash64 for the
  * sketch-based dedup ops; the string-shingle path (TextFns.wordShingles)
  * remains for the oracle-checked exact-Jaccard operators.
  *
  * Interpreted-eval only (no doGenCode): the per-row work is one tight
  * JVM loop already, so codegen would only inline the same calls.
  */
case class ShingleHash64(child: Expression, n: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash64 expects ARRAY<STRING>, got ${t.catalogString}")
  }
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nTok = arr.numElements()
    if (nTok < n) return new GenericArrayData(Array.empty[Long])
    // hash each token once, then chain per gram
    val th = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      val t = arr.getUTF8String(i)
      th(i) =
        if (t == null) 0L
        else XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
          t.numBytes(), 42L)
      i += 1
    }
    val seen = new JHashSet[java.lang.Long]()
    val out = new Array[Long](nTok - n + 1)
    var m = 0
    i = 0
    while (i <= nTok - n) {
      var h = 42L
      var o = 0
      while (o < n) {
        h = XXH64.hashLong(th(i + o), h)
        o += 1
      }
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ShingleHash64 = copy(child = newChild)
}

object ShingleHash64 {
  def shingleHash64(toks: Column, n: Int): Column =
    GraftColumnBridge.toColumn(
      ShingleHash64(GraftColumnBridge.toExpression(toks), n))
}
