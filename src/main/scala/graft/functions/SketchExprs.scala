package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sketch expressions (SURVEY §2D): MinHash signatures and SimHash
  * fingerprints as single-pass primitive loops with doGenCode. The
  * higher-order-function formulations (k × array_min(transform(...)))
  * evaluate interpreted lambdas per element — measured ~10s per op at
  * sf0.1; these run the same math as JIT'd long arithmetic in one pass.
  * NOTE: the permutation family here (XXH64.hashLong(h, seed=i))
  * intentionally differs from TextFns.perm (Spark's xxhash64 chains from
  * seed 42) — never band-join signatures from the two formulations.
  */

/** k-permutation MinHash signature over an array<long> of shingle hashes:
  * sig[i] = min over h of xxhash64(h, seed=i). Null/empty input → null. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects ARRAY<BIGINT>, got ${t.catalogString}")
  }
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < k) {
        val p = XXH64.hashLong(h, i.toLong)
        if (p < sig(i)) sig(i) = p
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      code"""
        int $n = $c.numElements();
        if ($n == 0) { ${ev.isNull} = true; } else {
          long[] $sig = new long[$k];
          java.util.Arrays.fill($sig, Long.MAX_VALUE);
          for (int $j = 0; $j < $n; $j++) {
            long $h = $c.getLong($j);
            for (int $i = 0; $i < $k; $i++) {
              long $p = $xxh.hashLong($h, (long) $i);
              if ($p < $sig[$i]) $sig[$i] = $p;
            }
          }
          ${ev.value} = new $gad($sig);
        }
      """.toString
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSig = copy(child = newChild)
}

/** 64-bit SimHash over an array<long> of shingle hashes: majority vote per
  * bit. Null/empty input → null. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects ARRAY<BIGINT>, got ${t.catalogString}")
  }
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val cnt = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < 64) {
        cnt(i) += ((h >>> i) & 1L).toInt
        i += 1
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (cnt(i) * 2 > n) fp |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val fp = ctx.freshName("fp")
      code"""
        int $n = $c.numElements();
        if ($n == 0) { ${ev.isNull} = true; } else {
          int[] $cnt = new int[64];
          for (int $j = 0; $j < $n; $j++) {
            long $h = $c.getLong($j);
            for (int $i = 0; $i < 64; $i++) {
              $cnt[$i] += (int) (($h >>> $i) & 1L);
            }
          }
          long $fp = 0L;
          for (int $i = 0; $i < 64; $i++) {
            if ($cnt[$i] * 2 > $n) $fp |= (1L << $i);
          }
          ${ev.value} = $fp;
        }
      """.toString
    })

  override protected def withNewChildInternal(newChild: Expression)
      : SimHash64 = copy(child = newChild)
}

object SketchExprs {
  def minhashSig(hs: Column, k: Int): Column =
    GraftColumnBridge.toColumn(
      MinHashSig(GraftColumnBridge.toExpression(hs), k))
  def simhash64(hs: Column): Column =
    GraftColumnBridge.toColumn(
      SimHash64(GraftColumnBridge.toExpression(hs)))
}
