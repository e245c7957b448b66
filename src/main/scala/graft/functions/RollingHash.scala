package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash over a string's UTF-8 bytes:
  * h ← h·B + byte (wrapping), B = 1000003. A native Catalyst expression
  * with doGenCode so document fingerprinting (SURVEY §2F txt_fingerprint)
  * stays inside WholeStageCodegen — no UDF serialization, no boxing per
  * row. Deterministic across JVMs/executors (pure byte math).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash expects STRING, got ${child.dataType.catalogString}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      code"""
        byte[] $bytes = $c.getBytes();
        long $h = 0L;
        for (int $i = 0; $i < $bytes.length; $i++) {
          $h = $h * ${RollingHash.Base}L + (long)($bytes[$i] & 0xFF);
        }
        ${ev.value} = $h;
      """.toString
    })

  override protected def withNewChildInternal(newChild: Expression)
      : RollingHash = copy(child = newChild)
}

object RollingHash {
  val Base: Long = 1000003L

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * Base + (bytes(i) & 0xff)
      i += 1
    }
    h
  }

  /** Column-world entry point. */
  def rollingHash(c: Column): Column =
    GraftColumnBridge.toColumn(RollingHash(GraftColumnBridge.toExpression(c)))
}
