package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All language-profile scores in one pass over the token array: for
  * each token, one hash probe per profile — replaces k interpreted
  * filter(x -> array_contains(profile, x)) HOFs (k passes × linear
  * membership scans). Interpreted-eval (CodegenFallback): the per-row
  * work is already a single tight loop over prebuilt hash sets.
  */
case class ProfileScores(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"profile_scores expects ARRAY<STRING>, got ${t.catalogString}")
  }

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    profiles.map { ws =>
      val s = new java.util.HashSet[UTF8String]()
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](sets.length)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        var p = 0
        while (p < sets.length) {
          if (sets(p).contains(t)) counts(p) += 1
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ProfileScores = copy(child = newChild)
}

object ProfileScores {
  def profileScores(toks: Column, profiles: Seq[Seq[String]]): Column =
    GraftColumnBridge.toColumn(
      ProfileScores(GraftColumnBridge.toExpression(toks), profiles))
}
