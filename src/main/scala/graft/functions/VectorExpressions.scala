package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding-vector math.
  *
  * The higher-order-function formulation (`zip_with` + `aggregate`) is
  * interpreted per element — at millions of candidate pairs × d dims that
  * lambda-invocation overhead dominates the whole dedup/similarity stage.
  * These expressions evaluate in a tight loop and participate in whole-stage
  * codegen (`doGenCode`), keeping similarity joins inside one codegen stage.
  *
  * Semantics: index-order double summation; null elements count as 0, and on
  * length mismatch the longer array's tail still contributes to its own norm
  * (cosine) — matching DuckDB's list_sum over list_transform, which also
  * zero-fills nulls. (The older zip_with/aggregate HOF propagated null
  * elements to a null result; these expressions improve on that.)
  */
object VectorExpressions {

  /** cosine(a, b) as a fused single-pass expression: dot, ‖a‖², ‖b‖² in one
    * loop over the arrays. Returns null if either input is null; NaN on zero
    * norms (same as dot/(0·x)). */
  def cosineSimilarity(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarityExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Index-order dot product of two numeric arrays (double accumulation). */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

private[graft] trait VectorBinaryExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case other =>
      throw new IllegalArgumentException(s"expected array input, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType || t == IntegerType || t == LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects two numeric arrays, got $other")
    }
  }

  /** Java source reading element i of `arr` as double. Callers emit their own
    * `isNullAt` guard around this (null elements → 0.0), in both the
    * interpreted and generated paths. */
  protected def readElem(arr: String, i: String, t: DataType): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  protected def getElem(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }
}

/** Fused cosine similarity: dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))). */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends VectorBinaryExpr {

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xe = if (x.isNullAt(i)) 0.0 else getElem(x, i, lt)
      val ye = if (y.isNullAt(i)) 0.0 else getElem(y, i, rt)
      dot += xe * ye; na += xe * xe; nb += ye * ye
      i += 1
    }
    // tail of the longer array still contributes to its own norm
    var j = n
    while (j < x.numElements()) { val v = if (x.isNullAt(j)) 0.0 else getElem(x, j, lt); na += v * v; j += 1 }
    j = n
    while (j < y.numElements()) { val v = if (y.isNullAt(j)) 0.0 else getElem(y, j, rt); nb += v * v; j += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lt, rt) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xe = ctx.freshName("xe")
      val ye = ctx.freshName("ye")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xe = $a.isNullAt($i) ? 0.0 : ${readElem(a, i, lt)};
         |  double $ye = $b.isNullAt($i) ? 0.0 : ${readElem(b, i, rt)};
         |  $dot += $xe * $ye; $na += $xe * $xe; $nb += $ye * $ye;
         |}
         |for (int $i = $n; $i < $a.numElements(); $i++) {
         |  double $xe = $a.isNullAt($i) ? 0.0 : ${readElem(a, i, lt)};
         |  $na += $xe * $xe;
         |}
         |for (int $i = $n; $i < $b.numElements(); $i++) {
         |  double $ye = $b.isNullAt($i) ? 0.0 : ${readElem(b, i, rt)};
         |  $nb += $ye * $ye;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Index-order dot product with double accumulation. */
case class DotProductExpr(left: Expression, right: Expression)
    extends VectorBinaryExpr {

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xe = if (x.isNullAt(i)) 0.0 else getElem(x, i, lt)
      val ye = if (y.isNullAt(i)) 0.0 else getElem(y, i, rt)
      dot += xe * ye
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lt, rt) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ($a.isNullAt($i) ? 0.0 : ${readElem(a, i, lt)})
         |        * ($b.isNullAt($i) ? 0.0 : ${readElem(b, i, rt)});
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
