package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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
/** Plan-constant double matrix for the fused vector expressions — an
  * OPAQUE holder instead of a structural Seq[Seq[Double]] field:
  *
  *   - SHORT toString: a 32×256×64 trained PQ codebook printed its 16K
  *     doubles into EVERY plan render — AQE re-plans at each stage
  *     boundary at RUN time, so plan stringification/canonicalization of
  *     giant inline literals was charged to every job (r16 profile:
  *     multi-second constant overhead on the trained-PQ rows);
  *   - hash-first content equality: Catalyst semanticEquals /
  *     canonicalization keep today's value semantics at O(1) for the
  *     common non-equal case;
  *   - primitive-block Java serialization (vs 16K boxed Doubles per task).
  */
final class DoubleMatrix(val rows: Array[Array[Double]]) extends Serializable {
  override lazy val hashCode: Int =
    java.util.Arrays.deepHashCode(rows.asInstanceOf[Array[AnyRef]])
  override def equals(o: Any): Boolean = o match {
    case other: DoubleMatrix =>
      (this eq other) || (hashCode == other.hashCode &&
        rows.length == other.rows.length && {
          var i = 0
          var same = true
          while (same && i < rows.length) {
            same = java.util.Arrays.equals(rows(i), other.rows(i))
            i += 1
          }
          same
        })
    case _ => false
  }
  override def toString: String =
    s"matrix(${rows.length}x${rows.headOption.map(_.length).getOrElse(0)}" +
      s"#${Integer.toHexString(hashCode)})"
}

object DoubleMatrix {
  def apply(rows: Array[Array[Double]]): DoubleMatrix = new DoubleMatrix(rows)
  def flat(values: Array[Double]): DoubleMatrix = new DoubleMatrix(Array(values))
}

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

  /** Packed sign-bit signature of `vec` against a constant hyperplane
    * matrix: bit p = (dot(vec, matrix(p)) > 0). One expression replaces
    * `planes` separate dot-product trees each carrying a dim-literal array
    * — the unfused form made Catalyst re-optimize a ~10^5-node tree per
    * execution, which dominated LSH wall-clock at bench scale. */
  def matrixSignature(vec: Column, matrix: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.{functions => F}
    // null vector → signature 0 (every per-plane `dot > 0` is false) —
    // matches the unfused when/otherwise form and the DuckDB oracle's
    // SUM(CASE ... ELSE 0)
    F.coalesce(
      ColumnBridge.column(
        MatrixSignatureExpr(ColumnBridge.expression(vec), DoubleMatrix(matrix))),
      F.lit(0L))
  }

  /** Array of `round(nanvl(cosine(vec, matrix(r)), nanValue), scale)` for
    * every row of a constant matrix — the fused form of an IVF coarse
    * quantizer's per-centroid cosine column block. */
  def matrixCosine(vec: Column, matrix: Array[Array[Double]],
      scale: Int, nanValue: Double): Column =
    ColumnBridge.column(
      MatrixCosineExpr(ColumnBridge.expression(vec), DoubleMatrix(matrix),
        scale, nanValue))

  /** Product-quantization code array: the vector is split into `subspaces`
    * contiguous slices; code[s] = argmin over codebook rows j of the
    * squared L2 distance between slice s of the vector and slice s of row
    * j (ties → smallest j). One fused pass replaces subspaces × ksub
    * dot-product trees. */
  def pqEncode(vec: Column, codebook: Array[Array[Double]], subspaces: Int): Column =
    ColumnBridge.column(
      PqEncodeExpr(ColumnBridge.expression(vec), DoubleMatrix(codebook), subspaces))

  /** Per-query ADC distance table: dt[s·ksub + j] = ‖slice_s(vec) −
    * slice_s(codebook(j))‖², in (s, j) order — computed ONCE per query and
    * reused across every corpus code row. */
  def pqDistTable(vec: Column, codebook: Array[Array[Double]], subspaces: Int): Column =
    ColumnBridge.column(
      PqDistTableExpr(ColumnBridge.expression(vec), DoubleMatrix(codebook), subspaces))

  /** Asymmetric-distance lookup: Σ_s dt[s·ksub + codes[s]] in ascending-s
    * order — O(subspaces) adds per (query, doc) pair instead of O(dim)
    * multiply-adds. */
  def pqAdc(codes: Column, distTable: Column, ksub: Int): Column =
    ColumnBridge.column(
      PqAdcExpr(ColumnBridge.expression(codes), ColumnBridge.expression(distTable), ksub))

  /** Symmetric-distance lookup between two CODE arrays:
    * Σ_s sdt[s·ksub² + a[s]·ksub + b[s]], ascending s — the persisted-index
    * serving path where neither side carries floats; `sdt` is the constant
    * m·ksub² centroid-pair distance table, shipped once per plan. */
  def pqSdc(codesA: Column, codesB: Column, sdt: Array[Double], ksub: Int): Column =
    ColumnBridge.column(
      PqSdcExpr(ColumnBridge.expression(codesA), ColumnBridge.expression(codesB),
        DoubleMatrix.flat(sdt), ksub))

  /** Direct asymmetric PQ distance (table-free): same doubles as
    * pqDistTable + pqAdc, computed straight from (codes, query vector) —
    * used when dsub is small enough that carrying the m·ksub-double table
    * per candidate row costs more than recomputing the slice distances. */
  def pqAdcDirect(codes: Column, qvec: Column,
      codebook: Array[Array[Double]], subspaces: Int): Column =
    ColumnBridge.column(
      PqAdcDirectExpr(ColumnBridge.expression(codes), ColumnBridge.expression(qvec),
        DoubleMatrix(codebook), subspaces))
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

/** Shared base for vec-×-constant-matrix expressions. The matrix is a
  * structural (`Seq`) field so Catalyst canonicalization/semantic equality
  * work; the hot loop reads a transient `Array[Array[Double]]` copy. The
  * generated code is a single call back into the JIT-compiled `compute`
  * method via `ctx.addReferenceObj` — keeping the Janino method tiny no
  * matter how large the matrix is (the inline-literal formulation hit
  * Janino's method-size splitting and multi-second compile times). */
private[graft] trait MatrixVectorExpr extends UnaryExpression {
  def matrix: DoubleMatrix

  @transient protected lazy val m: Array[Array[Double]] = matrix.rows

  @transient protected lazy val childElemType: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case other => throw new IllegalArgumentException(s"expected array input, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(t, _)
          if t == FloatType || t == DoubleType || t == IntegerType || t == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects a numeric array, got $other")
    }

  protected def getElem(arr: ArrayData, i: Int): Double = childElemType match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }
}

/** Packed sign-bit signature: bit p = (dot(vec, matrix(p)) > 0). Null
  * propagates (the `matrixSignature` Column wrapper coalesces to 0L,
  * matching the unfused `when(dot > 0, 1).otherwise(0)` form and the
  * DuckDB oracle's `SUM(CASE WHEN ... THEN pw ELSE 0 END)`). */
case class MatrixSignatureExpr(child: Expression, matrix: DoubleMatrix)
    extends MatrixVectorExpr {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  def compute(arr: ArrayData): Long = {
    var sig = 0L
    var p = 0
    while (p < m.length) {
      val w = m(p)
      val n = math.min(w.length, arr.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) dot += getElem(arr, i) * w(i)
        i += 1
      }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("matrixSig", this, classOf[MatrixSignatureExpr].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $self.compute((org.apache.spark.sql.catalyst.util.ArrayData) $a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-centroid rounded cosine array:
  * `round(nanvl(cos(vec, matrix(r)), nanValue), scale)` for every matrix
  * row, in row order. Rounding replicates Spark's `Round` on doubles
  * (`BigDecimal.valueOf(x).setScale(scale, HALF_UP)`) so results are
  * bit-identical to the unfused `F.round(F.nanvl(...))` column block; the
  * vector's full-length self-norm matches `CosineSimilarityExpr`'s
  * longer-tail semantics. Null vector → null array. */
case class MatrixCosineExpr(child: Expression, matrix: DoubleMatrix,
    scale: Int, nanValue: Double)
    extends MatrixVectorExpr {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val rowNorms: Array[Double] =
    m.map(w => math.sqrt(w.map(x => x * x).sum))

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(arr: ArrayData): ArrayData = {
    val nv = arr.numElements()
    var na = 0.0
    var i = 0
    while (i < nv) {
      if (!arr.isNullAt(i)) { val v = getElem(arr, i); na += v * v }
      i += 1
    }
    val vecNorm = math.sqrt(na)
    val out = new Array[Double](m.length)
    var r = 0
    while (r < m.length) {
      val w = m(r)
      val n = math.min(w.length, nv)
      var dot = 0.0
      i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) dot += getElem(arr, i) * w(i)
        i += 1
      }
      val cos = dot / (vecNorm * rowNorms(r))
      out(r) = round6(if (cos.isNaN) nanValue else cos)
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("matrixCos", this, classOf[MatrixCosineExpr].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $self.compute((org.apache.spark.sql.catalyst.util.ArrayData) $a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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

/** Shared squared-L2 slice distance for the PQ expressions: slice `s` of
  * the input vector against slice `s` of codebook row `w`, index-order
  * double accumulation, null elements zero-filled (the file's shared
  * convention). Callers materialize the row vector ONCE via [[toDoubles]]
  * — reading elements through the per-type getElem inside the
  * subspaces×ksub loop was a megamorphic branch per element and dominated
  * encode wall-clock at the 32×256 trained shape (r16 profile: ~66 M
  * dispatched reads per 2 K-row encode). */
private[graft] trait PqVectorExpr extends MatrixVectorExpr {
  def subspaces: Int

  /** One pass: ArrayData → primitive double[], nulls zero-filled — the
    * same per-element conversions getElem performs, so downstream
    * arithmetic is bitwise unchanged. */
  protected def toDoubles(arr: ArrayData): Array[Double] = {
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (arr.isNullAt(i)) 0.0 else getElem(arr, i)
      i += 1
    }
    v
  }

  protected def sliceDist(v: Array[Double], w: Array[Double], s: Int, dsub: Int): Double = {
    var dist = 0.0
    var i = s * dsub
    val lim = math.min(math.min((s + 1) * dsub, v.length), w.length)
    while (i < lim) {
      val x = v(i) - w(i)
      dist += x * x
      i += 1
    }
    dist
  }

  /** Subspace width from the CODEBOOK dim (a plan-time constant validated
    * by the operators) — never from the row: a single ragged vector must
    * degrade through the clamped slice loops, not crash the job. */
  @transient protected lazy val dsub: Int = {
    val d = m.headOption.map(_.length).getOrElse(0)
    require(subspaces > 0 && d > 0 && d % subspaces == 0,
      s"codebook dim $d is not divisible into $subspaces subspaces")
    d / subspaces
  }
}

/** PQ encode: array<int> of length `subspaces`, code[s] = argmin_j of the
  * per-slice squared L2 (ties → smallest j — matches the oracle's
  * row_number ORDER BY dist, j). */
case class PqEncodeExpr(child: Expression, matrix: DoubleMatrix, subspaces: Int)
    extends PqVectorExpr {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  def compute(arr: ArrayData): ArrayData = {
    val v = toDoubles(arr)
    val out = new Array[Int](subspaces)
    var s = 0
    while (s < subspaces) {
      var best = 0
      var bestDist = Double.PositiveInfinity
      var j = 0
      while (j < m.length) {
        val dist = sliceDist(v, m(j), s, dsub)
        if (dist < bestDist) { bestDist = dist; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $self.compute((org.apache.spark.sql.catalyst.util.ArrayData) $a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ ADC distance table: array<double> of length subspaces × ksub in
  * (s, j) order — built once per QUERY vector. */
case class PqDistTableExpr(child: Expression, matrix: DoubleMatrix, subspaces: Int)
    extends PqVectorExpr {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable

  def compute(arr: ArrayData): ArrayData = {
    val v = toDoubles(arr)
    val out = new Array[Double](subspaces * m.length)
    var s = 0
    while (s < subspaces) {
      var j = 0
      while (j < m.length) {
        out(s * m.length + j) = sliceDist(v, m(j), s, dsub)
        j += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqDistTable", this, classOf[PqDistTableExpr].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $self.compute((org.apache.spark.sql.catalyst.util.ArrayData) $a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** DIRECT asymmetric PQ distance: Σ_s ‖qvec_slice_s − cb(codes[s])_slice_s‖²,
  * ascending s with ascending-index inner accumulation — the EXACT doubles
  * the table path produces (each dt entry is this same sliceDist; the ADC
  * sum adds them in the same s order), so the two kernels are bitwise
  * interchangeable and share one oracle. Used when dsub is small: the
  * per-query table only pays when dsub ≫ 1 arithmetic-wise, while carrying
  * the m·ksub-double table as a JOIN COLUMN costs m·ksub·8 bytes of row
  * materialization per candidate (64 KB/row at 32×256 — the r16 profile
  * showed that dominating pq_trained wall-clock); this kernel carries only
  * the dim-float query vector. */
case class PqAdcDirectExpr(left: Expression, right: Expression,
    matrix: DoubleMatrix, subspaces: Int) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  @transient private lazy val m: Array[Array[Double]] = matrix.rows
  @transient private lazy val dsub: Int = {
    val d = m.headOption.map(_.length).getOrElse(0)
    require(subspaces > 0 && d > 0 && d % subspaces == 0,
      s"codebook dim $d is not divisible into $subspaces subspaces")
    d / subspaces
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(et, _))
          if et == DoubleType || et == FloatType ||
            et == IntegerType || et == LongType || et == ShortType || et == ByteType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects (array<int> codes, array<numeric> query vector), got $other")
    }

  @transient private lazy val qElemType: DataType =
    right.dataType.asInstanceOf[ArrayType].elementType

  private def elem(arr: ArrayData, i: Int): Double = qElemType match {
    case DoubleType => arr.getDouble(i)
    case FloatType => arr.getFloat(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
  }

  def compute(codes: ArrayData, qv: ArrayData): Double = {
    // materialize once: nulls zero-fill (the file's shared convention —
    // what keeps this kernel bitwise-equal to the table path's sliceDist)
    val qn = qv.numElements()
    val v = new Array[Double](qn)
    var vi = 0
    while (vi < qn) {
      v(vi) = if (qv.isNullAt(vi)) 0.0 else elem(qv, vi)
      vi += 1
    }
    var sum = 0.0
    var s = 0
    val n = codes.numElements()
    while (s < n) {
      val code = codes.getInt(s)
      if (code < 0 || code >= m.length)
        throw new IllegalArgumentException(
          s"pq_adc_direct: code $code at subspace $s is out of range for " +
            s"ksub=${m.length} — codes and codebook were built with different " +
            "subspaces/ksub")
      val cent = m(code)
      var dist = 0.0
      var i = s * dsub
      val lim = math.min((s + 1) * dsub, math.min(qn, cent.length))
      while (i < lim) {
        val x = v(i) - cent(i)
        dist += x * x
        i += 1
      }
      sum += dist
      s += 1
    }
    sum
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqAdcDirect", this, classOf[PqAdcDirectExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = $self.compute(
         |  (org.apache.spark.sql.catalyst.util.ArrayData) $a,
         |  (org.apache.spark.sql.catalyst.util.ArrayData) $b);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ADC lookup: Σ_s dt[s·ksub + codes[s]], ascending s (the same operand
  * order as the oracle's list_sum over an (s)-ordered transform, so the
  * double sums are bitwise equal). */
case class PqAdcExpr(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects (array<int> codes, array<double> dist table), got $other")
    }

  def compute(codes: ArrayData, dt: ArrayData): Double = {
    var sum = 0.0
    var s = 0
    val n = codes.numElements()
    val dtLen = dt.numElements()
    while (s < n) {
      val code = codes.getInt(s)
      // externally-supplied code columns (pqIndexTopK accepts any parquet)
      // can disagree with the codebook's ksub/m — fail with the mismatch
      // named instead of a raw AIOOBE out of codegen'd code (ADVICE r15)
      if (code < 0 || code >= ksub || s * ksub + code >= dtLen)
        throw new IllegalArgumentException(
          s"pq_adc: code $code at subspace $s is out of range for ksub=$ksub " +
            s"(distance table has $dtLen entries) — codes and codebook were " +
            "built with different subspaces/ksub")
      sum += dt.getDouble(s * ksub + code)
      s += 1
    }
    sum
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = $self.compute(
         |  (org.apache.spark.sql.catalyst.util.ArrayData) $a,
         |  (org.apache.spark.sql.catalyst.util.ArrayData) $b);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** SDC lookup: Σ_s sdt[s·ksub² + a[s]·ksub + b[s]], ascending s. The
  * centroid-pair table rides in a [[DoubleMatrix]] opaque holder
  * (hash-first equality, short toString — AQE re-planning never
  * stringifies or deep-compares the m·ksub² doubles) and is read through
  * a transient array in the hot loop, like the matrix kernels. */
case class PqSdcExpr(left: Expression, right: Expression, sdt: DoubleMatrix, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  @transient private lazy val t: Array[Double] = sdt.rows(0)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects two array<int> code columns, got $other")
    }

  def compute(a: ArrayData, b: ArrayData): Double = {
    var sum = 0.0
    var s = 0
    val n = math.min(a.numElements(), b.numElements())
    val k2 = ksub * ksub
    while (s < n) {
      val ca = a.getInt(s)
      val cb = b.getInt(s)
      // the min() bound on n tolerates length skew, but a code ≥ ksub means
      // the codes were built against a different codebook — the clamped
      // lookup would silently read a WRONG table entry (ADVICE r15)
      if (ca < 0 || ca >= ksub || cb < 0 || cb >= ksub ||
          s * k2 + ca * ksub + cb >= t.length)
        throw new IllegalArgumentException(
          s"pq_sdc: codes ($ca, $cb) at subspace $s are out of range for " +
            s"ksub=$ksub (table has ${t.length} entries) — codes and codebook " +
            "were built with different subspaces/ksub")
      sum += t(s * k2 + ca * ksub + cb)
      s += 1
    }
    sum
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqSdc", this, classOf[PqSdcExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = $self.compute(
         |  (org.apache.spark.sql.catalyst.util.ArrayData) $a,
         |  (org.apache.spark.sql.catalyst.util.ArrayData) $b);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
