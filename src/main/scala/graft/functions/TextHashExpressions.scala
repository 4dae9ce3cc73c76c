package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for word-shingle hashing.
  *
  * The HOF formulation (split → filter → transform(sequence, concat_ws ∘
  * slice) → array_distinct → transform(xxhash64)) is interpreted per element
  * and allocates a string per shingle — measured as the dominant cost of
  * every text-dedup pipeline (≈5-7 s of a 9 s ngram run at sf0.1 even when
  * parallelized). This expression tokenizes, hashes and dedups in ONE pass
  * per document with zero intermediate strings, and participates in
  * whole-stage codegen via a static call.
  *
  * Hash semantics: only shingle EQUALITY ever matters downstream (posting
  * joins, minhash mins, simhash votes) — the hash values themselves never
  * surface in query output — so the hash need not match any engine's
  * function. Tokens are maximal [a-z0-9]+ runs of the lowercased text
  * (parity with `split(lower(text), '[^a-z0-9]+')` in the SQL oracles);
  * token hash is FNV-1a over the characters; an n-token shingle combines
  * consecutive token hashes with a 64-bit mix. Output is the sorted distinct
  * array (set semantics, deterministic order).
  */
object TextHashExpressions {

  /** Sorted-distinct 64-bit hashes of word n-gram shingles. */
  def shingleHashes64(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHash64Expr(ColumnBridge.expression(text), n))
}

/** Static kernel — called from both interpreted eval and generated code. */
object GraftTextOps {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L
  private final val Mix = 0x9e3779b97f4a7c15L

  /** One-pass tokenize → per-token FNV-1a → n-gram combine → sort+dedup. */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val len = s.length
    // token hashes
    var toks = new Array[Long](math.max(16, len / 6))
    var ntok = 0
    var h = FnvOffset
    var inTok = false
    var i = 0
    while (i <= len) {
      val c0 = if (i < len) s.charAt(i) else ' '
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else Character.toLowerCase(c0)
      val isTokChar = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (isTokChar) {
        h = (h ^ c.toInt) * FnvPrime
        inTok = true
        // U+0130 (İ): full-string lowercasing — the regex stream
        // (TextFunctions.tokens: split(lower(text), '[^a-z0-9]+')) this
        // kernel must stay token-identical to — maps it to "i" + combining
        // U+0307, and the combining mark then CLOSES the token at the
        // split. The simple per-char mapping used here yields a bare 'i'
        // (no mark), so close the token explicitly. This is the only
        // locale-independent 1:N lowercase mapping whose output starts
        // with a token char (Unicode SpecialCasing); the per-doc
        // stream-equality gate in PipelineSpec pins the parity.
        if (c0 == 'İ') {
          if (ntok == toks.length) toks = java.util.Arrays.copyOf(toks, toks.length * 2)
          toks(ntok) = h
          ntok += 1
          h = FnvOffset
          inTok = false
        }
      } else if (inTok) {
        if (ntok == toks.length) toks = java.util.Arrays.copyOf(toks, toks.length * 2)
        toks(ntok) = h
        ntok += 1
        h = FnvOffset
        inTok = false
      }
      i += 1
    }
    val nsh = ntok - n + 1
    if (nsh <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](nsh)
    var j = 0
    while (j < nsh) {
      var sh = toks(j)
      var k = 1
      while (k < n) {
        sh = (sh * Mix) ^ toks(j + k)
        k += 1
      }
      out(j) = sh
      j += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted array
    var w = 1
    var r = 1
    while (r < nsh) {
      if (out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == nsh) out else java.util.Arrays.copyOf(out, w))
  }
}

case class ShingleHash64Expr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects a string input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    GraftTextOps.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftTextOps.shingleHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
