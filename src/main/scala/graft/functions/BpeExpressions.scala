package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level greedy longest-match subword tokenization against a broadcast
  * vocabulary — the TOKENIZER-token counter the pipeline budgets in
  * (regex-word counts approximate it poorly: production token budgets are
  * in BPE/WordPiece units, not words).
  *
  * Semantics: the text's UTF-8 bytes are scanned left to right; at each
  * position the LONGEST vocab token matching is consumed (maximal munch,
  * the WordPiece/greedy flavor of BPE inference — rank-ordered merge
  * replay needs the merge list, which vocab files don't always carry, and
  * greedy is deterministic from the vocab alone); every single byte is
  * implicitly in the vocabulary, so tokenization is total (any byte
  * sequence, including invalid UTF-8 fragments of a multi-byte character,
  * falls back to 1-byte tokens — exactly byte-fallback BPE).
  *
  * Scale shape: a pure codegen'd column expression over a process-shared
  * trie attached via `ctx.addReferenceObj` (serialized once per plan, NOT
  * per row/task) — the vocab is the broadcast side, the corpus never
  * shuffles, and the scan cost is O(bytes · avg match depth). Vocab size
  * is driver-bounded by [[graft.operators.Bpe.MaxVocab]] (the IVF-centroid
  * footprint class).
  */
object BpeExpressions {

  /** Number of greedy-longest-match tokens of `text` under `vocab`. */
  def bpeCount(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(BpeCountExpr(ColumnBridge.expression(text), BpeTrie.fromStrings(vocab)))

  /** The segmentation itself: array of token byte-strings, in order —
    * lossless (concatenating the elements restores the UTF-8 bytes).
    * Binary elements, not strings: byte-fallback tokens inside a
    * multi-byte character are not valid UTF-8 on their own. */
  def bpeSegment(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(BpeSegmentExpr(ColumnBridge.expression(text), BpeTrie.fromStrings(vocab)))

  /** Bytes of `text` emitted as single-byte FALLBACK tokens — the vocab's
    * out-of-vocabulary byte mass on this text (a 1-byte vocab token is a
    * hit, not a fallback). */
  def bpeFallbackBytes(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(
      BpeFallbackExpr(ColumnBridge.expression(text), BpeTrie.fromStrings(vocab)))

  /** Tokens under rank-ordered merge replay (true BPE inference) of the
    * canonical word-array column `words` — see [[BpeMergeCountExpr]]. */
  def bpeMergeCount(words: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeMergeCountExpr(ColumnBridge.expression(words), merges))

  /** Full rank-ordered merge-replay ENCODING of a canonical word-array
    * column: the final symbol sequence across all words, in order — see
    * [[BpeMergeEncodeExpr]]. size(encode) == bpeMergeCount by
    * construction (spec-gated). */
  def bpeMergeEncode(words: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeMergeEncodeExpr(ColumnBridge.expression(words), merges))
}

/** Frozen byte-trie over the vocab: per node a sorted byte→child table
  * (binary search — 256-wide child arrays would be ~100 MB at real vocab
  * sizes). Built once on the driver, shipped once per plan. */
final class BpeTrie private (
    private val childKeys: Array[Array[Byte]],
    private val childIds: Array[Array[Int]],
    private val terminal: Array[Boolean],
    val maxTokenLen: Int,
    val nTokens: Int
) extends Serializable {

  private def child(node: Int, b: Byte): Int = {
    val keys = childKeys(node)
    var lo = 0
    var hi = keys.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val k = keys(mid)
      if (k == b) return childIds(node)(mid)
      else if (k < b) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** End (exclusive) of the longest vocab token starting at `i`, or i+1
    * for the single-byte fallback. */
  private def munch(bytes: Array[Byte], i: Int): Int = {
    var node = 0
    var j = i
    var best = i
    val lim = math.min(bytes.length, i + maxTokenLen)
    while (j < lim) {
      val c = child(node, bytes(j))
      if (c < 0) return if (best > i) best else i + 1
      node = c
      j += 1
      if (terminal(node)) best = j
    }
    if (best > i) best else i + 1
  }

  def count(bytes: Array[Byte]): Long = {
    var i = 0
    var n = 0L
    while (i < bytes.length) { i = munch(bytes, i); n += 1 }
    n
  }

  /** Bytes covered by NO vocab token (each becomes a 1-byte fallback
    * token) — the OOV byte mass. Distinguishes a 1-byte vocab HIT from a
    * fallback, which [[munch]]'s return value alone cannot. */
  def fallbackBytes(bytes: Array[Byte]): Long = {
    var i = 0
    var fb = 0L
    while (i < bytes.length) {
      var node = 0
      var j = i
      var best = i
      val lim = math.min(bytes.length, i + maxTokenLen)
      var miss = false
      while (j < lim && !miss) {
        val c = child(node, bytes(j))
        if (c < 0) miss = true
        else { node = c; j += 1; if (terminal(node)) best = j }
      }
      if (best > i) i = best
      else { fb += 1L; i += 1 }
    }
    fb
  }

  def segment(bytes: Array[Byte]): Array[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var i = 0
    while (i < bytes.length) {
      val j = munch(bytes, i)
      out += java.util.Arrays.copyOfRange(bytes, i, j)
      i = j
    }
    out.toArray
  }
}

object BpeTrie {
  def fromStrings(tokens: Seq[String]): BpeTrie =
    apply(tokens.iterator.filter(t => t != null && t.nonEmpty)
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray)

  def apply(tokens: Array[Array[Byte]]): BpeTrie = {
    import scala.collection.mutable
    val nodes = mutable.ArrayBuffer[mutable.TreeMap[Byte, Int]](mutable.TreeMap.empty)
    val term = mutable.ArrayBuffer[Boolean](false)
    var maxLen = 1
    tokens.foreach { t =>
      require(t.nonEmpty, "empty vocab token")
      if (t.length > maxLen) maxLen = t.length
      var node = 0
      t.foreach { b =>
        node = nodes(node).getOrElseUpdate(b, {
          nodes += mutable.TreeMap.empty
          term += false
          nodes.size - 1
        })
      }
      term(node) = true
    }
    new BpeTrie(
      nodes.map(_.keysIterator.toArray).toArray,
      nodes.map(_.valuesIterator.toArray).toArray,
      term.toArray, maxLen, tokens.length)
  }
}

case class BpeCountExpr(child: Expression, trie: BpeTrie) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects a string input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    trie.count(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("bpeTrie", trie, classOf[BpeTrie].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $trieRef.count($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class BpeFallbackExpr(child: Expression, trie: BpeTrie) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects a string input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    trie.fallbackBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("bpeTrie", trie, classOf[BpeTrie].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $trieRef.fallbackBytes($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class BpeSegmentExpr(child: Expression, trie: BpeTrie) extends UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects a string input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      trie.segment(input.asInstanceOf[UTF8String].getBytes).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("bpeTrie", trie, classOf[BpeTrie].getName)
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new $gad((Object[]) $trieRef.segment($c.getBytes()));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Tokens under TRUE rank-ordered BPE inference (the HF/sentencepiece
  * encode): replay the trained merges in rank order within each word.
  * Differs from the greedy longest-match of [[BpeCountExpr]] exactly where
  * greedy's maximal munch blocks a later, lower-rank merge (e.g. merges
  * (b,c) < (bc,d) < (a,b) on "abcd": greedy over the derived vocab takes
  * "ab" and pays 3 tokens; replay yields [a, bcd] = 2).
  *
  * Input is the canonical WORD ARRAY (graft.functions.TextFunctions.tokens
  * — the ONE shared tokenizer; merges never cross word boundaries, the
  * trainer's convention), so the count is the sum over words of the encoded
  * symbol count; bytes outside words (punctuation/whitespace) are not in
  * the trainer's universe and are not counted.
  *
  * Encode loop: repeatedly merge the LOWEST-RANK adjacent pair present,
  * all occurrences left-to-right non-overlapping — equivalent to replaying
  * ranks 1..R in order because a merge can only CREATE pairs of strictly
  * higher rank (the pair's right/left symbol must itself exist first).
  * Same scale shape as the trie counter: merges map shipped once per plan
  * via addReferenceObj, pure codegen'd scan, no shuffle/join/UDF. */
case class BpeMergeCountExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects an array<string> word column, got $other")
    }

  @transient private lazy val pairRank = BpeMergeReplay.rankIndex(merges)

  private def encodedLen(word: String): Int =
    BpeMergeReplay.encodeWord(word, merges, pairRank).size

  def compute(arr: ArrayData): Long = {
    var total = 0L
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) total += encodedLen(arr.getUTF8String(i).toString)
      i += 1
    }
    total
  }

  override protected def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeMergeCount", this, classOf[BpeMergeCountExpr].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $self.compute((org.apache.spark.sql.catalyst.util.ArrayData) $a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The rank-ordered BPE merge-replay kernel, shared by the count and
  * encode expressions: chars → repeatedly apply the LOWEST-rank adjacent
  * pair present, left-to-right non-overlapping — exactly the HF
  * tokenizers inference loop the trainer's merges are meant for. */
object BpeMergeReplay {

  /** Pair key: left-length-prefixed concatenation — unambiguous even when
    * symbols CONTAIN spaces (GPT-2 pretok mode: " stop" carries its leading
    * space, whitespace-run pretokens are all spaces — a "a b"-style
    * separator key would conflate ("  "," ") with (" ","  ")). */
  def pairKey(a: String, b: String): String = a.length + ":" + a + b

  def rankIndex(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(pairKey(a, b), Integer.valueOf(i))
    }
    m
  }

  /** Final symbol sequence of one canonical word under the merges. */
  def encodeWord(word: String, merges: Seq[(String, String)],
      pairRank: java.util.HashMap[String, Integer]): java.util.ArrayList[String] = {
    val empty = new java.util.ArrayList[String](0)
    if (word.isEmpty) return empty
    var syms = new java.util.ArrayList[String](word.length)
    var ci = 0
    while (ci < word.length) { syms.add(String.valueOf(word.charAt(ci))); ci += 1 }
    var continue = true
    while (continue && syms.size > 1) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.size - 1) {
        val r = pairRank.get(pairKey(syms.get(i), syms.get(i + 1)))
        if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        val (a, b) = merges(bestRank)
        val out = new java.util.ArrayList[String](syms.size)
        i = 0
        while (i < syms.size) {
          if (i < syms.size - 1 && syms.get(i) == a && syms.get(i + 1) == b) {
            out.add(a + b); i += 2 // left-to-right non-overlapping
          } else { out.add(syms.get(i)); i += 1 }
        }
        syms = out
      }
    }
    syms
  }
}

/** Full merge-replay ENCODING of a canonical word-array column: the final
  * symbol sequences of all words, concatenated in word order — the actual
  * tokenization surface behind bpe_encode (BpeMergeCountExpr counts the
  * same sequence; length equality is spec-gated). Null word elements are
  * skipped like the counter's. */
case class BpeMergeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val pairRank = BpeMergeReplay.rankIndex(merges)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects an array<string> word column, got $other")
    }

  def compute(arr: ArrayData): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val syms = BpeMergeReplay.encodeWord(
          arr.getUTF8String(i).toString, merges, pairRank)
        var j = 0
        while (j < syms.size) { out.add(UTF8String.fromString(syms.get(j))); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeMergeEncode", this, classOf[BpeMergeEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $self.compute((org.apache.spark.sql.catalyst.util.ArrayData) $a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
