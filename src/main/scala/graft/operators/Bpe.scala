package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import graft.functions.BpeExpressions

/** BPE-vocabulary token counting over a corpus — the bridge from the
  * pipeline's regex-word token counts to REAL tokenizer units (budgets,
  * packing and perplexity cuts are specified in tokenizer tokens in
  * production, not words). The vocab is an ordinary relation with a
  * `token` string column; tokenization semantics live in
  * [[graft.functions.BpeExpressions]] (byte-level greedy longest match,
  * single-byte fallback).
  *
  * 100 TB anatomy: the vocab is collected ONCE on the driver (bounded by
  * [[MaxVocab]] — tokenizer vocabs are ≤ a few hundred thousand entries,
  * the same footprint class as an IVF centroid set), frozen into a trie,
  * and shipped with the plan; counting is then a pure codegen'd column
  * expression over the corpus scan — no shuffle, no join, no UDF. */
object Bpe {

  /** Hard cap on vocab entries collected to the driver. */
  val MaxVocab: Int = 1 << 20

  /** Distinct non-empty tokens of `vocabDf(tokenCol)`, driver-side. */
  def loadVocab(vocabDf: DataFrame, tokenCol: String = "token"): Seq[String] = {
    val n = vocabDf.count()
    require(n <= MaxVocab,
      s"vocab has $n entries — exceeds the $MaxVocab driver-collect cap")
    vocabDf.select(F.col(tokenCol).cast("string"))
      .filter(F.col(tokenCol).isNotNull && F.length(F.col(tokenCol)) > 0)
      .distinct()
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** The counter as a reusable Column function — what select_token_budget
    * and pack_sequences plug in when a vocab is supplied. */
  def counter(vocab: Seq[String]): Column => Column =
    text => BpeExpressions.bpeCount(text, vocab)

  /** Corpus + `n_bpe_tokens` (null text counts as null — callers decide;
    * the table-function surface coalesces to 0 like every other counter). */
  def withCount(df: DataFrame, textCol: String, vocab: Seq[String],
      outCol: String = "n_bpe_tokens"): DataFrame =
    df.withColumn(outCol, BpeExpressions.bpeCount(F.col(textCol), vocab))

  /** Hard cap on merge rules collected to the driver (matches BpeTrain's
    * nMerges bound). */
  val MaxMerges: Int = 65536

  /** Driver-side load of a MERGES relation (bpe_train's output shape):
    * (left, right) pairs in ascending `rank` order. */
  def loadMerges(mergesDf: DataFrame): Seq[(String, String)] = {
    val n = mergesDf.count()
    require(n <= MaxMerges, s"merges has $n entries — exceeds the $MaxMerges cap")
    mergesDf.select(F.col("left").cast("string"), F.col("right").cast("string"),
        F.col("rank").cast("int"))
      .filter(F.col("left").isNotNull && F.col("right").isNotNull)
      .orderBy("rank")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  /** Corpus + `n_bpe_merge_tokens`: TRUE rank-ordered BPE inference over
    * the canonical word stream (null text counts 0). The greedy trie
    * counter approximates this from the vocab alone; this is the exact
    * merge-replay count when the merge list is available — they diverge
    * exactly where maximal munch blocks a lower-rank merge. */
  def withMergeCount(df: DataFrame, textCol: String,
      merges: Seq[(String, String)], outCol: String = "n_bpe_merge_tokens",
      pretok: String = "words"): DataFrame =
    df.withColumn(outCol,
      F.when(F.col(textCol).isNull, F.lit(0L))
        .otherwise(BpeExpressions.bpeMergeCount(
          BpeTrain.pretokStream(textCol, pretok), merges)))

  /** The actual TOKENIZE surface: (id, bpe_tokens, n_bpe_tokens) — the
    * final merge-replay symbol sequence per document (what a user ships
    * to training after bpe_train), same inference loop as
    * [[withMergeCount]] (size(bpe_tokens) == its count by construction,
    * spec-gated). Null text → null tokens, count 0 (the counter's
    * convention). One codegen'd pass; the merge list rides with the plan
    * (loadMerges' [[MaxMerges]]-capped collect). */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], pretok: String = "words"): DataFrame =
    df.select(
      F.col(idCol),
      F.when(F.col(textCol).isNull, F.lit(null).cast("array<string>"))
        .otherwise(BpeExpressions.bpeMergeEncode(
          BpeTrain.pretokStream(textCol, pretok), merges)).as("bpe_tokens"),
      F.when(F.col(textCol).isNull, F.lit(0L))
        .otherwise(BpeExpressions.bpeMergeCount(
          BpeTrain.pretokStream(textCol, pretok), merges)).as("n_bpe_tokens"))

  /** Tokenizer-fitness report — the numbers that decide whether a vocab
    * FITS a corpus before committing a training run to it:
    *
    *   - `n_bpe_tokens` / `n_bytes` / `fallback_bytes`: tokens under
    *     greedy longest-match, UTF-8 byte length, and the OOV byte mass
    *     (bytes no vocab token covers — each costs a whole token AND
    *     signals vocabulary mismatch; GPT-2-style byte fallback makes the
    *     tokenizer total but not free);
    *   - `bpe_coverage` = covered bytes / total bytes (1.0 = the vocab
    *     natively spells the whole corpus);
    *   - `n_words` / `fertility` = BPE tokens per word — THE standard
    *     tokenizer-selection metric (≈1.0 for English with a fitted
    *     vocab; ≥2 means the budget buys half the text you think).
    *
    * All counts are integers until the two final exactly-rounded IEEE
    * divisions, so the DuckDB oracle reproduces them bit-identically.
    * Same 100 TB anatomy as [[withCount]]: plan-shipped trie, pure
    * codegen'd scan, no shuffle/join/UDF; null text = 0-byte doc with
    * null ratios. */
  def withStats(df: DataFrame, textCol: String, vocab: Seq[String]): DataFrame = {
    val t = F.col(textCol)
    df.withColumn("n_bpe_tokens",
        F.when(t.isNull, F.lit(0L)).otherwise(BpeExpressions.bpeCount(t, vocab)))
      .withColumn("n_bytes",
        F.when(t.isNull, F.lit(0L)).otherwise(F.octet_length(t).cast("long")))
      .withColumn("fallback_bytes",
        F.when(t.isNull, F.lit(0L)).otherwise(BpeExpressions.bpeFallbackBytes(t, vocab)))
      .withColumn("n_words",
        F.when(t.isNull, F.lit(0L))
          .otherwise(graft.functions.TextFunctions.tokenCount(t).cast("long")))
      .withColumn("bpe_coverage",
        F.when(F.col("n_bytes") > 0,
          (F.col("n_bytes") - F.col("fallback_bytes")).cast("double") /
            F.col("n_bytes").cast("double")))
      .withColumn("fertility",
        F.when(F.col("n_words") > 0,
          F.col("n_bpe_tokens").cast("double") / F.col("n_words").cast("double")))
  }
}
