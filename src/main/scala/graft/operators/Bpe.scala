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
}
