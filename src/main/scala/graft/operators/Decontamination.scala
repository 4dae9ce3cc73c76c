package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Benchmark decontamination: find (and drop) corpus documents that share
  * an exact word n-gram with an evaluation/benchmark corpus — the standard
  * guard against test-set leakage in a training-data pipeline (the usual
  * published recipe is 13-gram overlap).
  *
  * 100 TB anatomy: the two sides are wildly asymmetric — benchmarks are
  * megabytes while the corpus is the 100 TB side — so the eval n-gram set
  * is exploded, deduped and BROADCAST; the corpus side streams through one
  * shingling scan (the one-pass native kernel,
  * functions/TextHashExpressions.scala) and a broadcast semi/equi-join.
  * The corpus is never shuffled; per-doc aggregation of hit counts groups
  * on doc id only for the (tiny) contaminated subset.
  *
  * Hash semantics: both sides shingle with the same kernel, so only hash
  * EQUALITY matters; 64-bit collisions (~1e-10 at benchmark scale) can at
  * worst over-flag a document — the conservative direction for
  * decontamination.
  *
  * (The reference has no decontamination operator; this extends its text
  * toolchain the same way Dedup/Similarity do, reference wvlet-lang's
  * text functions being scalar-only.)
  */
object Decontamination {

  /** Documents sharing ≥1 word n-gram with the eval corpus:
    * (idCol, contaminated_ngrams = distinct shared n-grams). */
  def contaminatedDocs(
      corpus: DataFrame,
      corpusId: String,
      corpusText: String,
      eval: DataFrame,
      evalText: String,
      n: Int = 13
  ): DataFrame = {
    val evalGrams = eval
      .select(F.explode(
        graft.functions.TextHashExpressions.shingleHashes64(F.col(evalText), n)).as("__g"))
      .distinct()
    val corpusGrams = corpus.select(
      F.col(corpusId),
      // shingleHashes64 returns the sorted-DISTINCT shingle set per doc,
      // so the count below is "distinct shared n-grams" with no extra dedup
      F.explode(
        graft.functions.TextHashExpressions.shingleHashes64(F.col(corpusText), n)).as("__g"))
    corpusGrams
      .join(F.broadcast(evalGrams), Seq("__g"))
      .groupBy(F.col(corpusId))
      .agg(F.count(F.lit(1)).as("contaminated_ngrams"))
  }

  /** The corpus minus contaminated documents (anti-join of the flagged-id
    * set). The flagged set is EXPECTED benchmark-sized, but its true bound
    * is "every corpus doc sharing one n-gram with the benchmark" — with a
    * boilerplate-heavy benchmark or a tiny n that can approach corpus
    * size, so no broadcast hint is forced here: the anti-join shuffles on
    * uniform ids and AQE broadcasts at runtime iff the flagged side
    * actually fits. */
  def decontaminate(
      corpus: DataFrame,
      corpusId: String,
      corpusText: String,
      eval: DataFrame,
      evalText: String,
      n: Int = 13
  ): DataFrame = {
    val flagged = contaminatedDocs(corpus, corpusId, corpusText, eval, evalText, n)
      .select(corpusId)
    corpus.join(flagged, Seq(corpusId), "left_anti")
  }

  /** Semantic (embedding-space) contamination: corpus rows whose cosine to
    * ANY eval vector clears `threshold`. The n-gram net above catches
    * verbatim and near-verbatim leaks; a PARAPHRASED eval item sails
    * through it — embedding similarity is the standard second net.
    *
    * Exact by construction: the eval side is benchmark-sized and broadcast
    * whole, every corpus vector is scored against every eval vector in one
    * fused-kernel pass (CosineSimilarityExpr, whole-stage codegen), and
    * only flagged rows reach the aggregate — the corpus never shuffles,
    * the same 100 TB contract as the n-gram path. An LSH-blocked variant
    * would trade the exactness guarantee for speed, which is the wrong
    * trade here: a missed leak silently inflates eval scores forever.
    *
    * Returns (corpusId, contaminated_matches, max_cos_sim); cosines are
    * rounded to 6 dp BEFORE the threshold compare and max, keeping the
    * decision ulp-stable across engines (the embeddingCosinePairs
    * convention). */
  def contaminatedVecs(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      eval: DataFrame,
      evalVec: String,
      threshold: Double = 0.95
  ): DataFrame = {
    val c = corpus.select(F.col(corpusId), F.col(corpusVec).as("__cv"))
    val e = eval.select(F.col(evalVec).as("__ev"))
    c.crossJoin(F.broadcast(e))
      .withColumn("__cos",
        F.round(graft.functions.VectorExpressions.cosineSimilarity(
          F.col("__cv"), F.col("__ev")), 6))
      .filter(F.col("__cos") >= threshold)
      .groupBy(F.col(corpusId))
      .agg(
        F.count(F.lit(1)).as("contaminated_matches"),
        F.max(F.col("__cos")).as("max_cos_sim"))
  }

  /** The corpus minus semantically contaminated rows. Same anti-join
    * posture as [[decontaminate]]: no broadcast hint on the flagged side —
    * its true bound is corpus-sized (a pathological threshold flags
    * everything), so AQE decides at runtime. */
  def decontaminateSemantic(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      eval: DataFrame,
      evalVec: String,
      threshold: Double = 0.95
  ): DataFrame = {
    val flagged = contaminatedVecs(corpus, corpusId, corpusVec, eval, evalVec, threshold)
      .select(corpusId)
    corpus.join(flagged, Seq(corpusId), "left_anti")
  }
}
