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

  /** Benchmark-health audit — the TRANSPOSE of [[contaminatedDocs]]: for
    * every EVAL document, how many corpus documents share an n-gram with it
    * (`leaking_docs`) and how many of its distinct n-grams are shared at
    * all (`shared_ngrams`). Run this BEFORE training-set decontamination:
    * an eval item leaked into thousands of corpus docs is effectively
    * public and belongs out of the benchmark, not just out of the corpus.
    *
    * Same 100 TB anatomy as the forward direction: the eval n-gram set is
    * exploded, deduped and broadcast; the corpus streams through one
    * shingling scan and the broadcast join; only MATCHED (corpus, eval)
    * gram rows reach the per-eval aggregate. Eval docs with zero overlap
    * keep their row (left join back to the eval ids) — the zeros are the
    * healthy signal. Output: (evalId, leaking_docs, shared_ngrams). */
  def contaminationReport(
      corpus: DataFrame,
      corpusId: String,
      corpusText: String,
      eval: DataFrame,
      evalId: String,
      evalText: String,
      n: Int = 13
  ): DataFrame = {
    val evalGrams = eval.select(
      F.col(evalId),
      F.explode(
        graft.functions.TextHashExpressions.shingleHashes64(F.col(evalText), n)).as("__g"))
    val corpusGrams = corpus.select(
      F.col(corpusId).as("__cid"),
      F.explode(
        graft.functions.TextHashExpressions.shingleHashes64(F.col(corpusText), n)).as("__g"))
    val hits = corpusGrams
      .join(F.broadcast(evalGrams), Seq("__g"))
      .groupBy(F.col(evalId))
      .agg(
        F.countDistinct(F.col("__cid")).as("leaking_docs"),
        F.countDistinct(F.col("__g")).as("shared_ngrams"))
    eval.select(F.col(evalId)).distinct()
      .join(hits, Seq(evalId), "left")
      .select(
        F.col(evalId),
        F.coalesce(F.col("leaking_docs"), F.lit(0L)).as("leaking_docs"),
        F.coalesce(F.col("shared_ngrams"), F.lit(0L)).as("shared_ngrams"))
  }

  /** Semantic (embedding-space) contamination: corpus rows whose cosine to
    * ANY eval vector clears `threshold`. The n-gram net above catches
    * verbatim and near-verbatim leaks; a PARAPHRASED eval item sails
    * through it — embedding similarity is the standard second net.
    *
    * EXACT, with two exactness-preserving accelerations over the brute
    * corpus×eval pass (r13 verdict #3 — an LSH-blocked variant would trade
    * the guarantee for speed, the wrong trade: a missed leak silently
    * inflates eval scores forever):
    *
    *  1. Eval distinct-vector compaction. Identical eval vectors (repeated
    *     benchmark items, replicated suites) score identically against any
    *     corpus vector, so the eval side is grouped to (vector, weight) and
    *     matches count `sum(weight)` — bit-identical counts, eval-side cost
    *     proportional to DISTINCT vectors.
    *  2. Centroid-bound pruning (triangle inequality in the normalized
    *     space, the metric-pruning IVF bound). Eval vectors are assigned to
    *     `nlist` seeded centroids; for cos(c,e) ≥ t it is NECESSARY that
    *     cos(c, μ_B(e)) ≥ 1 − (d_t + r_B)²/2 where d_t = √(2−2t) and r_B is
    *     the bucket radius (all via ‖x̂−ŷ‖² = 2−2cos). A corpus row computes
    *     `nlist` centroid cosines in one fused kernel and fully scores ONLY
    *     the buckets whose bound passes — every slack term (6 dp rounding,
    *     double accumulation) is added on the safe side, so no qualifying
    *     pair is ever pruned and results are bit-identical to brute. On
    *     clustered eval sets (real benchmarks) most corpus rows
    *     short-circuit after the centroid pass; on adversarially spread
    *     eval sets the bounds admit everything and the pass degrades to
    *     brute — exactness either way.
    *
    * The corpus still never shuffles (project → bounded explode →
    * broadcast join); only flagged rows reach the aggregate — the same
    * 100 TB contract as the n-gram path.
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
      threshold: Double = 0.95,
      nlist: Int = 32
  ): DataFrame = {
    val c = corpus.select(F.col(corpusId), F.col(corpusVec).as("__cv"))
    // (1) compaction: NULL eval vectors can never match (cosine is null →
    // the ≥ filter fails), dropping them is exact
    val e = eval.select(F.col(evalVec).as("__ev"))
      .filter(F.col("__ev").isNotNull)
      .groupBy("__ev").agg(F.count(F.lit(1)).as("__w"))
    def scored(pairs: DataFrame): DataFrame =
      pairs
        .withColumn("__cos",
          F.round(graft.functions.VectorExpressions.cosineSimilarity(
            F.col("__cv"), F.col("__ev")), 6))
        .filter(F.col("__cos") >= threshold)
        .groupBy(F.col(corpusId))
        .agg(
          F.sum(F.col("__w")).as("contaminated_matches"),
          F.max(F.col("__cos")).as("max_cos_sim"))
    scored(candidatePairs(c, e, threshold, nlist))
  }

  /** Shared candidate generation for the semantic audit family: the exact
    * centroid-bound pruned (corpus × eval) candidate set, or the
    * broadcast-brute cross join when pruning cannot pay (loose threshold /
    * unseedable eval side). `e` carries a non-null `__ev` vector column
    * plus any payload columns (compaction weight, eval id) — payload rides
    * through untouched, so [[contaminatedVecs]] and
    * [[contaminationReportSemantic]] share this machinery bit-for-bit and
    * the bounds cannot drift between the flag and audit directions.
    *
    * Loose thresholds take the brute pass without even seeding centroids:
    * below t = 0.5 the match ball has radius d_t = √(2−2t) ≥ 1 — wider
    * than typical bucket radii on spread embeddings, so the
    * necessary-condition bounds admit ~every (row, bucket) pair and the
    * centroid pass + per-bucket explode is pure overhead (measured +60%
    * on the sf0.1 oracle rows at t=0.35). Both paths are exact; the gate
    * is a deterministic speed decision. */
  private def candidatePairs(
      c: DataFrame,
      e: DataFrame,
      threshold: Double,
      nlist: Int
  ): DataFrame = {
    if (threshold < 0.5)
      return c.crossJoin(F.broadcast(e))
    // seeded centroids over the eval vectors (deterministic
    // md5-of-rendering order; selection only affects SPEED — results are
    // exact for any centroid set). Vectors with null elements can't seed
    // (driver map) but still score through their assigned bucket.
    val cm: Array[Array[Double]] = e
      .filter(!F.exists(F.col("__ev"), x => x.isNull))
      .withColumn("__m", F.md5(F.col("__ev").cast("string").cast("binary")))
      .orderBy("__m")
      .limit(nlist)
      .select("__ev")
      .collect()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
        case n: Number => n.doubleValue()
      }.toArray)
    if (cm.isEmpty)
      // no seedable eval vectors: the original broadcast-brute pass (the
      // eval side is empty or degenerate — tiny either way)
      return c.crossJoin(F.broadcast(e))
    // per-bucket radius from the MINIMUM member-to-own-centroid cosine;
    // every slack is safe-side: member cosines are 6 dp-rounded (±5e-7,
    // absorbed by −1e-6), zero-norm members pin to −1 (radius 2 = the
    // whole sphere, bucket never prunes — NaN cosines compare high in
    // Spark, so those members must stay reachable from every corpus row)
    val assigned = Similarity.seededAssign(e, "__ev", cm)
      .withColumn("__cb", F.element_at(
        graft.functions.VectorExpressions.matrixCosine(F.col("__ev"), cm, 6, -1.0),
        (F.col("bucket") + 1).cast("int")))
    val minCos: Map[Long, Double] = assigned
      .groupBy("bucket").agg(F.min("__cb").as("__minc"))
      .collect()
      .flatMap(r => if (r.isNullAt(0) || r.isNullAt(1)) None
                    else Some(r.getLong(0) -> r.getDouble(1)))
      .toMap
    val tEff = threshold - 5.0000001e-7 // a 6 dp round-up can lift cos by 5e-7
    val dT = math.sqrt(math.max(0.0, 2.0 - 2.0 * tEff))
    val thr: Array[Double] = Array.tabulate(cm.length) { b =>
      minCos.get(b.toLong) match {
        case Some(mc) =>
          val r = math.sqrt(math.max(0.0, 2.0 - 2.0 * (mc - 1e-6)))
          1.0 - math.pow(dT + r, 2) / 2.0 - 1e-6
        case None => 2.0 // empty bucket: nothing there to score
      }
    }
    val thrCol = F.array(thr.map(F.lit(_)): _*)
    // corpus pass: one fused nlist-cosine kernel per row, then explode the
    // buckets whose bound passes. nanValue = 2.0 sends zero-norm corpus
    // rows through EVERY bucket (their NaN pair-cosines compare high in
    // Spark and matched everything in the brute pass — preserved).
    val withBuckets = c
      .withColumn("__cents", graft.functions.VectorExpressions.matrixCosine(
        F.col("__cv"), cm, 6, 2.0))
      .withColumn("bucket", F.explode(F.filter(
        F.sequence(F.lit(0L), F.lit((cm.length - 1).toLong)),
        i => F.element_at(F.col("__cents"), (i + 1).cast("int")) >=
          F.element_at(thrCol, (i + 1).cast("int")))))
      .drop("__cents")
    withBuckets.join(F.broadcast(assigned.drop("__cb")), Seq("bucket"))
      .drop("bucket")
  }

  /** Semantic benchmark-contamination audit — the transpose of
    * [[contaminatedVecs]] (the embedding-space sibling of
    * [[contaminationReport]]): for each EVAL row, how many corpus vectors
    * sit within `threshold` cosine, and the closest one found. Zero rows
    * are kept (a left join back to the eval ids) — "this benchmark item is
    * clean" is the point of the audit.
    *
    * Same anatomy as the flag direction via the shared [[candidatePairs]]:
    * the corpus never shuffles, the eval side broadcasts, centroid-bound
    * pruning is exact. A corpus row reaches an eval row through exactly
    * ONE bucket (each eval row has one assignment), so the per-eval count
    * needs no dedup. The corpus side is consumed as vectors only — corpus
    * ids neither influence nor appear in the output (the audit aggregates
    * per EVAL row), so no corpus id column is taken (ADVICE r15). */
  def contaminationReportSemantic(
      corpus: DataFrame,
      corpusVec: String,
      eval: DataFrame,
      evalId: String,
      evalVec: String,
      threshold: Double = 0.95,
      nlist: Int = 32
  ): DataFrame = {
    // internal renames: corpus and eval commonly share the id column NAME
    // (both 'vec_id'), which would be ambiguous after the candidate join
    val c = corpus.select(F.col(corpusVec).as("__cv"))
    val e = eval.select(F.col(evalId).as("__reid"), F.col(evalVec).as("__ev"))
      .filter(F.col("__ev").isNotNull)
    val agg = candidatePairs(c, e, threshold, nlist)
      .withColumn("__cos",
        F.round(graft.functions.VectorExpressions.cosineSimilarity(
          F.col("__cv"), F.col("__ev")), 6))
      .filter(F.col("__cos") >= threshold)
      .groupBy(F.col("__reid"))
      .agg(
        F.count(F.lit(1)).as("leaking_docs"),
        F.max(F.col("__cos")).as("max_cos_sim"))
      .withColumnRenamed("__reid", evalId)
    eval.select(F.col(evalId)).join(agg, Seq(evalId), "left")
      .withColumn("leaking_docs", F.coalesce(F.col("leaking_docs"), F.lit(0L)))
      .select(evalId, "leaking_docs", "max_cos_sim")
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
      threshold: Double = 0.95,
      nlist: Int = 32
  ): DataFrame = {
    val flagged = contaminatedVecs(corpus, corpusId, corpusVec, eval, evalVec, threshold, nlist)
      .select(corpusId)
    corpus.join(flagged, Seq(corpusId), "left_anti")
  }
}
