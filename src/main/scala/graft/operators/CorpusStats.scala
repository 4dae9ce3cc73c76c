package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Corpus-statistics quality features: per-document aggregates over global
  * token DOCUMENT frequencies — the cheap relational stand-in for an LM
  * quality filter (rare-token density correlates with noise/garble, high
  * mean document frequency with boilerplate).
  *
  * Plan shape (2 shuffles, both on uniform keys):
  *   1. explode per-doc DISTINCT token hashes (the one-pass kernel,
  *      functions/TextHashExpressions.scala — distinct per doc makes the
  *      count a document frequency), groupBy token → df;
  *   2. join postings back to the df table (token-keyed, uniform) and
  *      re-aggregate per doc.
  * All features stay INTEGER until the final division, so the values are
  * bit-identical across engines (IEEE division is exactly rounded) — the
  * DuckDB oracle recomputes them from string tokens.
  *
  * Skew caveat: token document frequencies are Zipfian — stopword-class
  * tokens appear in nearly every document, so the token-keyed groupBy and
  * the postings-back join both carry hot keys. The groupBy is safe (partial
  * aggregation collapses each hot token to one row per map task before the
  * shuffle); the join's hot keys fan out one df row to ~corpus-size
  * postings, which AQE's skew-join splitting handles at runtime
  * (OptimizeSkewedJoin) — worst case is a handful of oversized but
  * splittable partitions, not a single straggler, because the posting side
  * is uniformly distributed by (token, doc) pairs.
  *
  * Collision caveat: tokens are 64-bit hashes, so two distinct tokens can
  * collide (birthday bound ~ v²/2⁶⁵ for v distinct tokens — ~3e-7 at 100 M
  * vocab). A collision MERGES the two tokens' document frequencies: df is
  * biased UP, so hapax_tokens / rare_token_fraction are biased DOWN — a
  * quality filter keyed on rare-token density gets strictly more
  * conservative, never more aggressive. The direction is bounded; the
  * magnitude at realistic vocabularies is negligible.
  */
object CorpusStats {

  /** (id, n_distinct_tokens, hapax_tokens, sum_df, rare_token_fraction):
    * hapax = tokens appearing in no other document. */
  def tokenDocFrequencyFeatures(
      df: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    // explode_OUTER: a doc with no alphanumeric tokens (empty, null, or
    // all-punctuation text) must still get its per-doc feature row
    // (0/0/0/0.0) — plain explode silently dropped it from the output,
    // breaking the per-doc contract for downstream joins
    val tok = df.select(
      F.col(idCol),
      F.explode_outer(
        graft.functions.TextHashExpressions.shingleHashes64(F.col(textCol), 1)).as("__t"))
    val dfreq = tok.filter(F.col("__t").isNotNull)
      .groupBy(F.col("__t")).agg(F.count(F.lit(1)).as("__df"))
    tok.join(dfreq, Seq("__t"), "left")
      .groupBy(F.col(idCol))
      .agg(
        F.count(F.col("__t")).as("n_distinct_tokens"),
        F.sum(F.when(F.col("__df") === 1, 1L).otherwise(0L)).as("hapax_tokens"),
        F.coalesce(F.sum(F.col("__df")), F.lit(0L)).as("sum_df"))
      .withColumn("rare_token_fraction",
        F.when(F.col("n_distinct_tokens") === 0, 0.0)
          .otherwise(F.col("hapax_tokens").cast("double") / F.col("n_distinct_tokens")))
  }

  /** One-row corpus vocabulary profile — the Zipf health check run before
    * committing to tokenizer/filter settings: total and distinct token
    * counts, hapax count, and the occurrence fraction covered by the topK
    * most frequent tokens (ties broken by token text, so the cut is
    * deterministic across engines). A top-100 coverage near 1 means the
    * corpus is boilerplate soup; hapax share near 1 means OCR garble.
    *
    * Shape: one token-keyed groupBy (map-side partial agg over the Zipf-hot
    * keys) + two scalar aggregates over the vocab-sized count table; the
    * topK cut is a TakeOrdered over that table, never over the corpus. */
  def vocabProfile(
      df: DataFrame,
      textCol: String,
      topK: Int = 100
  ): DataFrame = {
    require(topK > 0, "topK must be positive")
    val counts = df.select(F.explode(
        graft.functions.TextFunctions.tokens(F.col(textCol))).as("__t"))
      .groupBy("__t").agg(F.count(F.lit(1)).as("__cnt"))
    val totals = counts.agg(
      F.coalesce(F.sum("__cnt"), F.lit(0L)).as("total_tokens"),
      F.count(F.lit(1)).as("distinct_tokens"),
      F.coalesce(F.sum(F.when(F.col("__cnt") === 1, 1L).otherwise(0L)), F.lit(0L))
        .as("hapax_tokens"))
    val top = counts.orderBy(F.col("__cnt").desc, F.col("__t"))
      .limit(topK)
      .agg(F.coalesce(F.sum("__cnt"), F.lit(0L)).as("__topcnt"))
    totals.crossJoin(F.broadcast(top))
      .withColumn(s"top${topK}_coverage",
        F.when(F.col("total_tokens") > 0,
          F.col("__topcnt").cast("double") / F.col("total_tokens")))
      .drop("__topcnt")
  }

  /** Deterministic top-K token vocabulary (token, cnt, rank) over the
    * canonical unigram stream — the builder whose output feeds
    * [[graft.operators.Bpe]] as the `vocab_rel` of bpe_count /
    * select_token_budget / pack_sequences (word-level vocab + the BPE
    * expressions' single-byte fallback ≈ a unigram WordPiece). Rank is the
    * (count desc, token) order, ties broken by token text, so the vocab is
    * bit-identical across engines and runs.
    *
    * Shape: one token-keyed groupBy (map-side partial agg over the
    * Zipf-hot keys), then TakeOrdered + one ranking window over the
    * SIZE-bounded result (≤ [[graft.operators.Bpe.MaxVocab]] rows — the
    * single-partition window runs over the vocab cut, never the corpus;
    * the same bounded-small class as a driver collect of IVF centroids). */
  def buildVocab(
      df: DataFrame,
      textCol: String,
      size: Int
  ): DataFrame = {
    require(size > 0 && size <= graft.operators.Bpe.MaxVocab,
      s"size in 1..${graft.operators.Bpe.MaxVocab}")
    val counts = df.select(F.explode(
        graft.functions.TextFunctions.tokens(F.col(textCol))).as("token"))
      .groupBy("token").agg(F.count(F.lit(1)).as("cnt"))
      .orderBy(F.col("cnt").desc, F.col("token"))
      .limit(size)
    counts.withColumn("rank",
      F.row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(F.col("cnt").desc, F.col("token"))))
  }

  /** Heavy-hitter n-grams — the boilerplate-template discovery pass from
    * the C4/Gopher corpus analyses: the k most frequent space-joined
    * n-grams over the canonical token stream, (count desc, ngram) rank.
    * A template ("click here to subscribe") surfaces as a high-count long
    * n-gram; the standard move is to feed the offenders back as filter
    * patterns or dedup keys. Generalizes [[buildVocab]] (n = 1).
    *
    * Shape: n-grams build inside the per-doc token array against the
    * MATERIALIZED array column (element_at over an inline tokenize
    * subtree re-tokenizes per lambda element — the r16 DSIR lesson), one
    * gram-keyed groupBy (map-side partial agg over Zipf-hot keys),
    * TakeOrdered + ranking window over the k-bounded cut only. */
  def topNgrams(
      df: DataFrame,
      textCol: String,
      n: Int,
      k: Int
  ): DataFrame = {
    require(n >= 1 && n <= 8, "n in 1..8")
    require(k > 0 && k <= graft.operators.Bpe.MaxVocab,
      s"k in 1..${graft.operators.Bpe.MaxVocab}")
    val tc = F.col("__toks")
    val grams =
      if (n == 1) tc
      else F.when(F.size(tc) >= n,
          F.transform(F.sequence(F.lit(1), F.size(tc) - (n - 1)), i =>
            F.concat_ws(" ", (0 until n).map(j => F.element_at(tc, i + j)): _*)))
        .otherwise(F.array().cast("array<string>"))
    val counts = df
      .select(graft.functions.TextFunctions.tokens(F.col(textCol)).as("__toks"))
      .select(F.explode(grams).as("ngram"))
      .groupBy("ngram").agg(F.count(F.lit(1)).as("cnt"))
      .orderBy(F.col("cnt").desc, F.col("ngram"))
      .limit(k)
    counts.withColumn("rank",
      F.row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(F.col("cnt").desc, F.col("ngram"))))
  }

  /** Unigram-LM negative log-likelihood per document — the relational form
    * of the CCNet/Gopher perplexity quality filter: fit the unigram model
    * p(w) = count(w)/N on the corpus itself, score every doc by the mean
    * token NLL (avg over tokens of −ln p(w) = ln N − mean ln count(w)).
    * High-NLL docs are rare-token-dense (garble, OCR noise, boilerplate
    * soups score LOW — they repeat common tokens); the standard pipeline
    * move is a two-sided cut on this column.
    *
    * Tokens are the same lower/[^a-z0-9]+ stream every text operator here
    * uses, kept as STRINGS (not 64-bit hashes): the model join must be
    * collision-free for the score to be exactly reproducible in the
    * oracle, and the Zipf-skew story is unchanged (see the class scaladoc
    * — partial aggregation collapses hot tokens map-side; AQE splits the
    * skewed join). Plan shape at 100 TB: one token-keyed groupBy (the
    * model fit), one postings→model join + per-doc re-aggregation, one
    * 1-row broadcast of the corpus token total — no corpus-sized
    * collect anywhere.
    *
    * Output: (idCol, n_tokens, avg_nll) — avg_nll is null for token-free
    * docs, rounded via the shared +5e-9/4dp convention so the ln/division
    * accumulation-order noise can't straddle a rounding boundary across
    * engines. */
  def unigramNll(
      df: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame =
    unigramNllAgainst(df, idCol, textCol, unigramModel(df, textCol))

  /** The model half of [[unigramNll]] alone: (token `__tok`, count
    * `__cnt`) over the corpus token stream. Exposed so a STREAM can be
    * scored against a model fit ONCE on a static corpus
    * ([[graft.streaming.Subscribe.scoredAppend]] — the scorer family's
    * streaming-parity path): the fit is the stateful corpus pass; scoring
    * against it is stateless per document, so micro-batched scoring
    * reproduces the batch run row for row. */
  def unigramModel(df: DataFrame, textCol: String): DataFrame =
    df.select(
        F.explode(graft.functions.TextFunctions.tokens(F.col(textCol))).as("__tok"))
      .groupBy("__tok").agg(F.count(F.lit(1)).as("__cnt"))

  /** The scoring half of [[unigramNll]]: per-doc mean NLL of `docs`
    * against a pre-fit [[unigramModel]] (self-fit when called through
    * [[unigramNll]] — identical arithmetic, so the split is invisible to
    * the oracles). Tokens absent from the model (possible when docs ⊄ fit
    * corpus) count in n_tokens but contribute no log term — the OOV
    * convention that keeps the score total without smoothing. */
  def unigramNllAgainst(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: DataFrame
  ): DataFrame = {
    val tok = docs.select(
      F.col(idCol),
      F.explode_outer(
        graft.functions.TextFunctions.tokens(F.col(textCol))).as("__tok"))
    val total = model.agg(F.coalesce(F.sum("__cnt"), F.lit(0L)).as("__n"))
    tok.join(model, Seq("__tok"), "left")
      .groupBy(F.col(idCol))
      .agg(
        F.count(F.col("__tok")).as("n_tokens"),
        F.sum(F.log(F.col("__cnt").cast("double"))).as("__slc"))
      .crossJoin(F.broadcast(total))
      .withColumn("avg_nll",
        F.when(F.col("n_tokens") > 0,
          F.round(
            F.log(F.col("__n").cast("double")) -
              F.col("__slc") / F.col("n_tokens") + F.lit(5e-9), 4)))
      .select(idCol, "n_tokens", "avg_nll")
  }

  /** Bigram-LM mean negative log-likelihood per document with Stupid
    * Backoff (Brants et al. 2007, "Large Language Models in Machine
    * Translation") — the v2 of [[unigramNll]]: context-aware, so word-salad
    * docs that reuse common TOKENS in improbable ORDER (the failure mode a
    * unigram filter cannot see) score high. Per position i:
    *
    *   S(w_1)          = count(w_1) / N
    *   S(w_i | w_i-1)  = count(w_i-1 w_i) / count(w_i-1)   if bigram seen
    *                   = alpha * count(w_i) / N             otherwise
    *
    * with all counts fit on the corpus itself (every token has count >= 1,
    * so the score is total without smoothing). Stupid Backoff is the
    * standard web-scale choice precisely because the score needs no
    * normalization pass over the vocab — Kneser-Ney discounts would add a
    * vocab-sized join chain for near-identical filter rankings.
    *
    * The bigram model is COUNT-PRUNED: pairs seen fewer than `minCount`
    * times are dropped and their positions back off to alpha·unigram.
    * Pruning is what makes the model-side join scale-honest — the UNPRUNED
    * bigram-type table grows like the corpus itself (most bigrams are
    * hapax), while the pruned table is vocab-class-bounded; it is also
    * what keeps the backoff branch live when the model is fit on the
    * scoring corpus (self-fit makes every bigram "seen" at minCount = 1 —
    * the same reason Brants et al. count-threshold their n-grams).
    *
    * Plan shape at 100 TB: the (prev, cur) pairs are built INSIDE the
    * per-doc token array (transform over the array — no shuffle, no
    * per-doc window); then one token-keyed groupBy fits the unigram model,
    * one pair-keyed groupBy fits the bigram model, the bigram table is
    * enriched with its context counts by a MODEL-sized join (bigram-types
    * × 1, never postings-sized), and the postings stream takes exactly two
    * joins (unigram on cur, enriched bigram on (prev, cur)) before the
    * per-doc re-aggregation. Zipf skew story as the class scaladoc: map-
    * side partial agg collapses hot keys; AQE splits the skewed joins.
    *
    * Output: (idCol, n_tokens, avg_nll) — same contract and +5e-9/4dp
    * rounding convention as [[unigramNll]], so the DuckDB oracle
    * recomputes bit-identical values from string tokens. */
  /** (id, __prev, __cur) positional pair stream built INSIDE the per-doc
    * token array (no shuffle, no per-doc window); token-free docs keep a
    * (null, null) row so the per-doc contract survives the joins. Shared
    * by [[bigramNll]] and [[bigramNllKn]]. */
  private def bigramPairs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
        F.col(idCol),
        graft.functions.TextFunctions.tokens(F.col(textCol)).as("__toks"))
      .select(
        F.col(idCol),
        // explode_OUTER: token-free docs keep their (null, null) row so the
        // per-doc contract (n_tokens = 0, avg_nll null) survives the joins
        F.explode_outer(F.expr(
          "transform(__toks, (t, i) -> struct(" +
            "CASE WHEN i = 0 THEN CAST(NULL AS STRING) ELSE __toks[i-1] END AS prev, " +
            "t AS cur))")).as("__p"))
      .select(F.col(idCol), F.col("__p.prev").as("__prev"), F.col("__p.cur").as("__cur"))

  def bigramNll(
      df: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 0.4,
      minCount: Long = 2L
  ): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha in (0, 1]")
    require(minCount >= 1L, "minCount >= 1")
    val pairs = bigramPairs(df, idCol, textCol)
    val uni = pairs.filter(F.col("__cur").isNotNull)
      .groupBy("__cur").agg(F.count(F.lit(1)).as("__uc"))
    val total = uni.agg(F.coalesce(F.sum("__uc"), F.lit(0L)).as("__n"))
    val bi = pairs.filter(F.col("__prev").isNotNull)
      .groupBy("__prev", "__cur").agg(F.count(F.lit(1)).as("__bc"))
      .filter(F.col("__bc") >= minCount)
      // attach the context count model-side: ln S(cur|prev) = ln bc − ln uc(prev)
      .join(uni.select(F.col("__cur").as("__prev"), F.col("__uc").as("__pc")), Seq("__prev"))
      .select(F.col("__prev"), F.col("__cur"),
        (F.log(F.col("__bc").cast("double")) - F.log(F.col("__pc").cast("double")))
          .as("__lnp"))
    pairs
      .join(uni, Seq("__cur"), "left")
      .join(bi, Seq("__prev", "__cur"), "left")
      .crossJoin(F.broadcast(total))
      .withColumn("__nll",
        F.when(F.col("__cur").isNull, F.lit(null).cast("double"))
          .when(F.col("__prev").isNull, // first token: unigram
            F.log(F.col("__n").cast("double")) - F.log(F.col("__uc").cast("double")))
          .when(F.col("__lnp").isNotNull, -F.col("__lnp")) // bigram hit
          .otherwise( // backoff: −ln(alpha · uc/N)
            F.log(F.col("__n").cast("double")) - F.log(F.col("__uc").cast("double")) -
              F.lit(math.log(alpha))))
      .groupBy(F.col(idCol))
      .agg(
        F.count(F.col("__cur")).as("n_tokens"),
        F.sum(F.col("__nll")).as("__s"))
      .withColumn("avg_nll",
        F.when(F.col("n_tokens") > 0,
          F.round(F.col("__s") / F.col("n_tokens") + F.lit(5e-9), 4)))
      .select(idCol, "n_tokens", "avg_nll")
  }

  /** Bigram-LM mean NLL with interpolated KNESER-NEY smoothing (Kneser &
    * Ney 1995; the Chen & Goodman 1998 interpolated form) — the QUALITY
    * reference next to [[bigramNll]]'s web-scale Stupid Backoff. Per
    * position i > 1:
    *
    *   P(w|v) = max(c(v w) − D, 0) / c(v ·)
    *          + (D · N1+(v ·) / c(v ·)) · (N1+(· w) / N1+(· ·))
    *
    * where c(v ·) is v's CONTEXT count (occurrences followed by a token —
    * the proper KN denominator, not the unigram count), N1+(v ·) the
    * distinct continuations of v, N1+(· w) the distinct contexts of w (the
    * continuation probability — KN's insight: "Francisco" is frequent but
    * follows almost nothing), N1+(· ·) the bigram type count. The first
    * token scores unigram MLE like the SB path. Self-fit totality: every
    * non-first w has N1+(· w) ≥ 1 and every context v has N1+(v ·) ≥ 1, so
    * all branches are finite without extra smoothing.
    *
    * Pruning: the DISCOUNTED HIT term uses the `minCount`-pruned bigram
    * table (the 100 TB bound on bigram types — a pruned-away bigram falls
    * through to pure continuation mass, the standard pruned-KN
    * approximation); the type statistics (context/continuation/type
    * counts) come from the UNPRUNED type table via two map-side-collapsing
    * aggregations whose RESULTS are vocab-sized.
    *
    * Output contract and +5e-9/4dp rounding exactly as [[bigramNll]]; the
    * DuckDB oracle refits the whole model and mirrors the probability
    * expression operation-for-operation. */
  def bigramNllKn(
      df: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75,
      minCount: Long = 2L
  ): DataFrame = {
    require(discount > 0.0 && discount < 1.0, "discount in (0, 1)")
    require(minCount >= 1L, "minCount >= 1")
    val pairs = bigramPairs(df, idCol, textCol)
    val uni = pairs.filter(F.col("__cur").isNotNull)
      .groupBy("__cur").agg(F.count(F.lit(1)).as("__uc"))
    val total = uni.agg(F.coalesce(F.sum("__uc"), F.lit(0L)).as("__n"))
    val biAll = pairs.filter(F.col("__prev").isNotNull)
      .groupBy("__prev", "__cur").agg(F.count(F.lit(1)).as("__bc"))
    // context stats per prev: c(v ·) and N1+(v ·); continuation stats per
    // cur: N1+(· w); scalar N1+(· ·) — all from the unpruned type table
    val ctx = biAll.groupBy("__prev").agg(
      F.sum("__bc").as("__ctx"), F.count(F.lit(1)).as("__n1f"))
    val cont = biAll.groupBy("__cur").agg(F.count(F.lit(1)).as("__n1p"))
    val ntypes = biAll.agg(F.count(F.lit(1)).as("__nt"))
    val bi = biAll.filter(F.col("__bc") >= minCount)
    val d = F.lit(discount)
    pairs
      .join(uni, Seq("__cur"), "left")
      .join(bi, Seq("__prev", "__cur"), "left")
      .join(ctx, Seq("__prev"), "left")
      .join(cont, Seq("__cur"), "left")
      .crossJoin(F.broadcast(total))
      .crossJoin(F.broadcast(ntypes))
      .withColumn("__nll",
        F.when(F.col("__cur").isNull, F.lit(null).cast("double"))
          .when(F.col("__prev").isNull, // first token: unigram MLE, SB-identical
            F.log(F.col("__n").cast("double")) - F.log(F.col("__uc").cast("double")))
          .otherwise(-F.log(
            F.greatest(F.coalesce(F.col("__bc").cast("double"), F.lit(0.0)) - d, F.lit(0.0))
              / F.col("__ctx").cast("double")
              + (d * F.col("__n1f").cast("double") / F.col("__ctx").cast("double"))
              * (F.col("__n1p").cast("double") / F.col("__nt").cast("double")))))
      .groupBy(F.col(idCol))
      .agg(
        F.count(F.col("__cur")).as("n_tokens"),
        F.sum(F.col("__nll")).as("__s"))
      .withColumn("avg_nll",
        F.when(F.col("n_tokens") > 0,
          F.round(F.col("__s") / F.col("n_tokens") + F.lit(5e-9), 4)))
      .select(idCol, "n_tokens", "avg_nll")
  }
}
