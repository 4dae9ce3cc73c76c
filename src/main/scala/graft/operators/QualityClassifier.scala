package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Classifier-based quality filter — the standard THIRD net after
  * heuristics and perplexity (the GPT-3/LLaMA recipe: a linear classifier
  * over hashed token features, trained "good reference text vs corpus
  * boilerplate", scores every document; low scorers are dropped or
  * downsampled).
  *
  * Model: logistic regression over HASHED UNIGRAM features (feature
  * hashing, Weinberger et al. 2009): bucket(t) = first 3 hex chars of
  * md5(t) → [[Buckets]] buckets — portable arithmetic both engines
  * compute identically (Spark `conv(substr(md5,1,3),16,10)`, DuckDB
  * strpos-on-hex). Training is FIXED-ITERATION batch gradient descent
  * ([[Iters]] rounds, rate [[Lr]], zero init) over the labeled set,
  * run driver-side in a fully pinned order — docs by (label, id,
  * md5(text)), tokens by position — so every float op is replayable: the
  * DuckDB
  * oracle re-derives the exact weights by unrolling the training loop in
  * SQL (the bpe_train / trained-PQ precedent), and two Spark runs are
  * bitwise identical.
  *
  * 100 TB anatomy: the labeled set is SMALL by construction (reference
  * text vs sampled boilerplate — the GPT-3 classifier trained on tens of
  * thousands of pages), capped at [[MaxLabeled]] driver rows; what scales
  * is SCORING, which ships the dense weight vector with the plan (32 KB)
  * and is one pass over the corpus — no shuffle, no join, no UDF.
  *
  * Output: corpus keyed rows (idCol, quality_prob) — σ(margin) rounded
  * via the shared +5e-9/4dp convention; null text scores null.
  */
object QualityClassifier {

  /** Feature-hash buckets: 16³ (3 hex chars of md5). */
  val Buckets: Int = 4096

  /** Fixed gradient-descent iterations / learning rate — the DuckDB
    * oracle unrolls exactly this many rounds with exactly this rate. */
  val Iters: Int = 5
  val Lr: Double = 0.5

  /** Driver-collect cap on pos+neg labeled docs (rows), enforced IN THE
    * PLAN (a `limit(cap + 1)` per side) and checked with one small
    * aggregate job BEFORE `collect()` — an oversized labeled relation
    * fails with the named error without ever materializing on the
    * driver. */
  val MaxLabeled: Int = 100000

  /** Byte bound on the collected feature payload (4 bytes per token
    * bucket across all labeled docs) — the row cap alone would admit
    * 100K multi-page docs; this caps the driver heap regardless of doc
    * length. Checked in the same pre-collect aggregate. */
  val MaxLabeledBytes: Long = 256L << 20

  /** Portable token bucket, Scala side: parse the first 3 lowercase-hex
    * chars of md5(token). MUST stay identical to [[bucketCol]] and the
    * oracle's strpos arithmetic. */
  private[graft] def bucketOf(token: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 3 hex chars = hi nibble, lo nibble, hi nibble of bytes 0-1
    ((md(0) & 0xff) << 4) | ((md(1) & 0xff) >> 4)
  }

  /** Portable token bucket, Column side: conv(substr(md5, 1, 3), 16, 10). */
  private[graft] def bucketCol(token: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    F.conv(F.substring(F.md5(token.cast("binary")), 1, 3), 16, 10).cast("int")

  /** Train the logistic scorer on (pos = label 1, neg = label 0) and
    * return (weights dense over [[Buckets]], bias). Deterministic: docs
    * ordered (label, id, md5(text)), token buckets in position order,
    * margins and gradients accumulated sequentially in that order, update
    * w -= Lr * (grad / n) mirrored verbatim by the oracle SQL.
    *
    * Driver-safety contract: what crosses to the driver is
    * (id, md5(text), bucket array) ONLY — never the text (a multi-page
    * doc contributes 4 bytes per token, not its characters; the md5 is
    * the deterministic sort tie-break the text used to provide). The row
    * cap is pushed into the plan as `limit(maxLabeled + 1)` and both
    * bounds are verified by one small aggregate job BEFORE `collect()`. */
  private[graft] def train(
      pos: DataFrame,
      neg: DataFrame,
      idCol: String,
      textCol: String,
      maxLabeled: Int = MaxLabeled,
      maxLabeledBytes: Long = MaxLabeledBytes
  ): (Array[Double], Double) = {
    def prep(df: DataFrame, y: Int): DataFrame =
      df.select(
          F.lit(y).as("__y"),
          F.col(idCol).cast("string").as("__id"),
          F.md5(F.col(textCol).cast("string").cast("binary")).as("__th"),
          F.transform(
            graft.functions.TextFunctions.tokens(F.col(textCol)),
            t => bucketCol(t)).as("__bks"))
        .filter(F.col("__th").isNotNull)
        .limit(maxLabeled + 1)
    val labeled = prep(neg, 0).unionAll(prep(pos, 1))
    // bounds BEFORE any driver materialization: one tiny aggregate row
    val bounds = labeled.agg(
      F.count(F.lit(1)).as("n"),
      F.coalesce(F.sum(F.size(F.col("__bks")).cast("long")), F.lit(0L)).as("toks")
    ).head()
    val nDocs = bounds.getLong(0)
    val featBytes = bounds.getLong(1) * 4L
    require(nDocs > 0, "quality_classifier_score: empty labeled set")
    require(nDocs <= maxLabeled,
      s"quality_classifier_score: more than $maxLabeled labeled docs " +
        "exceed the driver-collect cap (enforced pre-collect)")
    require(featBytes <= maxLabeledBytes,
      s"quality_classifier_score: $featBytes labeled feature bytes exceed " +
        s"the $maxLabeledBytes driver-collect byte cap (enforced pre-collect)")
    val docs = labeled.collect()
      .map { r =>
        val bks = if (r.isNullAt(3)) Array.empty[Int]
          else r.getSeq[Int](3).toArray
        (r.getInt(0), r.getString(1), r.getString(2), bks)
      }
      .sortBy { case (y, id, th, _) => (y, id, th) }
    val n = docs.length.toDouble
    val w = new Array[Double](Buckets)
    var w0 = 0.0
    var it = 0
    while (it < Iters) {
      // margins + errors, in pinned doc order
      val errs = new Array[Double](docs.length)
      var d = 0
      while (d < docs.length) {
        val (y, _, _, bs) = docs(d)
        var m = 0.0
        var i = 0
        while (i < bs.length) { m += w(bs(i)); i += 1 }
        val marg = w0 + m
        errs(d) = 1.0 / (1.0 + math.exp(-marg)) - y
        d += 1
      }
      // gradients: per bucket, err summed over (doc order, position order)
      val grad = new Array[Double](Buckets)
      var gradBias = 0.0
      d = 0
      while (d < docs.length) {
        val bs = docs(d)._4
        var i = 0
        while (i < bs.length) { grad(bs(i)) += errs(d); i += 1 }
        gradBias += errs(d)
        d += 1
      }
      var b = 0
      while (b < Buckets) {
        if (grad(b) != 0.0) w(b) = w(b) - Lr * (grad(b) / n)
        b += 1
      }
      w0 = w0 - Lr * (gradBias / n)
      it += 1
    }
    (w, w0)
  }

  /** Score `corpus` with trained weights: one codegen-friendly pass —
    * margin = bias + Σ_tokens w[bucket(t)] in position order (the plan
    * ships the 4096-double weight array once). */
  private[graft] def score(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      weights: Array[Double],
      bias: Double
  ): DataFrame = {
    val wLit = F.typedLit(weights.toSeq)
    val toks = graft.functions.TextFunctions.tokens(F.col(textCol))
    val margin = F.lit(bias) + F.aggregate(
      toks, F.lit(0.0), (acc, t) => acc + F.get(wLit, bucketCol(t)))
    corpus.select(
      F.col(idCol),
      F.when(F.col(textCol).isNull, F.lit(null).cast("double"))
        .otherwise(F.round(
          F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)) + F.lit(5e-9), 4))
        .as("quality_prob"))
  }

  /** The composed surface: train on pos/neg, score the corpus. */
  def qualityClassifierScore(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      pos: DataFrame,
      neg: DataFrame
  ): DataFrame = {
    val (w, b) = train(pos, neg, idCol, textCol)
    score(corpus, idCol, textCol, w, b)
  }
}
