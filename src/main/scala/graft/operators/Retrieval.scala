package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Lexical retrieval over the corpus — BM25 (Robertson/Spärck Jones;
  * the Okapi weighting every search engine and every retrieval-based
  * decontamination/data-selection pipeline uses). Training-data uses:
  * retrieve the corpus documents most similar to an eval/benchmark set
  * (retrieval-based contamination auditing — the net that catches
  * paraphrased leaks n-gram overlap misses at lower cost than
  * embeddings), and targeted data selection ("find more docs like this
  * reference set").
  *
  * Scoring (the Lucene-standard non-negative idf variant):
  *
  *   idf(t)      = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
  *   score(q, d) = Σ_{t ∈ distinct(q) ∩ d} idf(t) ·
  *                   tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))
  *
  * with N = corpus docs with non-null text, dl = token count, avgdl their
  * mean, query terms DISTINCT (qtf collapses to 1 — the common engine
  * default). Every input to the float math is an exact integer aggregate,
  * so DuckDB recomputes identical doubles; the final score is rounded via
  * the shared +5e-9/4dp convention to absorb Σ accumulation-order noise.
  *
  * Plan shape at 100 TB: tokens are the engine-wide lower/[^a-z0-9]+
  * stream; postings = one (doc, token)-keyed groupBy (partial agg
  * collapses hot tokens map-side); doc lengths one doc-keyed groupBy;
  * df/idf one token-keyed groupBy over postings (model-sized). The query
  * side is SMALL by construction (a benchmark/reference set) and is
  * broadcast into the postings join; per-(query, doc) scores are one
  * aggregation and the top-k is a per-query window over only docs sharing
  * ≥1 term. The corpus is never cross-joined and never collected. */
object Retrieval {

  def bm25TopK(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      queryId: String,
      queryText: String,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(k >= 1, s"bm25_topk: k must be >= 1, got $k")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bm25_topk: need k1 >= 0 and b in [0,1]")
    val docs = corpus.filter(F.col(textCol).isNotNull)
      .select(F.col(idCol).as("corpus_id"),
        graft.functions.TextFunctions.tokens(F.col(textCol)).as("__toks"))
    val postings = docs
      .select(F.col("corpus_id"), F.explode(F.col("__toks")).as("__tok"))
      .groupBy("corpus_id", "__tok")
      .agg(F.count(F.lit(1)).as("__tf"))
    val dl = docs.select(F.col("corpus_id"), F.size(F.col("__toks")).cast("long").as("__dl"))
    // N and avgdl over non-null-text docs (token-free docs keep dl = 0 —
    // they can never match, but they ARE corpus documents)
    val stats = dl.agg(
      F.count(F.lit(1)).as("__n"),
      F.avg(F.col("__dl").cast("double")).as("__avgdl"))
    val df = postings.groupBy("__tok").agg(F.count(F.lit(1)).as("__df"))
    val idf = df.crossJoin(F.broadcast(stats))
      .select(F.col("__tok"),
        F.log(F.lit(1.0) +
          (F.col("__n").cast("double") - F.col("__df") + F.lit(0.5)) /
            (F.col("__df") + F.lit(0.5))).as("__idf"),
        F.col("__avgdl"))
    val qTerms = queries.filter(F.col(queryText).isNotNull)
      .select(F.col(queryId).as("query_id"),
        F.explode(graft.functions.TextFunctions.tokens(F.col(queryText))).as("__tok"))
      .distinct()
    val terms = postings
      .join(F.broadcast(qTerms), Seq("__tok"))
      .join(idf, Seq("__tok"))
      .join(dl, Seq("corpus_id"))
      .select(F.col("query_id"), F.col("corpus_id"),
        (F.col("__idf") * (F.col("__tf") * (F.lit(k1) + 1.0)) /
          (F.col("__tf") + F.lit(k1) *
            (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))))
          .as("__term"))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("bm25").desc, F.col("corpus_id").asc)
    terms
      .groupBy("query_id", "corpus_id")
      .agg(F.round(F.sum("__term") + F.lit(5e-9), 4).as("bm25"))
      .withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "corpus_id", "bm25", "rank")
  }
}
