package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Exact BPE merge learning — the trainer that produces the vocab
  * [[Bpe]] counts with.
  *
  * Classic sequential BPE: start from single-byte symbols; repeatedly
  * count adjacent symbol pairs across the corpus and merge the most
  * frequent pair everywhere. The naive distributed form re-scans the
  * corpus once per merge — n_merges full scans, a non-starter at 100 TB.
  * The standard trainer shape (sentencepiece, HF tokenizers) is the one
  * implemented here: the corpus collapses to its WORD-FREQUENCY table in
  * ONE token-keyed groupBy (vocab-sized — Zipf-bounded, capped at
  * `maxWordTypes`, the same driver-footprint class as an IVF centroid
  * set), and the merge loop runs exactly, driver-side, over that bounded
  * table — pair counts are weighted by word frequency, so the result is
  * IDENTICAL to scanning the corpus per merge, at the cost of one scan
  * total.
  *
  * Determinism: the merged pair each round is the max by
  * (count, then lexicographically smallest pair) — reference trainers
  * break ties by insertion order, which is corpus-order-dependent; the
  * lexicographic rule makes the vocab bit-identical across engines, runs
  * and partitionings. Merges apply left-to-right non-overlapping within a
  * word (the HF convention). Words are the canonical
  * [[graft.functions.TextFunctions.tokens]] stream (pure ASCII, so merged
  * tokens are always valid strings); merges never cross word boundaries.
  *
  * Output: (token, left, right, pair_count, rank) — one row per merge in
  * merge order; (left, right) is the merged PAIR itself (what rank-ordered
  * inference — [[graft.functions.BpeMergeCountExpr]] — replays; the
  * concatenated `token` alone is ambiguous: "abc" could be a+bc or ab+c);
  * `pair_count` is the weighted pair frequency at merge time (a
  * non-increasing sequence: a merge can only create pairs no more
  * frequent than itself — gated in BpeSpec). Feeding the `token` column
  * to [[Bpe]]'s greedy longest-match is the standard inference
  * approximation of merge-order encoding.
  */
object BpeTrain {

  def bpeTrain(
      df: DataFrame,
      textCol: String,
      nMerges: Int,
      maxWordTypes: Int = 1 << 20
  ): DataFrame = {
    require(nMerges > 0 && nMerges <= 65536, "nMerges in 1..65536")
    require(maxWordTypes > 0 && maxWordTypes <= (1 << 20),
      s"maxWordTypes in 1..${1 << 20}")
    val spark = df.sparkSession
    // ONE corpus scan: word types + frequencies, most frequent first (the
    // cap drops the rarest types — at a realistic Zipf tail those carry a
    // vanishing share of pair mass)
    val wc: Array[(String, Long)] = df
      .select(F.explode(graft.functions.TextFunctions.tokens(F.col(textCol))).as("w"))
      .groupBy("w").agg(F.count(F.lit(1)).as("cnt"))
      .orderBy(F.col("cnt").desc, F.col("w"))
      .limit(maxWordTypes)
      .collect().map(r => r.getString(0) -> r.getLong(1))

    // driver merge loop over the bounded word table
    var words: Array[(Array[String], Long)] =
      wc.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var m = 0
    var done = false
    while (m < nMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val ((a, b), cnt) = pairCounts.minBy { case ((x, y), c) => (-c, x, y) }
        merges += ((a, b, cnt))
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                out += a + b; i += 2 // left-to-right non-overlapping
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, c)
          }
        }
        m += 1
      }
    }
    import scala.jdk.CollectionConverters._
    val rows = merges.zipWithIndex.map { case ((a, b, c), i) =>
      org.apache.spark.sql.Row(a + b, a, b, c, i + 1)
    }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("token",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("left",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("right",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("pair_count",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.IntegerType, nullable = false))))
  }
}
