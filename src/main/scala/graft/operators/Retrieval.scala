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

  /** Per-document top-k tf-idf keywords — the classic corpus-analysis /
    * doc-labeling / boilerplate-spotting view (a template token that
    * appears everywhere scores idf ln(N/N) = 0; a doc's distinctive terms
    * float to the top). tf = raw in-doc count, idf = ln(N / df) over
    * non-null-text docs, score rounded via the shared +5e-9/4dp
    * convention; ties (tfidf desc, token asc). One postings groupBy + one
    * df groupBy + a per-doc window over the doc's own DISTINCT terms —
    * nothing corpus-quadratic, nothing collected. Output (idCol, token,
    * tfidf, rank). */
  def keywordsTfidf(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5
  ): DataFrame = {
    require(k >= 1, s"keywords_tfidf: k must be >= 1, got $k")
    val docs = corpus.filter(F.col(textCol).isNotNull)
      .select(F.col(idCol),
        graft.functions.TextFunctions.tokens(F.col(textCol)).as("__toks"))
    val postings = docs
      .select(F.col(idCol), F.explode(F.col("__toks")).as("token"))
      .groupBy(idCol, "token")
      .agg(F.count(F.lit(1)).as("__tf"))
    val total = docs.agg(F.count(F.lit(1)).as("__n"))
    val df = postings.groupBy("token").agg(F.count(F.lit(1)).as("__df"))
    val idf = df.crossJoin(F.broadcast(total))
      .select(F.col("token"),
        F.log(F.col("__n").cast("double") / F.col("__df")).as("__idf"))
    val w = Window.partitionBy(idCol)
      .orderBy(F.col("tfidf").desc, F.col("token").asc)
    postings.join(idf, Seq("token"))
      .withColumn("tfidf", F.round(F.col("__tf") * F.col("__idf") + F.lit(5e-9), 4))
      .withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select(F.col(idCol), F.col("token"), F.col("tfidf"), F.col("rank"))
  }

  // ---------------------------------------------------------------------------
  // Persisted BM25 index (the int8/PQ-index pattern for retrieval)
  // ---------------------------------------------------------------------------

  /** Postings partition-bucket count: `tok_grp = crc32(token) % 64` keeps
    * directories FS-block-sized while a probe over any realistic query
    * set touches a strict subset — the bucket values are engine-internal
    * (results are identical to the flat scorer, so the oracle never sees
    * them). */
  val IndexTokGroups = 64

  private def tokGrp(tok: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    F.pmod(F.crc32(tok.cast("binary")), F.lit(IndexTokGroups.toLong)).cast("int")

  /** Schema of the written postings directory (tok_grp is the partition
    * column) — supplied explicitly on every read-back so a DEGENERATE
    * corpus (zero non-null-text docs ⇒ a partitioned write that emits no
    * part files) reads back as a complete empty index instead of dying
    * mid-write on schema inference (ADVICE r17). */
  private def postingsSchema(idType: org.apache.spark.sql.types.DataType) =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("corpus_id", idType),
      org.apache.spark.sql.types.StructField("__tok",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("__tf",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("__dl",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("tok_grp",
        org.apache.spark.sql.types.IntegerType)))

  /** Read back a persisted postings directory with the explicit schema
    * (id type from the `_meta` sibling) — works even when the partitioned
    * write emitted zero part files. */
  def readPostings(
      spark: org.apache.spark.sql.SparkSession,
      path: String
  ): DataFrame = {
    val meta = graft.Tables.readPath(spark, path + "_meta").head()
    val idType = org.apache.spark.sql.types.DataType.fromDDL(
      meta.getString(meta.fieldIndex("id_type")))
    spark.read.schema(postingsSchema(idType)).parquet(path)
  }

  /** Write the persisted BM25 index: postings at `path` partitioned by
    * `tok_grp` — (corpus_id, __tok, __tf, __dl), doc length DENORMALIZED
    * onto every posting so the query path never re-joins a doc table —
    * plus a `path + "_df"` token→document-frequency sibling and a 1-row
    * `path + "_meta"` (n, avgdl, dl_sum, id_type). Build is offline
    * (CTAS-class); queries go through [[bm25IndexTopK]], whose postings
    * scan is PRUNED to the probe buckets (PlanSpec gates
    * PartitionFilters).
    *
    * Consistency: the per-doc length frame `dl` is PERSISTED and
    * materialized before any output write — postings join against that
    * snapshot and `_meta` aggregates it, so the three outputs always
    * describe one corpus state (a doc landing mid-build is excluded from
    * all three; the old code recomputed meta from the live corpus and
    * could silently disagree with the persisted postings — ADVICE r17).
    * `_df` derives from the WRITTEN postings, the one durable
    * materialization. `dl_sum` (exact long) + `n` in meta are what make
    * [[bm25IndexAppend]]'s incremental avgdl bitwise a full rebuild's:
    * doc lengths are integers, so double summation is exact in any
    * order and avg ≡ dl_sum.toDouble / n. */
  def writeBm25Index(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      path: String
  ): Unit = {
    val spark = corpus.sparkSession
    val idType = corpus.schema(idCol).dataType
    val docs = corpus.filter(F.col(textCol).isNotNull)
      .select(F.col(idCol).as("corpus_id"),
        graft.functions.TextFunctions.tokens(F.col(textCol)).as("__toks"))
    val dl = docs.select(F.col("corpus_id"), F.size(F.col("__toks")).cast("long").as("__dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      dl.count() // pin the snapshot BEFORE the first output write
      val postings = docs
        .select(F.col("corpus_id"), F.explode(F.col("__toks")).as("__tok"))
        .groupBy("corpus_id", "__tok")
        .agg(F.count(F.lit(1)).as("__tf"))
        .join(dl, Seq("corpus_id"))
        .withColumn("tok_grp", tokGrp(F.col("__tok")))
      postings.write.mode("overwrite").partitionBy("tok_grp").parquet(path)
      val written = spark.read.schema(postingsSchema(idType)).parquet(path)
      written.groupBy("__tok").agg(F.count(F.lit(1)).as("__df"))
        .write.mode("overwrite").parquet(path + "_df")
      dl.agg(
          F.count(F.lit(1)).as("n"),
          F.avg(F.col("__dl").cast("double")).as("avgdl"),
          F.coalesce(F.sum(F.col("__dl")), F.lit(0L)).as("dl_sum"))
        .withColumn("id_type", F.lit(idType.catalogString))
        .repartition(1)
        .write.mode("overwrite").parquet(path + "_meta")
    } finally dl.unpersist()
  }

  /** Incrementally merge a NEW batch of documents into a persisted BM25
    * index — the recurring-crawl maintenance path (the index family was
    * build-once before this; a nightly batch forced a full corpus
    * rebuild). The batch's postings land as APPENDED files inside their
    * tok_grp partitions (pre-existing index files are never touched —
    * spec-gated), `_df` gains the batch's per-token doc counts, and
    * `_meta` advances (n, dl_sum) by exact integer arithmetic — so
    * [[bm25IndexTopK]] over the appended index is BITWISE a full rebuild
    * over corpus ∪ batch (q_bm25_index_append reuses the full-recompute
    * oracle SQL). The corpus is NEVER re-read: cost scales with |batch|,
    * not |index|.
    *
    * Batch ids are assumed NEW (the crawl shape). A re-appended id is not
    * merged into its prior postings — it scores as a separate doc, i.e.
    * the rebuild-equivalent of corpus ⊎ batch as a bag union. */
  def bm25IndexAppend(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      batch: DataFrame,
      idCol: String,
      textCol: String
  ): Unit = {
    val meta = graft.Tables.readPath(spark, indexPath + "_meta").head()
    val n = meta.getLong(meta.fieldIndex("n"))
    val dlSum = meta.getLong(meta.fieldIndex("dl_sum"))
    val idType = org.apache.spark.sql.types.DataType.fromDDL(
      meta.getString(meta.fieldIndex("id_type")))
    val docs = batch.filter(F.col(textCol).isNotNull)
      .select(F.col(idCol).cast(idType).as("corpus_id"),
        graft.functions.TextFunctions.tokens(F.col(textCol)).as("__toks"))
    val dl = docs.select(F.col("corpus_id"), F.size(F.col("__toks")).cast("long").as("__dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val agg = dl.agg(
        F.count(F.lit(1)).as("bn"),
        F.coalesce(F.sum(F.col("__dl")), F.lit(0L)).as("bsum")).head()
      val bn = agg.getLong(0)
      val bSum = agg.getLong(1)
      if (bn > 0) {
        val postings = docs
          .select(F.col("corpus_id"), F.explode(F.col("__toks")).as("__tok"))
          .groupBy("corpus_id", "__tok")
          .agg(F.count(F.lit(1)).as("__tf"))
          .join(dl, Seq("corpus_id"))
          .withColumn("tok_grp", tokGrp(F.col("__tok")))
        postings.write.mode("append").partitionBy("tok_grp").parquet(indexPath)
        // _df merge: model-sized union + re-sum, written to a staged
        // sibling then swapped in (Spark cannot overwrite a path a live
        // plan is still reading)
        val bDf = postings.groupBy("__tok").agg(F.count(F.lit(1)).as("__df"))
        val oldDf = graft.Tables.readPath(spark, indexPath + "_df")
        val merged = oldDf.unionAll(bDf)
          .groupBy("__tok").agg(F.sum(F.col("__df")).as("__df"))
        val staged = indexPath + "_df_staged"
        merged.write.mode("overwrite").parquet(staged)
        val hconf = spark.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(indexPath + "_df").getFileSystem(hconf)
        fs.delete(new org.apache.hadoop.fs.Path(indexPath + "_df"), true)
        fs.rename(new org.apache.hadoop.fs.Path(staged),
          new org.apache.hadoop.fs.Path(indexPath + "_df"))
      }
      val n2 = n + bn
      val dlSum2 = dlSum + bSum
      val avgdl2: java.lang.Double = if (n2 == 0) null else dlSum2.toDouble / n2
      import spark.implicits._
      Seq((n2, Option(avgdl2).map(_.doubleValue()), dlSum2, idType.catalogString))
        .toDF("n", "avgdl", "dl_sum", "id_type")
        .repartition(1)
        .write.mode("overwrite").parquet(indexPath + "_meta")
    } finally dl.unpersist()
  }

  /** Top-k BM25 over a PERSISTED index: the postings scan reads ONLY the
    * partitions of the query terms' buckets (a bounded ≤
    * [[IndexTokGroups]]-value driver collect feeds a static partition
    * filter), the idf table is the model-sized `_df` sibling, and (n,
    * avgdl) come from the 1-row meta — identical arithmetic to
    * [[bm25TopK]], so results are bitwise the flat scorer's (spec-gated;
    * the oracle row reuses q_bm25_topk's SQL). */
  def bm25IndexTopK(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      queries: DataFrame,
      queryId: String,
      queryText: String,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(k >= 1, s"bm25_topk_index: k must be >= 1, got $k")
    val meta = graft.Tables.readPath(spark, indexPath + "_meta").head()
    val n = meta.getLong(meta.fieldIndex("n"))
    if (n == 0 || meta.isNullAt(meta.fieldIndex("avgdl"))) {
      // index built over a corpus with zero non-null-text docs: degrade
      // exactly like the flat scorer on an empty corpus — an empty
      // (query_id, corpus_id, bm25, rank) frame, never an NPE (ADVICE r17)
      val idType = org.apache.spark.sql.types.DataType.fromDDL(
        meta.getString(meta.fieldIndex("id_type")))
      return queries.limit(0)
        .select(F.col(queryId).as("query_id"),
          F.lit(null).cast(idType).as("corpus_id"),
          F.lit(null).cast("double").as("bm25"),
          F.lit(null).cast("int").as("rank"))
    }
    val avgdl = meta.getDouble(meta.fieldIndex("avgdl"))
    val idf = graft.Tables.readPath(spark, indexPath + "_df")
      .select(F.col("__tok"),
        F.log(F.lit(1.0) +
          (F.lit(n.toDouble) - F.col("__df") + F.lit(0.5)) /
            (F.col("__df") + F.lit(0.5))).as("__idf"))
    val qTerms = queries.filter(F.col(queryText).isNotNull)
      .select(F.col(queryId).as("query_id"),
        F.explode(graft.functions.TextFunctions.tokens(F.col(queryText))).as("__tok"))
      .distinct()
    // probe buckets: a ≤IndexTokGroups-value driver collect (the bounded
    // class) → STATIC partition filter, so the scan lists/opens only the
    // probe directories
    val grps = qTerms.select(tokGrp(F.col("__tok")).as("g")).distinct()
      .collect().map(_.getInt(0)).sorted
    val post = spark.read
      .schema(postingsSchema(org.apache.spark.sql.types.DataType.fromDDL(
        meta.getString(meta.fieldIndex("id_type")))))
      .parquet(indexPath)
      .filter(F.col("tok_grp").isin(grps.map(Integer.valueOf).toSeq: _*))
    val terms = post
      .join(F.broadcast(qTerms), Seq("__tok"))
      .join(idf, Seq("__tok"))
      .select(F.col("query_id"), F.col("corpus_id"),
        (F.col("__idf") * (F.col("__tf") * (F.lit(k1) + 1.0)) /
          (F.col("__tf") + F.lit(k1) *
            (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.lit(avgdl))))
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
