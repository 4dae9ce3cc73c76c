package graft.operators

import graft.SparkTestBase
import graft.functions.TextFunctions
import org.apache.spark.sql.{functions => F}

class PipelineSpec extends SparkTestBase {

  lazy val docs = table("documents")
  lazy val embs = table("embeddings")

  test("text functions: tokens, quality, langid, fingerprint are total") {
    val out = docs.select(
      F.col("doc_id"),
      TextFunctions.tokenCount(F.col("text")).as("n_tokens"),
      TextFunctions.qualityScore(F.col("text")).as("quality"),
      TextFunctions.langId(F.col("text")).as("lang_guess"),
      TextFunctions.fingerprint(F.col("text")).as("fp")
    ).collect()
    assert(out.length == docs.count())
    assert(out.forall(r => r.getInt(1) > 0))
    assert(out.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    assert(out.forall(r => Set("en", "de", "fr", "es", "und").contains(r.getString(3))))
    assert(out.forall(r => r.getString(4).length == 32))
  }

  test("one tokenizer: hash-kernel stream equals regex stream per doc (mixed Unicode)") {
    import spark.implicits._
    // Two unigram tokenizers coexist by design (the one-pass hash kernel
    // used by dedup/token-stats/decontamination, and TextFunctions.tokens'
    // lower + [^a-z0-9]+ split used by perplexity/budget/vocab/packing);
    // this gate makes drift loud: per-doc DISTINCT token counts must agree
    // (the kernel emits sorted-distinct hashes; FNV collisions inside a
    // <100-token doc are ~impossible) over content hitting every
    // divergence class — case folding, digits, punctuation runs, accents,
    // CJK, emoji, combining marks, Turkish İ/ı (U+0130's 1:N lowercase
    // mapping), Kelvin sign (U+212A → k), Greek final sigma, ligatures,
    // null/empty/token-free docs.
    val rows = Seq(
      (1L, "The quick-BROWN fox; jumps_over 42 lazy DOGS!!"),
      (2L, "state-of-the-art   NLP  (2024): résumé café naïve"),
      (3L, "İstanbul ısparta İİİ xİy KELVINKsign"),
      (4L, "Σίσυφος ΣΊΣΥΦΟΣ 数学テスト 🚀🔥 emoji42mix"),
      (5L, "ȧb ćd ﬁligature ﬆop"),
      (6L, "!!! ... --- ___ \t\n "),
      (7L, ""),
      (8L, null.asInstanceOf[String]),
      (9L, "MixedCASE123abc DEF456ghi x1y2z3 0001 0x1F"),
      (10L, "word word word repeated repeated unique")
    ).toDF("doc_id", "text")
    def gate(df: org.apache.spark.sql.DataFrame, idCol: String): Unit = {
      val bad = df.select(
          F.col(idCol),
          F.size(graft.functions.TextHashExpressions
            .shingleHashes64(F.col("text"), 1)).as("kernel_distinct"),
          F.size(F.array_distinct(TextFunctions.tokens(F.col("text"))))
            .as("regex_distinct"))
        .filter(!(F.col("kernel_distinct") <=> F.col("regex_distinct")))
        .collect()
      assert(bad.isEmpty, s"tokenizer streams diverge: ${bad.mkString(", ")}")
    }
    gate(rows, "doc_id")
    gate(docs, "doc_id") // and over the real corpus
  }

  test("exact dedup: duplicated text collapses") {
    val withDup = docs.limit(10).union(docs.limit(3)) // 3 exact dups
    val groups = Dedup.exactGroups(withDup, "doc_id", "text")
    assert(groups.count() == 10)
    assert(groups.filter(F.col("dup_count") === 2).count() == 3)
  }

  test("bloom dedup: exactly exactGroups' rows at any fpp, nulls stay unique") {
    import spark.implicits._
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("keep_id", "fingerprint").collect().map(_.toString).toSeq
    val base = docs.select("doc_id", "text")
    val withDup = base.limit(10).union(base.limit(3))
      .union(Seq((777001L, null.asInstanceOf[String]),
        (777002L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val expected = canon(Dedup.exactGroups(withDup, "doc_id", "text"))
    // default fpp: bloom prunes, results identical; the two null-text rows
    // must NOT collapse into one group
    val bloomed = canon(Dedup.bloomExactGroups(withDup, "doc_id", "text"))
    assert(bloomed == expected, "bloom tier diverged from exact dedup")
    assert(expected.count(_.contains("__null__")) == 2, "null rows must stay unique")
    // a saturated bloom (fpp ~ 1 via huge expectedItems vs tiny bits) can
    // only send MORE rows to the recheck — never change the answer
    val saturated = canon(Dedup.bloomExactGroups(withDup, "doc_id", "text",
      fpp = 0.9, expectedItems = Some(5L)))
    assert(saturated == expected, "saturated bloom changed the answer")
    // and over the real corpus: bloom == exact, row for row
    assert(canon(Dedup.bloomExactGroups(docs, "doc_id", "text")) ==
      canon(Dedup.exactGroups(docs, "doc_id", "text")))
  }

  test("bloom incremental dedup: corpus hits flagged, novel kept, nulls never dup") {
    import spark.implicits._
    val corpus = docs.select("doc_id", "text")
    val batch = corpus.filter(F.col("doc_id") < 10)
      .union(Seq(
        (800001L, "a genuinely novel crawl document qqxz"),
        (800002L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val r = Dedup.bloomDedupAgainst(corpus, batch, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r.length == 12)
    // the 10 corpus-drawn docs are exact hits; dup_of = the smallest
    // corpus id with the same fingerprint (itself unless an exact twin
    // with a smaller id exists — either way non-null)
    r.filter(_.getLong(0) < 10).foreach { row =>
      assert(row.getBoolean(1) && !row.isNullAt(2), s"missed corpus hit: $row")
    }
    val novel = r.find(_.getLong(0) == 800001L).get
    assert(!novel.getBoolean(1) && novel.isNullAt(2), s"novel doc flagged: $novel")
    val nul = r.find(_.getLong(0) == 800002L).get
    assert(!nul.getBoolean(1) && nul.isNullAt(2), "null text must never be a dup")
    // a saturated bloom only sends MORE rows to the exact recheck
    val sat = Dedup.bloomDedupAgainst(corpus, batch, "doc_id", "text",
      fpp = 0.9, expectedItems = Some(5L)).orderBy("doc_id").collect()
    assert(sat.map(_.toString).toSeq == r.map(_.toString).toSeq,
      "saturated bloom changed the answer")
    // the recheck probes the corpus with BROADCAST candidate joins — the
    // corpus rows themselves never shuffle (exchanges are candidate-sized:
    // the candidate distinct + the match groupBy)
    val plan = Dedup.bloomDedupAgainst(corpus, batch, "doc_id", "text")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val shuffles = plan.linesIterator.count(_.matches("""\(\d+\) Exchange\s*"""))
    assert(shuffles <= 2, s"corpus-sized shuffle crept in ($shuffles exchanges):\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"recheck not broadcast:\n$plan")
  }

  test("bm25: rare-term routing, duplicate ties, positivity, determinism") {
    import spark.implicits._
    // NOTE: "self ranks first" is NOT a BM25 invariant — length
    // normalization (b = 0.75) can legitimately rank a shorter doc
    // carrying the query's rare terms above the query's own longer copy
    // (observed on the synthetic corpus). Pin what IS guaranteed instead.
    val planted = Seq(
      (910001L, "zqqzv zqqzv zqqzv"), // unique term: only candidate is itself
      (910002L, "the corpus shares these common words"),
      (910003L, "the corpus shares these common words") // exact dup of 910002
    ).toDF("doc_id", "text")
    val corpus = docs.select("doc_id", "text").union(planted)
    val q1 = planted.filter(F.col("doc_id") === 910001L)
    val r1 = Retrieval.bm25TopK(corpus, "doc_id", "text", q1, "doc_id", "text", k = 5)
      .collect()
    // the query's only term occurs in exactly one corpus doc — itself
    assert(r1.length == 1 && r1.head.getLong(1) == 910001L && r1.head.getInt(3) == 1,
      s"rare-term routing failed: ${r1.mkString(", ")}")
    // exact duplicates score identically; the tie breaks to the smaller id
    val q2 = planted.filter(F.col("doc_id") === 910002L)
    val r2 = Retrieval.bm25TopK(corpus, "doc_id", "text", q2, "doc_id", "text", k = 5)
      .collect()
    val dupRows = r2.filter(r => r.getLong(1) == 910002L || r.getLong(1) == 910003L)
    assert(dupRows.length == 2 &&
      dupRows.map(_.getDouble(2)).distinct.length == 1 &&
      dupRows.minBy(_.getInt(3)).getLong(1) == 910002L,
      s"duplicate tie handling failed: ${dupRows.mkString(", ")}")
    // corpus-wide run: scores strictly positive (Lucene non-negative idf),
    // ranks dense 1..k, deterministic across two independent plans
    val queries = docs.filter(F.col("doc_id") < 3).select("doc_id", "text")
    val r = Retrieval.bm25TopK(docs, "doc_id", "text", queries, "doc_id", "text", k = 5)
      .collect()
    assert(r.forall(_.getDouble(2) > 0.0), "non-positive bm25 score")
    assert(Seq(0L, 1L, 2L).forall(q =>
      r.filter(_.getLong(0) == q).map(_.getInt(3)).sorted.toSeq == (1 to 5)))
    val again = Retrieval.bm25TopK(docs, "doc_id", "text",
      queries, "doc_id", "text", k = 5).collect()
    assert(r.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("bm25 persisted index: bitwise the flat scorer's rows") {
    val path = java.nio.file.Files.createTempDirectory("bm25_idx").toString + "/idx"
    Retrieval.writeBm25Index(docs, "doc_id", "text", path)
    val queries = docs.filter(F.col("doc_id") < 3).select("doc_id", "text")
    val flat = Retrieval.bm25TopK(docs, "doc_id", "text",
        queries, "doc_id", "text", k = 5)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val idx = Retrieval.bm25IndexTopK(spark, path, queries, "doc_id", "text", k = 5)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(idx == flat, "index serving diverged from the flat scorer")
    // the meta sibling really is 1 row and the postings carry dl denormalized
    assert(spark.read.parquet(path + "_meta").count() == 1)
    assert(spark.read.parquet(path).columns.toSet ==
      Set("corpus_id", "__tok", "__tf", "__dl", "tok_grp"))
  }

  test("bm25 index append: bitwise a full rebuild, pre-append files untouched") {
    val path = java.nio.file.Files.createTempDirectory("bm25_appidx").toString + "/idx"
    val corpus = docs.filter(F.col("doc_id") % 4 =!= 0)
    val batch = docs.filter(F.col("doc_id") % 4 === 0).select("doc_id", "text")
    Retrieval.writeBm25Index(corpus, "doc_id", "text", path)
    // snapshot every data file of the index BEFORE the append
    def listing(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.length()).toMap
    }
    val before = listing()
    assert(before.nonEmpty)
    Retrieval.bm25IndexAppend(spark, path, batch, "doc_id", "text")
    val after = listing()
    // the append NEVER rewrites the existing index: every pre-append file
    // survives byte-identical; the batch lands as strictly new files
    before.foreach { case (f, len) =>
      assert(after.get(f).contains(len), s"pre-append index file changed: $f")
    }
    assert(after.size > before.size, "append added no postings files")
    // serving over the appended index is BITWISE a full rebuild over
    // corpus ∪ batch
    val rebuilt = java.nio.file.Files.createTempDirectory("bm25_reidx").toString + "/idx"
    Retrieval.writeBm25Index(docs, "doc_id", "text", rebuilt)
    val queries = docs.filter(F.col("doc_id") < 3).select("doc_id", "text")
    val a = Retrieval.bm25IndexTopK(spark, path, queries, "doc_id", "text", k = 5)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val b = Retrieval.bm25IndexTopK(spark, rebuilt, queries, "doc_id", "text", k = 5)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(a == b, "appended index diverged from the full rebuild")
    // meta advanced by exact arithmetic: n equals the rebuild's n and
    // avgdl is bitwise the rebuild's double
    val mA = spark.read.parquet(path + "_meta").head()
    val mB = spark.read.parquet(rebuilt + "_meta").head()
    assert(mA.getLong(mA.fieldIndex("n")) == mB.getLong(mB.fieldIndex("n")))
    assert(java.lang.Double.doubleToLongBits(mA.getDouble(mA.fieldIndex("avgdl"))) ==
      java.lang.Double.doubleToLongBits(mB.getDouble(mB.fieldIndex("avgdl"))),
      "incremental avgdl not bitwise the rebuild's")
  }

  test("bm25 degenerate corpus: complete empty index, empty serving frame") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val allNull = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    for (corpus <- Seq(empty, allNull)) {
      val path = java.nio.file.Files.createTempDirectory("bm25_degidx").toString + "/idx"
      // the old writer died mid-write on schema inference here, leaving a
      // partial index (postings dir without _df/_meta) — now all three
      // siblings land
      Retrieval.writeBm25Index(corpus, "doc_id", "text", path)
      assert(Retrieval.readPostings(spark, path).count() == 0)
      assert(spark.read.parquet(path + "_df").count() == 0)
      val meta = spark.read.parquet(path + "_meta").head()
      assert(meta.getLong(meta.fieldIndex("n")) == 0)
      assert(meta.isNullAt(meta.fieldIndex("avgdl")))
      // serving degrades exactly like the flat scorer: empty frame, same
      // columns, no NPE
      val queries = docs.filter(F.col("doc_id") < 3).select("doc_id", "text")
      val served = Retrieval.bm25IndexTopK(spark, path, queries, "doc_id", "text", k = 5)
      assert(served.columns.toSeq == Seq("query_id", "corpus_id", "bm25", "rank"))
      assert(served.count() == 0)
      // and append onto the empty index still serves = flat over batch only
      Retrieval.bm25IndexAppend(spark, path, docs.select("doc_id", "text"),
        "doc_id", "text")
      val a = Retrieval.bm25IndexTopK(spark, path, queries, "doc_id", "text", k = 5)
        .orderBy("query_id", "rank").collect().map(_.toString).toSeq
      val flat = Retrieval.bm25TopK(docs, "doc_id", "text", queries, "doc_id", "text",
          k = 5)
        .orderBy("query_id", "rank").collect().map(_.toString).toSeq
      assert(a == flat, "append onto an empty index diverged from the flat scorer")
    }
  }

  /** Spark jobs started while `body` runs (listener-event drain bounded
    * by a short poll — job-start events post within milliseconds). */
  private def jobsDuring(body: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try { body; Thread.sleep(600) } finally spark.sparkContext.removeSparkListener(l)
    n.get()
  }

  test("bloom sizing runs no count job: plan-statistics estimate") {
    // the estimate itself is job-free
    val est = new Array[Long](1)
    val jEst = jobsDuring { est(0) = Dedup.estimateRows(docs) }
    assert(jEst == 0, s"estimateRows ran $jEst Spark job(s)")
    assert(est(0) >= 1L)
    // and the default-sized bloom path runs EXACTLY the jobs of the
    // explicitly-sized one — no third corpus scan hides in the default
    val jDefault = jobsDuring {
      Dedup.bloomExactGroups(docs, "doc_id", "text").collect()
    }
    val jExplicit = jobsDuring {
      Dedup.bloomExactGroups(docs, "doc_id", "text",
        expectedItems = Some(est(0))).collect()
    }
    assert(jDefault == jExplicit,
      s"default sizing ran extra jobs: $jDefault vs $jExplicit")
  }

  test("dedup_bloom analysis-only: schema probe runs no bloom-build jobs") {
    docs.schema // warm the parquet footer read
    // resolving a parquet table costs a footer-inference job of its own —
    // the gate is RELATIVE: the dedup_bloom probe may run exactly the
    // table-resolution jobs of a bare `from documents` compile, never the
    // bloom build's scan/treeReduce/collect jobs (each ≥ 1 more)
    val base = jobsDuring {
      graft.CompileApi.compileOnly(spark, "from documents", sfDir, None).schema
    }
    val text = "from dedup_bloom('documents', 'doc_id', 'text', 0.01)"
    val schema = new Array[org.apache.spark.sql.types.StructType](1)
    val j = jobsDuring {
      schema(0) = graft.CompileApi.compileOnly(spark, text, sfDir, None).schema
    }
    assert(j <= base, s"analysis-only dedup_bloom ran bloom jobs: $j vs base $base")
    assert(schema(0).fieldNames.toSeq == Seq("fingerprint", "keep_id", "dup_count"))
    val jA = jobsDuring {
      val t = "from dedup_bloom_against('documents', 'documents', 'doc_id', 'text')"
      schema(0) = graft.CompileApi.compileOnly(spark, t, sfDir, None).schema
    }
    assert(jA <= 2 * base,
      s"analysis-only dedup_bloom_against ran bloom jobs: $jA vs base $base")
    assert(schema(0).fieldNames.toSeq == Seq("doc_id", "is_dup", "dup_of"))
  }

  test("lazy exact dedup-against equals the bloom operator row-for-row") {
    import spark.implicits._
    val batch = docs.filter(F.col("doc_id") < 30).select("doc_id", "text")
      .union(Seq((900001L, "novel zzz"), (900002L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val lazyRows = Dedup.dedupAgainstExact(docs, batch, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val bloomRows = Dedup.bloomDedupAgainst(docs, batch, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(lazyRows == bloomRows)
  }

  test("minhash index append: row-identical to a full rebuild, files untouched") {
    val path = java.nio.file.Files.createTempDirectory("mh_appidx").toString + "/idx"
    val half = docs.filter(F.col("doc_id") % 4 =!= 0 && F.col("doc_id") % 4 =!= 3)
    // payload-bearing build (text rides along) over half the corpus
    Dedup.buildMinhashIndex(half, "doc_id", "text", 64, 2)
      .join(half.select("doc_id", "text"), Seq("doc_id"))
      .write.mode("overwrite").parquet(path)
    def listing(): Map[String, Long] = {
      new java.io.File(path).listFiles().toSeq.filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.length()).toMap
    }
    val before = listing()
    val quarter = docs.filter(F.col("doc_id") % 4 === 3).select("doc_id", "text")
    Dedup.minhashIndexAppend(spark, path, quarter, "doc_id", "text")
    val after = listing()
    before.foreach { case (f, len) =>
      assert(after.get(f).contains(len), s"pre-append index file changed: $f")
    }
    assert(after.size > before.size, "append added no files")
    // appended index rows ≡ a full rebuild over corpus ∪ batch (signatures
    // are deterministic per doc)
    val full = docs.filter(F.col("doc_id") % 4 =!= 0)
    val rebuilt = Dedup.buildMinhashIndex(full, "doc_id", "text", 64, 2)
      .join(full.select("doc_id", "text"), Seq("doc_id"))
      .select("doc_id", "sig", "text")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val appended = spark.read.parquet(path)
      .select("doc_id", "sig", "text")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(appended == rebuilt, "appended index diverged from the full rebuild")
    // named errors: signature-width mismatch and missing payload column
    val e1 = intercept[IllegalArgumentException] {
      Dedup.minhashIndexAppend(spark, path, quarter, "doc_id", "text", numHashes = 32)
    }
    assert(e1.getMessage.contains("components"))
    val e2 = intercept[IllegalArgumentException] {
      // a batch without the index's payload column must fail by name
      Dedup.minhashIndexAppend(spark, path,
        quarter.withColumnRenamed("text", "body"), "doc_id", "body")
    }
    assert(e2.getMessage.contains("payload column 'text'"))
  }

  test("pHash: scale/brightness invariance, noise distance, corrupt excluded") {
    val pngs = graft.catalog.QueryCatalog.phashPngs(spark)
    val hashes = Multimodal.phashImages(pngs, "img_id", "png").collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    // decode states: all real PNGs decode, the corrupt payload does not
    assert((1L to 6L).forall(hashes(_)._1) && !hashes(99L)._1)
    val h = (id: Long) => hashes(id)._2
    // the closed-form invariances the oracle row leans on
    assert(h(1) == h(2), "pixel-doubled rescale changed the hash")
    assert(h(1) == h(3), "affine brightness map changed the hash")
    assert(h(5) == 0L, "solid image has nonzero AC hash")
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // a noise pHash thresholds 63 coefficients against their lower median
    // → ~31 bits set; independent noise images sit ~31 bits apart
    assert(java.lang.Long.bitCount(h(1)) >= 20, s"noise hash too sparse: ${h(1)}")
    for ((a, b) <- Seq((1L, 4L), (1L, 6L), (4L, 6L), (1L, 5L), (4L, 5L)))
      assert(hamming(h(a), h(b)) > 10,
        s"independent images too close: ($a, $b) = ${hamming(h(a), h(b))}")
    // pairs at r=3: exactly the three invariance pairs, from BOTH candidate
    // paths (dense broadcast and banded chunk-pair), and at r=0 alike
    for (limit <- Seq(-1L, 0L); r <- Seq(0, 3)) {
      val pairs = Dedup.phashPairs(pngs, "img_id", "png",
          maxHamming = r, denseSigLimit = limit)
        .orderBy("id_a", "id_b").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSeq
      assert(pairs == Seq((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)),
        s"phashPairs(r=$r, denseSigLimit=$limit) = $pairs")
    }
  }

  test("int8 index append: row-identical to a full rebuild, files untouched") {
    val path = java.nio.file.Files.createTempDirectory("i8_appidx").toString + "/idx"
    val odd = embs.filter(F.col("vec_id") % 2 === 1)
    val even = embs.filter(F.col("vec_id") % 2 === 0).select("vec_id", "embedding")
    Similarity.buildInt8Index(odd, "vec_id", "embedding")
      .write.mode("overwrite").parquet(path)
    def listing(): Map[String, Long] =
      new java.io.File(path).listFiles().toSeq.filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.length()).toMap
    val before = listing()
    Similarity.int8IndexAppend(spark, path, even, "vec_id", "embedding")
    val after = listing()
    before.foreach { case (f, len) =>
      assert(after.get(f).contains(len), s"pre-append index file changed: $f")
    }
    assert(after.size > before.size)
    // per-row-deterministic quantization ⇒ appended ≡ rebuilt, bitwise
    val rebuilt = Similarity.buildInt8Index(embs, "vec_id", "embedding")
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val appended = spark.read.parquet(path)
      .select("vec_id", "scale", "q8")
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(appended == rebuilt, "appended int8 index diverged from the rebuild")
    // a non-index path fails by name
    val bogus = java.nio.file.Files.createTempDirectory("i8_bogus").toString + "/x"
    embs.select("vec_id", "embedding").write.parquet(bogus)
    val e = intercept[IllegalArgumentException] {
      Similarity.int8IndexAppend(spark, bogus, even, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("not an"))
  }

  test("bloom index: append is lossless and probes equal the one-shot operator") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("bloom_idx").toString + "/idx"
    val half = docs.filter(F.col("doc_id") % 4 =!= 0 && F.col("doc_id") % 4 =!= 3)
    val quarter = docs.filter(F.col("doc_id") % 4 === 3).select("doc_id", "text")
    val corpus = docs.filter(F.col("doc_id") % 4 =!= 0).select("doc_id", "text")
    // pin the shape explicitly so the fresh-build comparison is same-shape
    Dedup.writeBloomIndex(half, "doc_id", "text", path, expectedItems = Some(4096L))
    Dedup.bloomIndexAppend(spark, path, quarter, "doc_id", "text")
    // OR at one shape is lossless: the appended blob is BYTE-IDENTICAL to
    // a fresh build over corpus ∪ batch at the same shape
    val rebuilt = java.nio.file.Files.createTempDirectory("bloom_re").toString + "/idx"
    Dedup.writeBloomIndex(corpus, "doc_id", "text", rebuilt, expectedItems = Some(4096L))
    val a = spark.read.parquet(path).head()
    val b = spark.read.parquet(rebuilt).head()
    assert(java.util.Arrays.equals(a.getAs[Array[Byte]](0), b.getAs[Array[Byte]](0)),
      "appended bloom != fresh build at the same shape")
    assert(a.getLong(2) == b.getLong(2), "shape drifted across the append")
    // probing the persisted index equals the one-shot operator's rows
    val batch = docs.filter(F.col("doc_id") % 4 === 0).select("doc_id", "text")
      .union(Seq((900001L, "novel zzz"), (900002L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val viaIndex = Dedup.bloomDedupAgainstIndex(spark, path, corpus, batch,
      "doc_id", "text").orderBy("doc_id").collect().map(_.toString).toSeq
    val oneShot = Dedup.bloomDedupAgainst(corpus, batch, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(viaIndex == oneShot, "persisted-bloom probe diverged from the one-shot operator")
    // an EMPTY-corpus index probes everything-novel, and appending onto it
    // then re-probing finds the appended docs (null/empty blob branches)
    val emptyDf = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val empty = java.nio.file.Files.createTempDirectory("bloom_mt").toString + "/idx"
    Dedup.writeBloomIndex(emptyDf, "doc_id", "text", empty, expectedItems = Some(64L))
    val preProbe = Dedup.bloomDedupAgainstIndex(spark, empty, emptyDf, quarter,
      "doc_id", "text").collect()
    assert(preProbe.forall(!_.getBoolean(1)), "empty bloom index flagged a dup")
    Dedup.bloomIndexAppend(spark, empty, quarter, "doc_id", "text")
    val postProbe = Dedup.bloomDedupAgainstIndex(spark, empty, quarter, quarter,
      "doc_id", "text").collect()
    assert(postProbe.forall(_.getBoolean(1)),
      "append onto an empty bloom index lost the batch fingerprints")
  }

  test("pq index append: frozen-codebook codes, files untouched") {
    val path = java.nio.file.Files.createTempDirectory("pq_appidx").toString + "/idx"
    val odd = embs.filter(F.col("vec_id") % 2 === 1)
    val even = embs.filter(F.col("vec_id") % 2 === 0) // full frame: payload rides
    Similarity.writePqIndex(odd, "vec_id", "embedding", path)
    def listing(): Map[String, Long] =
      new java.io.File(path).listFiles().toSeq.filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.length()).toMap
    val before = listing()
    val cbBefore = spark.read.parquet(path + "_codebook")
      .orderBy("j").collect().map(_.toString).toSeq
    Similarity.pqIndexAppend(spark, path, even, "vec_id", "embedding")
    val after = listing()
    before.foreach { case (f, len) =>
      assert(after.get(f).contains(len), s"pre-append index file changed: $f")
    }
    assert(after.size > before.size)
    // the codebook is FROZEN: byte-identical after the append
    val cbAfter = spark.read.parquet(path + "_codebook")
      .orderBy("j").collect().map(_.toString).toSeq
    assert(cbAfter == cbBefore, "append mutated the codebook")
    // appended codes ≡ a fresh encode of corpus ∪ batch with the BASE
    // codebook (the FAISS add() contract — persisted centroids round-trip
    // parquet bit-exactly)
    val (_, cb) = Similarity.buildPqIndex(odd, "vec_id", "embedding")
    val expect = embs.filter(F.col("embedding").isNotNull).withColumn("codes",
        graft.functions.VectorExpressions.pqEncode(F.col("embedding"), cb, 16))
      .select(F.col("vec_id"), F.col("codes").cast("string"))
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val got = spark.read.parquet(path)
      .select(F.col("vec_id"), F.col("codes").cast("string"))
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(got == expect, "appended codes diverged from a frozen-codebook re-encode")
  }

  test("pHash against: batch variants link to corpus, novel/corrupt never") {
    val corpus = graft.catalog.QueryCatalog.phashPngs(spark)
      .filter(!F.col("img_id").isin(2L, 3L))
    val batch = graft.catalog.QueryCatalog.phashBatchPngs(spark)
    val links = Dedup.phashAgainst(corpus, batch, "img_id", "png", maxHamming = 3)
      .orderBy("batch_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(links == Seq((101L, 1L, 0), (102L, 1L, 0)),
      s"unexpected links: $links")
    // r=0 equality blocking gives the same links (they are hamming 0)
    val links0 = Dedup.phashAgainst(corpus, batch, "img_id", "png", maxHamming = 0)
      .orderBy("batch_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(links0 == links)
    // a corpus variant NOT dropped would multiply links — the full fixture
    // (imgs 1/2/3 hash-identical) must link each batch variant three ways
    val all = Dedup.phashAgainst(
        graft.catalog.QueryCatalog.phashPngs(spark), batch, "img_id", "png", 3)
      .collect()
    assert(all.length == 6, s"expected 2 variants x 3 identical corpus images: ${all.length}")
  }

  test("pHash hashes are identical across independent plan executions") {
    val pngs = graft.catalog.QueryCatalog.phashPngs(spark)
    val once = Multimodal.phashImages(pngs, "img_id", "png")
      .orderBy("img_id").collect().map(_.toString).toSeq
    val again = Multimodal.phashImages(pngs, "img_id", "png")
      .orderBy("img_id").collect().map(_.toString).toSeq
    assert(once == again)
  }

  test("minhash LSH finds a planted near-duplicate") {
    import spark.implicits._
    val base = docs.limit(20).select("doc_id", "text")
    // plant a near-dup of doc 0: append two words
    val planted = base.filter($"doc_id" === 0)
      .select(F.lit(9999L).as("doc_id"), F.concat($"text", F.lit(" extra word")).as("text"))
    val pairs = Dedup.minhashLshPairs(base.union(planted), "doc_id", "text", threshold = 0.7)
      .collect()
    assert(pairs.exists(r => r.getLong(0) == 0L && r.getLong(1) == 9999L),
      s"expected (0, 9999) pair, got ${pairs.mkString(", ")}")
  }

  test("incremental dedup: batch near-dup of an indexed corpus doc is dropped, novel doc kept") {
    import spark.implicits._
    val corpus = docs.limit(20).select("doc_id", "text")
    val index = Dedup.buildMinhashIndex(corpus, "doc_id", "text")
    // batch: an exact copy of corpus doc 3 (est_jaccard = 1), plus a doc
    // whose text shares nothing with the corpus
    val dup = corpus.filter($"doc_id" === 3)
      .select(F.lit(7001L).as("doc_id"), $"text")
    val novel = Seq((7002L, "zyx wvu tsr qpo nml kji hgf edc ba zz yy xx ww vv uu"))
      .toDF("doc_id", "text")
    val batch = dup.union(novel)
    val pairs = Dedup.minhashIndexPairs(batch, "doc_id", "text", index, threshold = 0.5)
      .collect()
    assert(pairs.exists(r => r.getLong(0) == 7001L && r.getLong(1) == 3L &&
      r.getDouble(2) == 1.0), s"expected (7001, 3, 1.0), got ${pairs.mkString(", ")}")
    assert(!pairs.exists(_.getLong(0) == 7002L),
      s"novel doc flagged: ${pairs.mkString(", ")}")
    val kept = Dedup.dedupAgainstMinhashIndex(batch, "doc_id", "text", index)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(7002L), s"expected only 7002 kept, got $kept")
  }

  test("incremental dedup: index signatures equal the in-corpus signature path") {
    // the index build must persist EXACTLY the signatures minhashSignatures
    // computes — a drifted index silently misses every candidate (band
    // hashes are over the components)
    val corpus = docs.limit(15).select("doc_id", "text")
    val idx = Dedup.buildMinhashIndex(corpus, "doc_id", "text", numHashes = 64, shingleSize = 2)
    val direct = Dedup.minhashSignatures(corpus, "doc_id", "text", 64, 2)
    val recombined = direct.select(
      F.col("doc_id"),
      F.array((0 until 64).map(j => F.col(s"__m$j")): _*).as("sig"))
    assert(idx.except(recombined).isEmpty && recombined.except(idx).isEmpty)
  }

  test("column-variant kernels equal the table-scale variants (one hash family)") {
    import org.apache.spark.sql.{functions => F}
    val sample = docs.limit(40)
    // simhash: the Column API must produce the SAME signatures as
    // simhashTable (a mixed-API hamming comparison is meaningless otherwise)
    val viaCol = sample.select(F.col("doc_id"),
      Dedup.simhash(F.col("text")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaTable = Dedup.simhashTable(sample, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    viaTable.foreach { case (id, s) =>
      assert(viaCol(id) == s, s"doc $id: column simhash ${viaCol(id)} != table $s")
    }
    // minhash: Column signature equals the table-scale signature columns
    val k = 8
    val colSig = sample.select(F.col("doc_id"),
      Dedup.minhashSignature(F.col("text"), numHashes = k, shingleSize = 2).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val tblSig = Dedup.minhashSignatures(sample, "doc_id", "text", numHashes = k, shingleSize = 2)
      .collect().map(r => r.getLong(0) -> (0 until k).map(i => r.getLong(i + 1))).toMap
    tblSig.foreach { case (id, sig) =>
      assert(colSig(id) == sig, s"doc $id: column minhash ${colSig(id)} != table $sig")
    }
  }

  test("simhash: hamming 0 for identical docs, pairs found") {
    import spark.implicits._
    val base = docs.limit(10).select("doc_id", "text")
    val dup = base.filter($"doc_id" === 1)
      .select(F.lit(8888L).as("doc_id"), $"text")
    val pairs = Dedup.simhashPairs(base.union(dup), "doc_id", "text", maxHamming = 3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 8888L && r.getInt(2) == 0))
  }

  test("simhash: maxHamming = 0 finds exact-fingerprint duplicates") {
    import spark.implicits._
    val base = docs.limit(10).select("doc_id", "text")
    val dup = base.filter($"doc_id" === 1)
      .select(F.lit(8887L).as("doc_id"), $"text")
    val pairs = Dedup.simhashPairs(base.union(dup), "doc_id", "text", maxHamming = 0).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 8887L && r.getInt(2) == 0))
  }

  test("decontamination: planted eval n-gram flags exactly the leaky doc") {
    import spark.implicits._
    val eval = Seq("the quick brown fox jumps over the lazy dog").toDF("text")
    val corpus = Seq(
      (1L, "intro text then the quick brown fox appears verbatim here"), // shares 4-gram
      (2L, "completely unrelated content about spark shuffles and joins"),
      (3L, "quick brown fox jumps straight out of the benchmark")        // shares 4-gram
    ).toDF("doc_id", "text")
    val flagged = Decontamination
      .contaminatedDocs(corpus, "doc_id", "text", eval, "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet == Set(1L, 3L), s"flagged: $flagged")
    assert(flagged(1L) == 1L) // "the quick brown fox"
    assert(flagged(3L) == 1L) // "quick brown fox jumps"
    val clean = Decontamination
      .decontaminate(corpus, "doc_id", "text", eval, "text", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L))
    // the eval side is broadcast: the corpus is never shuffled
    val plan = Decontamination
      .contaminatedDocs(corpus, "doc_id", "text", eval, "text", n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"eval side must broadcast:\n$plan")
  }

  test("contamination report: per-eval leak counts, clean eval doc keeps a zero row") {
    import spark.implicits._
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // leaked below
      (200L, "zzqk pwvx jjqr mmzt unique garble nothing shares this")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "intro text then the quick brown fox appears verbatim here"),
      (2L, "completely unrelated content about spark shuffles and joins"),
      (3L, "quick brown fox jumps straight out of the benchmark")
    ).toDF("doc_id", "text")
    val report = Decontamination
      .contaminationReport(corpus, "doc_id", "text", eval, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // eval 100 leaks into corpus docs 1 and 3 via two distinct 4-grams
    assert(report(100L) == (2L, 2L), s"got $report")
    // the clean eval doc keeps its row with zeros — the healthy signal
    assert(report(200L) == (0L, 0L), s"got $report")
    assert(report.size == 2)
  }

  test("C4 rules: line cleaning, page filter, sentence count on planted docs") {
    import spark.implicits._
    val page =
      """This sentence survives because it is long enough and ends well.
        |short line.
        |This line has plenty of words but no terminal punctuation
        |Enable javascript and cookies to continue browsing this page.
        |Please review our cookie policy before you continue reading here.
        |Another perfectly fine sentence stays in the cleaned output too!""".stripMargin
    val df = Seq(
      (1L, page),
      (2L, "Lorem ipsum dolor sit amet, consectetur adipiscing elit sed."),
      (3L, "function f() { return 1; } This page. Mixes code. And prose."),
      (4L, "One good sentence here. And a second one follows. Then a third arrives.")
    ).toDF("doc_id", "text")
    val out = df.select(
      F.col("doc_id"),
      TextFunctions.c4CleanLines(F.col("text")).as("cleaned"),
      TextFunctions.c4PageKeep(F.col("text")).as("keep"),
      TextFunctions.sentenceCount(F.col("text")).as("sentences"),
      TextFunctions.terminalPunctLineFraction(F.col("text")).as("tp_frac")
    ).collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: short line (< 5 words), unterminated line, javascript line and
    // cookie-policy line all drop; the two real sentences survive
    val cleaned = out(1L).getString(1).split("\n")
    assert(cleaned.toList == List(
      "This sentence survives because it is long enough and ends well.",
      "Another perfectly fine sentence stays in the cleaned output too!"))
    assert(out(1L).getDouble(4) == 5.0 / 6.0) // 5 of 6 lines end terminally
    // page filter: lorem ipsum and curly-brace pages drop, 3-sentence page keeps
    assert(!out(2L).getBoolean(2))
    assert(!out(3L).getBoolean(2))
    assert(out(4L).getBoolean(2) && out(4L).getInt(3) == 3)
  }

  test("pii redaction and html stripping are total and deterministic") {
    import spark.implicits._
    val rows = Seq(
      "mail bob.smith+x@corp.example.org now",
      "call +44 20 7946 0958 or 555-123-4567",
      "server at 192.168.1.254 is up",
      "<div class='x'>Hi <b>there</b></div><style>p{}</style> &amp; bye",
      ""
    ).toDF("t").select(
      graft.functions.TextFunctions.redactPii($"t").as("r"),
      graft.functions.TextFunctions.stripHtml($"t").as("h"))
      .collect()
    assert(rows(0).getString(0) == "mail <EMAIL> now")
    assert(rows(1).getString(0) == "call <PHONE> or <PHONE>")
    assert(rows(2).getString(0) == "server at <IP> is up")
    assert(rows(3).getString(1) == "Hi there bye")
    assert(rows(4).getString(0) == "" && rows(4).getString(1) == "")
  }

  test("chunking: overlapping word windows cover every word, empty doc = 1 chunk") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 words
      (2L, "only three words"),
      (3L, "")
    ).toDF("doc_id", "text")
    val chunks = Chunking.chunkDocuments(docs, "doc_id", "text",
      chunkWords = 40, overlapWords = 10).collect()
    val byDoc = chunks.groupBy(_.getLong(0))
    // 100 words, stride 30: ceil((100-10)/30) = 3 chunks
    assert(byDoc(1L).length == 3)
    // overlap: chunk 1 starts at word 31 — words 31..40 shared with chunk 0
    val c0 = byDoc(1L).find(_.getInt(1) == 0).get.getString(2).split(" ")
    val c1 = byDoc(1L).find(_.getInt(1) == 1).get.getString(2).split(" ")
    assert(c0.takeRight(10).toList == c1.take(10).toList)
    // full coverage: union of all chunk words = all 100 words
    assert(byDoc(1L).flatMap(_.getString(2).split(" ")).toSet.size == 100)
    assert(byDoc(2L).length == 1 && byDoc(2L).head.getInt(3) == 3)
    assert(byDoc(3L).length == 1)
  }

  test("sequence packing: contiguous per-shard offsets, coordinates within budget") {
    val out = Packing.packSequences(docs, "doc_id", "text", budget = 128, shards = 4)
      .collect()
    assert(out.length == docs.count())
    out.foreach { r =>
      val (shard, n, off) = (r.getInt(1), r.getLong(2), r.getLong(3))
      val (first, last, pOff) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(shard >= 0 && shard < 4)
      assert(pOff == off % 128 && first == off / 128 && first <= last)
      assert(last == (off + math.max(n, 1) - 1) / 128)
    }
    // offsets are contiguous within each shard: sorted offsets of a shard
    // are exactly the running sum of token counts
    out.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(3))
      sorted.foldLeft(0L) { (expect, r) =>
        assert(r.getLong(3) == expect, s"offset gap in shard ${r.getInt(1)}")
        expect + r.getLong(2)
      }
    }
    // deterministic
    val again = Packing.packSequences(docs, "doc_id", "text", budget = 128, shards = 4)
      .collect().map(_.toSeq).toSet
    assert(again == out.map(_.toSeq).toSet)
  }

  test("sequence packing: shard counts beyond 16 (multi-hex-digit radix)") {
    // 256 shards needs two md5 hex digits; the radix assignment must use
    // the full range and offsets must still be per-shard prefix sums
    val out = Packing.packSequences(docs, "doc_id", "text", budget = 64, shards = 256)
      .collect()
    assert(out.length == docs.count())
    assert(out.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 256))
    // a single hex digit can only produce 16 distinct buckets — with the
    // radix read, small corpora must exceed that
    assert(out.map(_.getInt(1)).distinct.length > 16)
    out.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(3))
      sorted.foldLeft(0L) { (expect, r) =>
        assert(r.getLong(3) == expect, s"offset gap in shard ${r.getInt(1)}")
        expect + r.getLong(2)
      }
    }
    // a 2-digit prefix assignment must agree with an independent Scala-side
    // recompute of the same radix arithmetic over the same md5 key
    val md = java.security.MessageDigest.getInstance("MD5")
    out.foreach { r =>
      val hex = md.digest(("graft-pack" + r.getLong(0)).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val expect = Integer.parseInt(hex.substring(0, 2), 16) % 256
      assert(r.getInt(1) == expect, s"shard mismatch for id ${r.getLong(0)}")
    }
  }

  test("token budget selection: equals the naive global cumsum, budget honored, total keeps all") {
    import org.apache.spark.sql.expressions.Window
    val budget = 20000L
    val sel = Sampling.selectTokenBudget(docs, "doc_id", "text", budget)
    val cums = sel.select("doc_id", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cums.nonEmpty && cums.values.max <= budget)
    // the distributed 256-bucket prefix-sum must equal the naive global
    // window cumsum (single-partition — fine at test scale, the exact
    // plan the operator exists to avoid)
    val k = F.md5(F.concat(F.lit("graft"), F.col("doc_id").cast("string")))
    val nTok = F.size(F.filter(
      F.split(F.lower(F.col("text")), "[^a-z0-9]+"), t => F.length(t) > 0)).cast("long")
    val naive = docs.withColumn("__k", k).withColumn("__n", nTok)
      .withColumn("cum", F.sum(F.col("__n")).over(
        Window.orderBy(F.col("__k"), F.col("doc_id"))))
      .filter(F.col("cum") <= budget)
      .select("doc_id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cums == naive, s"distributed prefix-sum diverges: ${cums.size} vs ${naive.size} docs")
    // a budget at/above the corpus total keeps every doc
    val total = docs.select(F.sum(nTok)).head.getLong(0)
    assert(Sampling.selectTokenBudget(docs, "doc_id", "text", total).count() == docs.count())
    assert(Sampling.selectTokenBudget(docs, "doc_id", "text", 0L).count() == 0L)
  }

  test("unigram NLL: closed-form tiny corpus, garble scores above common text, empty doc null") {
    import spark.implicits._
    // p(a)=3/5, p(b)=p(c)=1/5 → doc1 "a a b": ln5 − (2·ln3)/3 = 0.8770,
    // doc2 "a c": ln5 − ln3/2 = 1.0601 (both +5e-9, 4dp)
    val tiny = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val rows = CorpusStats.unigramNll(tiny, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 3L, 0.877), (2L, 2L, 1.0601)), rows.mkString(", "))
    // rare-token garble must score above a doc of corpus-common tokens
    val base = docs.limit(30).select("doc_id", "text")
    val garble = Seq((777777L, "zqxjv kwqzx vvqjx pzzqk")).toDF("doc_id", "text")
    val common = Seq((777778L, "the the the and and of")).toDF("doc_id", "text")
    val scored = CorpusStats.unigramNll(base.union(garble).union(common), "doc_id", "text")
    val g = scored.filter(F.col("doc_id") === 777777L).head.getDouble(2)
    val c = scored.filter(F.col("doc_id") === 777778L).head.getDouble(2)
    assert(g > c, s"garble $g must out-score common-token text $c")
    // token-free docs keep their row with n_tokens 0 and null score
    val withEmpty = CorpusStats.unigramNll(
      base.union(Seq((777779L, "!!! ...")).toDF("doc_id", "text")), "doc_id", "text")
      .filter(F.col("doc_id") === 777779L).collect()
    assert(withEmpty.length == 1 && withEmpty.head.getLong(1) == 0L &&
      withEmpty.head.isNullAt(2))
  }

  test("bigram NLL: closed-form hits/backoff/pruning, word salad out-scores natural order") {
    import spark.implicits._
    val tiny = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    // minCount=1, self-fit ⇒ every bigram is a hit:
    //   doc1 = [ln5−ln3, ln3−ln1, ln3−ln1] → (ln5+ln3)/3 = 0.9027
    //   doc2 = [ln5−ln3, ln3−ln1]          → ln5/2        = 0.8047
    val allHits = CorpusStats.bigramNll(tiny, "doc_id", "text", minCount = 1L)
      .orderBy("doc_id").collect()
    assert(allHits.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 3L, 0.9027), (2L, 2L, 0.8047)), allHits.mkString(", "))
    // default minCount=2 prunes every (hapax) bigram ⇒ all positions back
    // off to alpha·unigram: doc1 → 1.4879, doc2 → 1.5183
    val allBackoff = CorpusStats.bigramNll(tiny, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(allBackoff.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 3L, 1.4879), (2L, 2L, 1.5183)), allBackoff.mkString(", "))
    // mixed: "a b a b" keeps (a,b) (count 2) but (b,a)/(a,c) prune →
    // doc1 = [ln2, ln3−ln2, backoff, ln3−ln2] → 0.7784; doc2 → 1.7006
    val mixed = CorpusStats.bigramNll(
      Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(mixed.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 4L, 0.7784), (2L, 2L, 1.7006)), mixed.mkString(", "))
    // the property the unigram filter CANNOT express: same token multiset,
    // natural repetition (bigrams count >= 2 → hits) vs word salad (all
    // bigrams distinct → pruned → backoff). Bigram NLL separates them.
    val natural = (888881L, Seq.fill(3)("zqa zqb zqc zqd").mkString(" "))
    val salad = (888882L, "zqa zqb zqc zqd zqb zqa zqc zqb zqd zqc zqa zqd")
    val base = docs.limit(30).select("doc_id", "text")
    val scored = CorpusStats.bigramNll(
      base.union(Seq(natural, salad).toDF("doc_id", "text")), "doc_id", "text")
    def nllOf(id: Long, frame: org.apache.spark.sql.DataFrame = scored): Double =
      frame.filter(F.col("doc_id") === id).head.getDouble(2)
    assert(nllOf(888882L) > nllOf(888881L),
      s"word salad ${nllOf(888882L)} must out-score natural order ${nllOf(888881L)}")
    // alpha is live exactly on the backoff branch: the all-hit doc is
    // bitwise alpha-insensitive, the salad doc scores lower at alpha=1
    val alpha1 = CorpusStats.bigramNll(
      base.union(Seq(natural, salad).toDF("doc_id", "text")), "doc_id", "text", alpha = 1.0)
    assert(nllOf(888881L, alpha1) == nllOf(888881L))
    assert(nllOf(888882L, alpha1) < nllOf(888882L))
    // token-free docs keep their row with n_tokens 0 and null score
    val withEmpty = CorpusStats.bigramNll(
      base.union(Seq((888883L, "!!! ...")).toDF("doc_id", "text")), "doc_id", "text")
      .filter(F.col("doc_id") === 888883L).collect()
    assert(withEmpty.length == 1 && withEmpty.head.getLong(1) == 0L &&
      withEmpty.head.isNullAt(2))
  }

  test("Kneser-Ney bigram NLL: closed forms, discount live, salad separation") {
    import spark.implicits._
    val tiny = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    // model: uni a:3 b:1 c:1, N=5; types (a,a)(a,b)(a,c) all count 1 →
    // ctx(a)=3, N1+(a·)=3, N1+(·w)=1 each, N1+(··)=3.
    // minCount=2 prunes all hits → every non-first position is pure
    // continuation mass: p = (0.75·3/3)·(1/3) = 0.25 → NLL = ln4;
    // first token: ln5−ln3.
    //   doc1 = (ln5−ln3 + 2·ln4)/3 = 1.0945   doc2 = (ln5−ln3+ln4)/2 = 0.9486
    val pruned = CorpusStats.bigramNllKn(tiny, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(pruned.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 3L, 1.0945), (2L, 2L, 0.9486)), pruned.mkString(", "))
    // minCount=1 keeps the hits: p = (1−0.75)/3 + 0.25·(1/3) = 1/3 → ln3
    //   doc1 = (ln5−ln3 + 2·ln3)/3 = 0.9027   doc2 = (ln5−ln3+ln3)/2 = 0.8047
    val hits = CorpusStats.bigramNllKn(tiny, "doc_id", "text", minCount = 1L)
      .orderBy("doc_id").collect()
    assert(hits.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 3L, 0.9027), (2L, 2L, 0.8047)), hits.mkString(", "))
    // the discount is live: smaller D shifts mass to the hit term — the
    // all-hit doc scores LOWER (hits cost less), closed-form at D=0.5:
    // p = (1−0.5)/3 + (0.5·3/3)·(1/3) = 1/3 → same here by construction;
    // use an asymmetric corpus where the shift is visible
    val rep = Seq((1L, "x y x y x y"), (2L, "x z")).toDF("doc_id", "text")
    val d75 = CorpusStats.bigramNllKn(rep, "doc_id", "text", minCount = 1L)
    val d25 = CorpusStats.bigramNllKn(rep, "doc_id", "text", discount = 0.25, minCount = 1L)
    def nll(fr: org.apache.spark.sql.DataFrame, id: Long): Double =
      fr.filter(F.col("doc_id") === id).head.getDouble(2)
    assert(nll(d25, 1L) < nll(d75, 1L),
      "smaller discount must score the repetition doc lower (hit-dominated)")
    // same token multiset, natural repetition vs word salad: KN separates
    // them exactly like SB (salad's distinct bigrams get pruned to
    // continuation mass; natural's repeated bigrams stay discounted hits)
    val natural = (888881L, Seq.fill(3)("zqa zqb zqc zqd").mkString(" "))
    val salad = (888882L, "zqa zqb zqc zqd zqb zqa zqc zqb zqd zqc zqa zqd")
    val base = docs.limit(30).select("doc_id", "text")
    val scored = CorpusStats.bigramNllKn(
      base.union(Seq(natural, salad).toDF("doc_id", "text")), "doc_id", "text")
    assert(nll(scored, 888882L) > nll(scored, 888881L),
      s"word salad must out-score natural order under KN")
    // token-free docs keep their row
    val withEmpty = CorpusStats.bigramNllKn(
      base.union(Seq((888883L, "!!! ...")).toDF("doc_id", "text")), "doc_id", "text")
      .filter(F.col("doc_id") === 888883L).collect()
    assert(withEmpty.length == 1 && withEmpty.head.getLong(1) == 0L &&
      withEmpty.head.isNullAt(2))
  }

  test("quality classifier: separates boilerplate from reference text, deterministic") {
    import spark.implicits._
    // labeled sets: reference-style prose vs boilerplate soup (disjoint
    // token sets → hashed features separate cleanly in 5 GD rounds)
    val pos = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "a study of language models requires diverse natural text sources"),
      (3L, "scientists observed the comet through powerful telescopes last night"),
      (4L, "history books describe the long journey across the mountain passes")
    ).toDF("doc_id", "text")
    val neg = Seq(
      (11L, "click here subscribe now buy cheap deals free shipping click here"),
      (12L, "cookie policy accept terms privacy settings login register login"),
      (13L, "copyright all rights reserved contact us sitemap faq home home"),
      (14L, "sale sale discount offer expires soon act now limited stock sale")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (101L, "the fox jumps over the river near the mountain passes"),
      (102L, "subscribe now free deals click here buy now"),
      (103L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val scored = QualityClassifier.qualityClassifierScore(
      corpus, "doc_id", "text", pos, neg)
      .orderBy("doc_id").collect()
    val proseP = scored(0).getDouble(1)
    val spamP = scored(1).getDouble(1)
    assert(proseP > 0.5 && spamP < 0.5 && proseP > spamP,
      s"separation failed: prose=$proseP spam=$spamP")
    assert(scored(2).isNullAt(1), "null text must score null")
    // the labeled docs themselves separate (train-set sanity)
    val self = QualityClassifier.qualityClassifierScore(
      pos.union(neg), "doc_id", "text", pos, neg).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).map(self).min > Seq(11L, 12L, 13L, 14L).map(self).max,
      s"train-set separation failed: $self")
    // bitwise determinism across two independent train+score plans
    val again = QualityClassifier.qualityClassifierScore(
      corpus, "doc_id", "text", pos, neg).orderBy("doc_id").collect()
    assert(scored.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("quality classifier: caps fire pre-collect with named errors") {
    import spark.implicits._
    // the Scala-side reference bucket arithmetic stays ≡ the Column side
    // (bucketOf is the documented spec of bucketCol + the oracle strpos math)
    val toks = Seq("the", "fox", "Zebra", "a1b2", "ünïcode", "x")
    val viaCol = toks.toDF("t")
      .select(QualityClassifier.bucketCol(F.col("t")).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(viaCol == toks.map(QualityClassifier.bucketOf),
      "bucketCol diverged from bucketOf")
    // row cap: 6 labeled docs against a cap of 4 — the named error must
    // fire from the pre-collect aggregate (the plan carries limit(cap+1),
    // so even a huge relation would never reach the driver)
    val pos = (1L to 3L).map(i => (i, s"alpha beta doc $i")).toDF("doc_id", "text")
    val neg = (11L to 13L).map(i => (i, s"spam spam doc $i")).toDF("doc_id", "text")
    val rowErr = intercept[IllegalArgumentException] {
      QualityClassifier.train(pos, neg, "doc_id", "text", maxLabeled = 4)
    }
    assert(rowErr.getMessage.contains("driver-collect cap"), rowErr.getMessage)
    // byte cap: tiny byte budget trips on the feature payload
    val byteErr = intercept[IllegalArgumentException] {
      QualityClassifier.train(pos, neg, "doc_id", "text", maxLabeledBytes = 8L)
    }
    assert(byteErr.getMessage.contains("byte cap"), byteErr.getMessage)
    // at the caps' defaults the same sets train fine (guards are bounds,
    // not behavior changes)
    val (w, _) = QualityClassifier.train(pos, neg, "doc_id", "text")
    assert(w.exists(_ != 0.0))
  }

  test("prototypicality: seeds score exactly 1.0, assignment matches the ivf contract") {
    val embs = table("embeddings")
    val scored = Similarity.prototypicalityScore(embs, "vec_id", "embedding", nlist = 32)
    assert(scored.count() == embs.filter(F.col("embedding").isNotNull).count())
    // every score is a rounded-6 cosine in [-1, 1]
    assert(scored.filter(F.col("proto_cos") > 1.0 || F.col("proto_cos") < -1.0).count() == 0)
    // the 32 seed vectors ARE their clusters' prototypes: cos(v, v) = 1
    val seedIds = embs.filter(F.col("embedding").isNotNull)
      .withColumn("__m", F.md5(F.col("vec_id").cast("string").cast("binary")))
      .orderBy("__m", "vec_id").limit(32).select("vec_id")
    val seedScores = scored.join(seedIds, Seq("vec_id"), "left_semi")
      .select("proto_cos").collect().map(_.getDouble(0))
    assert(seedScores.length == 32 && seedScores.forall(_ == 1.0),
      s"seed self-cosines must be exactly 1.0: ${seedScores.take(5).mkString(",")}")
    // exactly one row per vector, cluster ids within [0, 32)
    assert(scored.filter(F.col("cluster") < 0 || F.col("cluster") >= 32).count() == 0)
  }

  test("DSIR: self-target weights are exactly zero; target-likeness separates; nulls kept") {
    import spark.implicits._
    val base = docs.select("doc_id", "text")
    // target == corpus → both models identical → every token's log-ratio
    // is EXACTLY 0.0 → every weight 0.0 (closed form, no tolerance)
    val self = Sampling.dsirWeight(base, "doc_id", "text", base, "text")
    assert(self.filter(F.col("n_tokens") > 0 && F.col("dsir_weight") =!= 0.0).count() == 0,
      "self-target DSIR weights must be exactly 0.0")
    // separation: a doc made of target-only vocabulary must outweigh a doc
    // of boilerplate vocabulary absent from the target
    val target = Seq(
      (1L, "galaxy spectrum quasar redshift telescope photon nebula"),
      (2L, "quasar photon galaxy telescope spectrum nebula redshift")
    ).toDF("doc_id", "text")
    val corpus = base.union(Seq(
      (990001L, "galaxy quasar photon spectrum telescope"),
      (990002L, "click subscribe buy cheap deals now unsubscribe"),
      (990003L, "!!! ...")
    ).toDF("doc_id", "text"))
    val w = Sampling.dsirWeight(corpus, "doc_id", "text", target, "text")
    def of(id: Long) = w.filter(F.col("doc_id") === id).head
    assert(of(990001L).getDouble(2) > of(990002L).getDouble(2),
      s"target-like ${of(990001L)} must outweigh boilerplate ${of(990002L)}")
    // token-free doc keeps its row: n_tokens 0, null weight
    assert(of(990003L).getLong(1) == 0L && of(990003L).isNullAt(2))
    // bitwise determinism across two plans
    val again = Sampling.dsirWeight(corpus, "doc_id", "text", target, "text")
    assert(w.exceptAll(again).count() == 0 && again.exceptAll(w).count() == 0)
  }

  test("DSIR 'bigram' features see token ORDER the unigram bag cannot") {
    import spark.implicits._
    // same token multiset, different order: unigram weights identical,
    // bigram weights differ (the in-order doc shares the target's pairs)
    val target = Seq((1L, "alpha beta gamma delta alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (11L, "alpha beta gamma delta"),
      (12L, "delta gamma beta alpha")
    ).toDF("doc_id", "text")
    def wOf(feats: String, id: Long): Double =
      Sampling.dsirWeight(corpus, "doc_id", "text", target, "text", feats)
        .filter(F.col("doc_id") === id).head.getDouble(2)
    assert(wOf("unigram", 11L) == wOf("unigram", 12L),
      "unigram bag must be order-blind")
    assert(wOf("bigram", 11L) > wOf("bigram", 12L),
      "bigram bag must favor the doc sharing the target's pair order")
    // n_tokens still counts unigram positions in bigram mode
    val nb = Sampling.dsirWeight(corpus, "doc_id", "text", target, "text", "bigram")
      .filter(F.col("doc_id") === 11L).head.getLong(1)
    assert(nb == 4L, s"n_tokens must stay the token count, got $nb")
  }

  test("DSIR Gumbel-top-k: size bound, seed is live, weight dominates noise, deterministic") {
    val base = docs.select("doc_id", "text")
    val target = docs.filter(F.col("doc_id") < 20).select("doc_id", "text")
    val eligible = Sampling.dsirWeight(base, "doc_id", "text", target, "text")
      .filter(F.col("dsir_weight").isNotNull).count()
    // k >= eligible → everything with a weight comes back; k small → k rows
    assert(Sampling.dsirSample(base, "doc_id", "text", target, "text",
      k = eligible.toInt + 50).count() == eligible)
    val s10 = Sampling.dsirSample(base, "doc_id", "text", target, "text", k = 10)
    assert(s10.count() == 10)
    // determinism across two independent plans
    val again = Sampling.dsirSample(base, "doc_id", "text", target, "text", k = 10)
    assert(s10.exceptAll(again).count() == 0 && again.exceptAll(s10).count() == 0)
    // the seed is live: a different seed reshuffles the Gumbel noise
    val other = Sampling.dsirSample(base, "doc_id", "text", target, "text",
      k = 10, seed = "other")
    assert(other.exceptAll(s10).count() > 0, "seed change must perturb the sample")
    // weights dominate the noise when they actually spread: docs built
    // from target-exclusive vocabulary carry weights tens of nats above
    // the corpus (Gumbel noise is O(1), bounded by the 16-bit u grid at
    // ~11), so ALL of them must make a k=20 cut over ~500 docs
    import spark.implicits._
    val sciText = Seq.fill(30)("galaxy quasar redshift photon").mkString(" ")
    val target2 = Seq((1L, sciText), (2L, sciText)).toDF("doc_id", "text")
    val planted = (1 to 5).map(i => (990000L + i, sciText))
    val corpus2 = base.union(planted.toDF("doc_id", "text"))
    val s20 = Sampling.dsirSample(corpus2, "doc_id", "text", target2, "text", k = 20)
    assert(s20.filter(F.col("doc_id") >= 990000L).count() == 5,
      "all five high-weight planted docs must be sampled")
  }

  test("top_ngrams: closed-form trigrams, n=1 equals build_vocab, short docs dropped") {
    import spark.implicits._
    val tiny = Seq("a b c a b c", "a b", "x").toDF("text")
    // trigrams: doc1 → (a b c)(b c a)(c a b)(a b c) → 'a b c':2, others 1;
    // docs 2-3 are shorter than n and contribute nothing
    val tri = CorpusStats.topNgrams(tiny, "text", n = 3, k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(tri.toSeq == Seq(("a b c", 2L, 1), ("b c a", 1L, 2), ("c a b", 1L, 3)),
      tri.mkString(", "))
    // n = 1 is exactly build_vocab (same counts, same rank rule)
    val uni = CorpusStats.topNgrams(docs, "text", n = 1, k = 25)
      .withColumnRenamed("ngram", "token")
    val vocab = CorpusStats.buildVocab(docs, "text", size = 25)
    assert(uni.exceptAll(vocab).count() == 0 && vocab.exceptAll(uni).count() == 0)
  }

  test("vocab profile: closed-form tiny corpus, coverage bounds on testdata") {
    import spark.implicits._
    // "a a b" + "a c": total 5, distinct 3, hapax 2 (b, c); top-1 = a → 3/5
    val tiny = Seq("a a b", "a c").toDF("text")
    val r = CorpusStats.vocabProfile(tiny, "text", topK = 1).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((5L, 3L, 2L, 0.6)), r.toString)
    // topK >= vocab covers everything
    val all = CorpusStats.vocabProfile(tiny, "text", topK = 10).collect().head
    assert(all.getDouble(3) == 1.0)
    // testdata: coverage in (0,1], counts consistent
    val t = CorpusStats.vocabProfile(docs, "text").collect().head
    assert(t.getLong(0) >= t.getLong(1) && t.getLong(1) >= t.getLong(2))
    assert(t.getDouble(3) > 0.0 && t.getDouble(3) <= 1.0)
  }

  test("corpus token stats: hapax and df features are consistent") {
    val out = CorpusStats.tokenDocFrequencyFeatures(docs, "doc_id", "text").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, hapax, sumDf) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hapax <= n && sumDf >= n) // every token's df >= 1
      assert(math.abs(r.getDouble(4) - hapax.toDouble / n) < 1e-12)
    }
  }

  test("stratified sampling: exactly k per class, deterministic") {
    val s1 = Sampling.stratifiedTopK(docs, "lang", "doc_id", k = 5)
    val counts = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ <= 5))
    val s2 = Sampling.stratifiedTopK(docs, "lang", "doc_id", k = 5)
    assert(s1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      s2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // a different seed selects a different sample
    val s3 = Sampling.stratifiedTopK(docs, "lang", "doc_id", k = 5, seed = "other")
    assert(s1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq !=
      s3.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("train/test split: stateless, complete, roughly proportional") {
    val split = Sampling.trainTestSplit(docs, "doc_id", 0.8)
    val n = docs.count()
    val byKind = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind.values.sum == n, "split must partition the input")
    val trainFrac = byKind.getOrElse("train", 0L).toDouble / n
    assert(trainFrac > 0.6 && trainFrac < 0.95, s"train fraction $trainFrac far from 0.8")
    // membership is a pure function of (seed, id): re-running flips nothing
    val again = Sampling.trainTestSplit(docs, "doc_id", 0.8)
    assert(split.select("doc_id", "split").except(
      again.select("doc_id", "split")).count() == 0)
  }

  test("semantic decontamination: flag + drop partition the corpus; threshold honored") {
    val embs = table("embeddings")
    val eval = embs.filter(F.col("vec_id") % 4 === 0)
    val corpus = embs.filter(F.col("vec_id") % 4 =!= 0)
    val flagged = Decontamination.contaminatedVecs(
      corpus, "vec_id", "embedding", eval, "embedding", threshold = 0.35)
    val kept = Decontamination.decontaminateSemantic(
      corpus, "vec_id", "embedding", eval, "embedding", threshold = 0.35)
    // flag and drop are complementary over the corpus
    assert(flagged.count() + kept.count() == corpus.count())
    assert(kept.join(flagged, Seq("vec_id")).count() == 0)
    // every flagged row really clears the (rounded) threshold, and the
    // testdata actually exercises the net
    assert(flagged.filter(F.col("max_cos_sim") < 0.35).count() == 0)
    assert(flagged.count() > 0, "no semantic contamination in testdata — vacuous gate")
    // match counts are bounded by the eval size (sanity on the agg)
    val evalN = eval.count()
    assert(flagged.filter(F.col("contaminated_matches") > evalN).count() == 0)
  }

  test("semantic contamination report: transpose of the flag, zeros kept, pruned == brute") {
    val embs = table("embeddings")
    val eval = embs.filter(F.col("vec_id") % 4 === 0)
    val corpus = embs.filter(F.col("vec_id") % 4 =!= 0)
    def brute(thr: Double) =
      corpus.select(F.col("embedding").as("__cv"))
        .crossJoin(F.broadcast(
          eval.select(F.col("vec_id").as("eid"), F.col("embedding").as("__ev"))))
        .withColumn("__cos", F.round(
          graft.functions.VectorExpressions.cosineSimilarity(F.col("__cv"), F.col("__ev")), 6))
        .filter(F.col("__cos") >= thr)
        .groupBy("eid")
        .agg(F.count(F.lit(1)).as("leaking_docs"), F.max("__cos").as("max_cos_sim"))
    // pruned path (selective thresholds) and brute path (loose) both equal
    // the reference per-eval aggregation — the shared candidatePairs helper
    // is exact in BOTH directions
    Seq(0.95, 0.8, 0.35).foreach { thr =>
      val rep = Decontamination.contaminationReportSemantic(
        corpus, "embedding", eval, "vec_id", "embedding", threshold = thr)
      val ref = eval.select(F.col("vec_id"))
        .join(brute(thr).withColumnRenamed("eid", "vec_id"), Seq("vec_id"), "left")
        .withColumn("leaking_docs", F.coalesce(F.col("leaking_docs"), F.lit(0L)))
      assert(rep.except(ref).count() == 0 && ref.except(rep).count() == 0,
        s"report != brute transpose at threshold $thr")
      // one row per eval id, zeros included
      assert(rep.count() == eval.count())
    }
    // the audit and the flag direction agree on TOTAL leak mass: sum of
    // per-eval leaking_docs == sum of per-corpus contaminated_matches
    val repTotal = Decontamination.contaminationReportSemantic(
        corpus, "embedding", eval, "vec_id", "embedding", threshold = 0.35)
      .agg(F.sum("leaking_docs")).head.getLong(0)
    val flagTotal = Decontamination.contaminatedVecs(
        corpus, "vec_id", "embedding", eval, "embedding", threshold = 0.35)
      .agg(F.sum("contaminated_matches")).head.getLong(0)
    assert(repTotal == flagTotal, s"audit total $repTotal != flag total $flagTotal")
    assert(repTotal > 0, "no contamination in testdata — vacuous gate")
  }

  test("semantic decontamination pruning is EXACT: pruned pass == brute pass, dup weights counted") {
    val embs = table("embeddings")
    // duplicate-heavy eval (each vector 3x — repeated benchmark items):
    // compaction must count every copy while scoring each distinct once
    val evalBase = embs.filter(F.col("vec_id") % 4 === 0)
    val eval3 = evalBase.union(evalBase).union(evalBase)
    val corpus = embs.filter(F.col("vec_id") % 4 =!= 0)
    def brute(thr: Double, ev: org.apache.spark.sql.DataFrame) =
      corpus.select(F.col("vec_id"), F.col("embedding").as("__cv"))
        .crossJoin(F.broadcast(ev.select(F.col("embedding").as("__ev"))))
        .withColumn("__cos", F.round(
          graft.functions.VectorExpressions.cosineSimilarity(F.col("__cv"), F.col("__ev")), 6))
        .filter(F.col("__cos") >= thr)
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).as("contaminated_matches"), F.max("__cos").as("max_cos_sim"))
    // several thresholds: selective (prunes hard), the oracle's 0.35, and
    // a negative one (bounds admit everything → degrades to brute)
    Seq(0.95, 0.8, 0.35, -0.5).foreach { thr =>
      val pruned = Decontamination.contaminatedVecs(
        corpus, "vec_id", "embedding", eval3, "embedding", threshold = thr)
      val ref = brute(thr, eval3)
      assert(pruned.except(ref).count() == 0 && ref.except(pruned).count() == 0,
        s"pruned != brute at threshold $thr")
    }
    // tiny nlist and nlist >= |eval| are both exact too (bucket geometry
    // only affects speed)
    Seq(1, 4, 10000).foreach { nl =>
      val pruned = Decontamination.contaminatedVecs(
        corpus, "vec_id", "embedding", evalBase, "embedding", threshold = 0.35, nlist = nl)
      val ref = brute(0.35, evalBase)
      assert(pruned.except(ref).count() == 0 && ref.except(pruned).count() == 0,
        s"pruned != brute at nlist $nl")
    }
    // and the bound actually BITES on a clustered eval at a selective
    // threshold: a corpus row far from every eval cluster must explode
    // fewer (bucket-pass) pairs than brute would score. Measured
    // structurally: the pass-filter keeps no bucket for a far-away vector.
    val dim = embs.select(F.size(F.col("embedding"))).head.getInt(0)
    import spark.implicits._
    val far = Seq((999999L, Array.fill(dim)(0.0f).updated(0, 1.0f).toSeq))
      .toDF("vec_id", "embedding")
    val hits = Decontamination.contaminatedVecs(
      far, "vec_id", "embedding", evalBase, "embedding", threshold = 0.999)
    assert(hits.count() == 0)
    // zero-norm vectors keep the brute pass's Spark NaN semantics (NaN
    // pair-cosines compare HIGH, so a zero vector on either side matches):
    // the pruned pass must route them identically — zero-norm eval seeds a
    // radius-2 bucket every corpus row reaches; zero-norm corpus rows pass
    // every bucket via the nanValue=2.0 pin
    val zDim = embs.select(F.size(F.col("embedding"))).head.getInt(0)
    val zero = Seq((888888L, Array.fill(zDim)(0.0f).toSeq, 0))
      .toDF("vec_id", "embedding", "label")
    val corpusZ = corpus.limit(20).select("vec_id", "embedding", "label").union(zero)
    val evalZ = evalBase.limit(10).select("vec_id", "embedding", "label").union(zero)
    val prunedZ = Decontamination.contaminatedVecs(
      corpusZ, "vec_id", "embedding", evalZ, "embedding", threshold = 0.9)
    val refZ = corpusZ.select(F.col("vec_id"), F.col("embedding").as("__cv"))
      .crossJoin(F.broadcast(evalZ.select(F.col("embedding").as("__ev"))))
      .withColumn("__cos", F.round(
        graft.functions.VectorExpressions.cosineSimilarity(F.col("__cv"), F.col("__ev")), 6))
      .filter(F.col("__cos") >= 0.9)
      .groupBy("vec_id")
      .agg(F.count(F.lit(1)).as("contaminated_matches"), F.max("__cos").as("max_cos_sim"))
    assert(prunedZ.except(refZ).count() == 0 && refZ.except(prunedZ).count() == 0,
      "zero-norm routing diverges from the brute pass")
    // the zero corpus row must appear (its NaN cosines compare high)
    assert(prunedZ.filter(F.col("vec_id") === 888888L).count() == 1)
  }

  test("split by cluster: near-dup pairs never straddle splits; singletons match the doc split") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.12)
    val split = Sampling.splitByCluster(docs, "doc_id", pairs, 0.8)
    // partitions the input, keeps every column plus `split`
    assert(split.count() == docs.count())
    assert(split.columns.toSet == docs.columns.toSet + "split")
    // the leakage guard itself: every verified near-dup pair lands whole
    val assign = split.select(F.col("doc_id"), F.col("split"))
    val leaked = pairs
      .join(assign.select(F.col("doc_id").as("id_a"), F.col("split").as("sa")), Seq("id_a"))
      .join(assign.select(F.col("doc_id").as("id_b"), F.col("split").as("sb")), Seq("id_b"))
      .filter(F.col("sa") =!= F.col("sb"))
      .count()
    assert(leaked == 0, s"$leaked near-dup pairs straddle the split")
    // the guard is non-vacuous: the corpus has clusters whose members'
    // OWN doc-level hashes would disagree (i.e. plain trainTestSplit leaks)
    val naive = Sampling.trainTestSplit(docs, "doc_id", 0.8)
      .select(F.col("doc_id"), F.col("split"))
    val naiveLeaked = pairs
      .join(naive.select(F.col("doc_id").as("id_a"), F.col("split").as("sa")), Seq("id_a"))
      .join(naive.select(F.col("doc_id").as("id_b"), F.col("split").as("sb")), Seq("id_b"))
      .filter(F.col("sa") =!= F.col("sb"))
      .count()
    assert(naiveLeaked > 0, "corpus has no cross-split near-dups — the gate proves nothing here")
    // docs in no pair keep exactly their trainTestSplit assignment (the
    // representative is their own id), so growing a corpus with unique
    // docs never moves existing ones
    val pairedIds = pairs.select(F.col("id_a").as("doc_id"))
      .union(pairs.select(F.col("id_b").as("doc_id"))).distinct()
    val singles = assign.join(pairedIds, Seq("doc_id"), "left_anti")
    assert(singles.join(naive, Seq("doc_id", "split")).count() == singles.count())
    // deterministic: re-running flips nothing
    val again = Sampling.splitByCluster(docs, "doc_id", pairs, 0.8)
      .select(F.col("doc_id"), F.col("split"))
    assert(assign.except(again).count() == 0)
  }

  test("split stats surface percolation: one giant cluster, realized fraction far from target") {
    import spark.implicits._
    // a percolating corpus: every doc shares a heavy boilerplate prefix, so
    // bigram Jaccard at the default 0.12 links EVERYTHING into one
    // component — the failure mode the stats exist to surface (a single
    // md5 draw then moves the whole corpus into one split)
    val boiler = "terms of service all rights reserved privacy policy cookie notice contact us"
    val perc = (0L until 50L).map(i => (i, s"$boiler item $i")).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(perc, "doc_id", "text", n = 2, threshold = 0.12)
    val stats = Sampling.splitByClusterStats(perc, "doc_id", pairs, 0.8).collect().head
    assert(stats.getAs[Long]("n_docs") == 50L)
    assert(stats.getAs[Long]("max_cluster_size") == 50L,
      s"expected full percolation, got max_cluster_size=${stats.getAs[Long]("max_cluster_size")}")
    assert(stats.getAs[Long]("n_clusters") == 1L)
    val frac = stats.getAs[Double]("train_frac")
    assert(frac == 0.0 || frac == 1.0, s"one cluster must land whole in one split, got $frac")
    assert(math.abs(stats.getAs[Double]("frac_delta")) >= 0.19,
      s"percolation must show up as a large frac_delta, got ${stats.getAs[Double]("frac_delta")}")
    // and on a healthy corpus the same stats sit near the target: clusters
    // are small and the realized fraction tracks 0.8
    val healthy = Sampling.splitByClusterStats(docs, "doc_id",
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.12), 0.8)
      .collect().head
    assert(healthy.getAs[Long]("max_cluster_size") < healthy.getAs[Long]("n_docs") / 4,
      s"testdata corpus unexpectedly percolates: $healthy")
    assert(math.abs(healthy.getAs[Double]("frac_delta")) < 0.15, s"got $healthy")
  }

  test("splitByCluster logs percolation diagnostics without opting into _stats") {
    import spark.implicits._
    // the split ITSELF must surface the footgun: one diagnostic line per
    // invocation, computed from the label table alone, flipping to a
    // WARNING on a percolating near-dup graph
    val boiler = "terms of service all rights reserved privacy policy cookie notice contact us"
    val perc = (0L until 50L).map(i => (i, s"$boiler item $i")).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(perc, "doc_id", "text", n = 2, threshold = 0.12)
    Sampling.lastSplitDiagnostics = None
    Sampling.splitByCluster(perc, "doc_id", pairs, 0.8).count()
    val line = Sampling.lastSplitDiagnostics.getOrElse(fail("no diagnostics logged"))
    assert(line.contains("WARNING") && line.contains("percolating"), line)
    assert(line.contains("max_cluster_size=50") && line.contains("n_clusters=1"), line)
    // clustered_train_frac is 0 or 1 (one cluster, one draw) — far from 0.8
    assert(line.contains("clustered_train_frac=0.0000") ||
      line.contains("clustered_train_frac=1.0000"), line)
    // a healthy corpus logs the same line WITHOUT the warning
    val healthyPairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.12)
    Sampling.lastSplitDiagnostics = None
    Sampling.splitByCluster(docs, "doc_id", healthyPairs, 0.8).count()
    val hline = Sampling.lastSplitDiagnostics.getOrElse(fail("no diagnostics logged"))
    assert(!hline.contains("WARNING"), hline)
    assert(hline.contains("n_clusters="), hline)
  }

  test("weighted mix: copies match the hex rule, unlisted domains dropped") {
    val weights = Map("en" -> 1.5, "de" -> 0.75, "fr" -> 0.25)
    val mixed = Sampling.weightedMix(docs, "lang", "doc_id", weights)
    val perDoc = mixed.groupBy("doc_id", "lang")
      .agg(F.count(F.lit(1)).as("n"), F.max("copy").as("maxc")).collect()
    // copy indexes are 1..n per doc
    assert(perDoc.forall(r => r.getLong(2) == r.getInt(3).toLong))
    // per-row copy count equals an independent Scala-side recompute of the
    // md5 hex-threshold rule
    val md = java.security.MessageDigest.getInstance("MD5")
    def copiesOf(id: Long, w: Double): Int = {
      val hex = md.digest(s"graft-mix$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      val thr = f"${math.round((w - math.floor(w)) * 65536).toInt}%04x"
      math.floor(w).toInt + (if (hex < thr) 1 else 0)
    }
    perDoc.foreach { r =>
      val expect = copiesOf(r.getLong(0), weights(r.getString(1)))
      assert(r.getLong(2) == expect, s"doc ${r.getLong(0)}: ${r.getLong(2)} != $expect")
    }
    // unlisted domains (es, zh) and zero-copy rows are absent
    assert(mixed.filter(F.col("lang").isin("es", "zh")).count() == 0)
    // expectation: per-domain rate tracks its weight
    val n = docs.filter(F.col("lang") === "en").count()
    val m = mixed.filter(F.col("lang") === "en").count()
    assert(math.abs(m.toDouble / n - 1.5) < 0.2, s"en rate ${m.toDouble / n} far from 1.5")
  }

  test("quality-ordered budget: equals the naive global quality cumsum") {
    import org.apache.spark.sql.expressions.{Window => W}
    val scored = docs.select(F.col("doc_id"), F.col("text"),
      F.length(F.col("text")).as("q"))
    val budget = 15000L
    val got = Sampling.selectTokenBudgetBy(scored, "doc_id", "text", budget, "q")
      .select("doc_id", "cum_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nTok = F.when(F.col("text").isNull, F.lit(0L))
      .otherwise(F.size(graft.functions.TextFunctions.tokens(F.col("text"))).cast("long"))
    val naive = scored
      .withColumn("cum", F.sum(nTok).over(
        W.orderBy(F.col("q").desc_nulls_last, F.col("doc_id").asc)))
      .filter(F.col("cum") <= budget)
      .select("doc_id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naive, s"ranged decomposition diverges: ${got.size} vs ${naive.size} docs")
    // the cut keeps a PREFIX of the (q desc, id) order, so no dropped doc
    // may outscore a kept one
    val kept = Sampling.selectTokenBudgetBy(scored, "doc_id", "text", budget, "q")
      .select("doc_id")
    val dropped = scored.join(kept, Seq("doc_id"), "left_anti")
    assert(dropped.count() > 0, "budget cut nothing — the gate is vacuous")
    val keptMin = scored.join(kept, "doc_id").agg(F.min("q")).head.getInt(0)
    val droppedMax = dropped.agg(F.max("q")).head.getInt(0)
    assert(droppedMax <= keptMin,
      s"dropped doc outscores kept: $droppedMax > $keptMin")
  }

  test("temperature mix: composition flattens toward alpha, deterministic") {
    val before = docs.filter(F.col("lang").isNotNull)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nBefore = before.values.sum.toDouble
    val mixed = Sampling.mixByTemperature(docs, "lang", "doc_id", alpha = 0.5)
    val after = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nAfter = after.values.sum.toDouble
    // every observed domain survives, and the mix moves each domain's
    // share toward the alpha=0.5 target: rare domains UP, dominant DOWN
    assert(after.keySet == before.keySet)
    val (rare, common) = (before.minBy(_._2)._1, before.maxBy(_._2)._1)
    assert(after(rare) / nAfter > before(rare) / nBefore,
      s"rare domain $rare share did not rise")
    assert(after(common) / nAfter < before(common) / nBefore,
      s"dominant domain $common share did not fall")
    // realized share tracks the closed-form target q = p^a / sum p^a
    val z = before.toSeq.sortBy(_._1)
      .map { case (_, c) => math.pow(c / nBefore, 0.5) }.sum
    before.foreach { case (d, c) =>
      val q = math.pow(c / nBefore, 0.5) / z
      assert(math.abs(after(d) / nAfter - q) < 0.05,
        s"$d realized ${after(d) / nAfter} vs target $q")
    }
    // deterministic across plans
    val again = Sampling.mixByTemperature(docs, "lang", "doc_id", alpha = 0.5)
    assert(mixed.exceptAll(again).count() == 0 && again.exceptAll(mixed).count() == 0)
    // alpha ~ 1 is ~identity in size (weights collapse to ~1.0)
    val id = Sampling.mixByTemperature(docs, "lang", "doc_id", alpha = 1.0)
    assert(math.abs(id.count() - nBefore) / nBefore < 0.01)
  }

  test("deterministic shuffle: stable order, differs from input order") {
    val ids1 = Sampling.deterministicShuffle(docs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val ids2 = Sampling.deterministicShuffle(docs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids1 == ids2)
    assert(ids1 != ids1.sorted, "hash order should not be id order")
    assert(ids1.sorted == docs.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("repetition rules: duplicate lines and degenerate tokens score high") {
    import spark.implicits._
    val rows = Seq(
      ("clean", "the quick brown fox\njumps over the lazy dog"),
      ("dupline", "same line here\nsame line here\nsame line here\nunique tail"),
      ("degen", "buy buy buy buy buy now"),
      ("empty", "")
    ).toDF("id", "text")
    val out = rows.select(
      F.col("id"),
      TextFunctions.duplicateLineFraction(F.col("text")).as("dlf"),
      TextFunctions.duplicateLineCharFraction(F.col("text")).as("dcf"),
      TextFunctions.topTokenFraction(F.col("text")).as("ttf")
    ).collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("clean")._1 == 0.0 && out("clean")._3 < 0.3)
    assert(out("dupline")._1 == 0.5) // 2 of 4 lines are re-occurrences
    assert(out("dupline")._2 > 0.4) // duplicated chars dominate
    assert(out("degen")._3 > 0.8) // 5 of 6 tokens are `buy`
    assert(out("empty") == ((0.0, 0.0, 0.0)))
  }

  test("connected components: chains collapse into one cluster") {
    import spark.implicits._
    // a-b, b-c, c-d is one component even though a-d was never a pair;
    // e-f is separate; g is an isolated pair-less node (absent from output)
    val pairs = Seq(("b", "a"), ("b", "c"), ("c", "d"), ("e", "f"))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "e" -> "e", "f" -> "e"))
  }

  test("connected components: long path converges within iteration budget") {
    import spark.implicits._
    val pairs = (0 until 12).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    // driverEdgeLimit = 0 forces the ITERATIVE path — the driver union-find
    // would otherwise absorb every small fixture and leave the distributed
    // loop untested
    val cc = Dedup.connectedComponents(pairs, driverEdgeLimit = 0L)
    assert(cc.agg(F.count_distinct(F.col("cluster"))).head.getLong(0) == 1L)
    assert(cc.count() == 13)
  }

  test("connected components: driver union-find equals the iterative path") {
    import spark.implicits._
    // random-ish multi-component graph: chains, a clique, bridge edges
    val edges = ((0 until 10).map(i => (i.toLong, i + 1L)) ++ // chain 0..10
      Seq((20L, 21L), (21L, 22L), (20L, 22L)) ++ // triangle
      Seq((30L, 31L), (5L, 31L)) ++ // bridge into the chain
      Seq((40L, 41L))).toDF("id_a", "id_b")
    val viaDriver = Dedup.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaLoop = Dedup.connectedComponents(edges, driverEdgeLimit = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaDriver == viaLoop)
    // the bridge merges 30/31 into the chain's component (min id 0)
    assert(viaDriver.contains((30L, 0L)) && viaDriver.contains((31L, 0L)))
  }

  test("dropDuplicateClusters keeps one representative per cluster") {
    import spark.implicits._
    val df = Seq(("a", "x"), ("b", "x"), ("c", "x"), ("d", "y")).toDF("id", "text")
    val pairs = Seq(("a", "b"), ("b", "c")).toDF("id_a", "id_b")
    val kept = Dedup.dropDuplicateClusters(df, "id", pairs)
      .select("id").collect().map(_.getString(0)).sorted.toSeq
    assert(kept == Seq("a", "d"))
  }

  test("semantic dedup: planted exact-duplicate embedding is caught and dropped") {
    import spark.implicits._
    val base = embs.limit(50).select("vec_id", "embedding")
    val planted = base.filter($"vec_id" === 0)
      .select(F.lit(9999L).as("vec_id"), $"embedding")
    val in = base.union(planted)
    // identical vectors land in the same argmax-cos bucket → pair at cos 1.0
    val pairs = Dedup.semDedupPairs(in, "vec_id", "embedding", nlist = 8, threshold = 0.99)
    val hit = pairs.filter($"id_a" === 0 && $"id_b" === 9999).collect()
    assert(hit.length == 1 && hit(0).getAs[Double]("cos_sim") >= 0.999999)
    // end-to-end drop keeps the min id of the group
    val kept = Dedup.semDedup(in, "vec_id", "embedding", nlist = 8, threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.contains(0L) && !kept.contains(9999L))
    // equi-join on bucket only — never a cartesian pair join
    val plan = Dedup.semDedupPairs(embs, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "semantic dedup must not cross join")
  }

  test("span dedup: planted repeated span is masked, rest untouched") {
    import spark.implicits._
    val span = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val in = Seq(
      (1L, s"unique one two three $span tail words here"),
      (2L, s"$span other body entirely different follows now"),
      (3L, "short doc"), // < spanLen tokens: passes through whole
      (4L, "no overlap with anything else in this corpus at all")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(in, "doc_id", "text", spanLen = 8, minDocs = 2)
      .orderBy("doc_id").collect()
    // docs 1 and 2 share the 8-token span: exactly those 8 tokens go
    assert(out(0).getAs[String]("clean_text") == "unique one two three tail words here")
    assert(out(0).getAs[Long]("dup_tokens") == 8L)
    assert(out(1).getAs[String]("clean_text") == "other body entirely different follows now")
    // short + non-overlapping docs: untouched, frac 0
    assert(out(2).getAs[String]("clean_text") == "short doc")
    assert(out(3).getAs[Long]("dup_tokens") == 0L)
    assert(out(3).getAs[Double]("dup_token_frac") == 0.0)
    // overlapping coverage merges: doc repeating the span shifted by one
    // token masks 9 tokens (union of the two 8-windows), not 16
    val shifted = Seq(
      (1L, s"x $span y"), (2L, s"$span unrelated trailing tokens here")
    ).toDF("doc_id", "text")
    val o2 = Dedup.spanDedup(shifted, "doc_id", "text", spanLen = 8, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(o2(0).getAs[String]("clean_text") == "x y")
    // plan shape: no cartesian product anywhere
    val plan = Dedup.spanDedup(docs, "doc_id", "text").queryExecution
      .executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "span dedup must not cross join")
  }

  test("ngram jaccard: identical doc has jaccard 1.0") {
    import spark.implicits._
    val base = docs.limit(10).select("doc_id", "text")
    val dup = base.filter($"doc_id" === 2)
      .select(F.lit(7777L).as("doc_id"), $"text")
    val pairs = Dedup.ngramJaccardPairs(base.union(dup), "doc_id", "text", n = 2, threshold = 0.9)
      .collect()
    assert(pairs.exists(r => r.getLong(0) == 2L && r.getLong(1) == 7777L && r.getDouble(2) == 1.0))
  }

  test("embedding cosine: self-duplicate found at threshold ~1") {
    import spark.implicits._
    val base = embs.limit(50).select("vec_id", "embedding")
    val dup = base.filter($"vec_id" === 3)
      .select(F.lit(6666L).as("vec_id"), $"embedding")
    val pairs = Dedup.embeddingCosinePairs(
      base.union(dup), "vec_id", "embedding", threshold = 0.999, bruteForce = true).collect()
    assert(pairs.exists(r => r.getLong(0) == 3L && r.getLong(1) == 6666L))
  }

  test("brute-force topk: rank 1 is the most similar, k respected") {
    val queries = embs.filter(F.col("vec_id") < 3).select("vec_id", "embedding")
    val res = Similarity.bruteForceTopK(
      embs, "vec_id", "embedding", queries, "vec_id", "embedding", k = 5)
    val rows = res.collect()
    assert(rows.length == 15) // 3 queries × 5
    val byQuery = rows.groupBy(_.getLong(0))
    byQuery.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getDouble(2)).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("int8 topk: high recall vs float top-5 (boundary swaps only)") {
    val queries = embs.filter(F.col("vec_id") < 3).select("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(
      embs, "vec_id", "embedding", queries, "vec_id", "embedding", k = 5)
    val int8 = Similarity.int8BruteForceTopK(
      embs, "vec_id", "embedding", queries, "vec_id", "embedding", k = 5)
    val rows = int8.collect()
    assert(rows.length == 15)
    // rank-ordered, descending quantized cosine per query
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getDouble(2)).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
    // ±0.5-step rounding may swap a boundary pair, nothing more (measured
    // recall@5 0.98 on vec_id<10 at sf0.001 and sf0.01; the catalog's
    // q_similarity_int8_property gates the 0.9 floor)
    val bSet = brute.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val qSet = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((qSet & bSet).size >= 13, s"int8∩float=${(qSet & bSet).size} of 15")
  }

  test("similarity_topk table function: brute and int8 methods run from wv") {
    val viaWv = wv(
      "from similarity_topk('embeddings', 'vec_id', 'embedding', 3, 'int8')")
      .collect()
    assert(viaWv.nonEmpty)
    assert(viaWv.map(_.getLong(0)).distinct.length > 1) // many query rows
    val brute = wv(
      "from similarity_topk('embeddings', 'vec_id', 'embedding', 3)")
      .collect()
    assert(brute.length == viaWv.length)
    val lshInt8 = wv(
      "from similarity_topk('embeddings', 'vec_id', 'embedding', 3, 'lsh_int8')")
    assert(lshInt8.columns.contains("cos_q8"))
    assert(lshInt8.limit(1).collect().nonEmpty)
  }

  test("similarity_topk: explicit (planes, tables) thread through to the lsh paths") {
    // build a partitioned posting index with NON-default parameters from
    // the language, then query it passing the SAME parameters — mismatched
    // probes would silently miss buckets, so the language must carry them
    val base = java.nio.file.Files.createTempDirectory("lsh_part_lang").toString
    wv(s"""
      from ann_int8_index('embeddings', 'vec_id', 'embedding')
      save to '$base/idx.parquet'
    """).collect()
    wv(s"""
      from ann_lsh_postings('$base/idx.parquet', 'vec_id', 'q8', 8, 6)
      save to '$base/post.parquet' partition by bucket
    """).collect()
    val viaLang = wv(
      s"from similarity_topk('$base/post.parquet', 'vec_id', 'q8', 5, 'lsh_int8_part', 8, 6)")
    val apiQueries = spark.read.parquet(s"$base/idx.parquet")
    val viaApi = Similarity.lshTopKPartitionedIndex(
      s"$base/post.parquet", "vec_id", "q8", apiQueries, "vec_id", "q8",
      k = 5, planes = 8, tables = 6)
    assert(viaLang.collect().toSet == viaApi.collect().toSet)
    // (planes, tables) on a non-lsh method is a user error, not silence
    intercept[Exception] {
      wv("from similarity_topk('embeddings', 'vec_id', 'embedding', 3, 'brute', 8, 6)")
    }
  }

  test("minhash_index + dedup_incremental run from wv and match the API") {
    // offline index build CTAS'd from the language, then incremental dedup
    // of a "batch" against the persisted file — language and API must agree
    val base = java.nio.file.Files.createTempDirectory("mh_idx_lang").toString
    wv(s"""
      from minhash_index('documents', 'doc_id', 'text')
      save to '$base/idx.parquet'
    """).collect()
    val viaLang = wv(
      s"from dedup_incremental_pairs('documents', '$base/idx.parquet', 'doc_id', 'text', 0.9, 64, 16, 2)")
    val idx = spark.read.parquet(s"$base/idx.parquet")
    val viaApi = Dedup.minhashIndexPairs(docs, "doc_id", "text", idx, threshold = 0.9)
    assert(viaLang.collect().toSet == viaApi.collect().toSet)
    // every doc is in the index here, so at est >= 0.9 each batch doc links
    // to itself (est = 1.0) and the drop form returns zero rows
    val dropped = wv(
      s"from dedup_incremental('documents', '$base/idx.parquet', 'doc_id', 'text', 0.9, 64, 16, 2)")
    assert(dropped.count() == 0)
    assert(viaLang.count() >= docs.count()) // self-links at minimum
  }

  test("LSH + int8 composition: quantized scoring over bucketed candidates") {
    val queries = embs.filter(F.col("vec_id") < 3).select("vec_id", "embedding")
    val mixed = Similarity.lshTopK(
      embs, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, planes = 8, tables = 6, int8Scoring = true)
    val rows = mixed.collect()
    assert(rows.nonEmpty)
    assert(mixed.columns.toSeq == Seq("query_id", "corpus_id", "cos_q8", "rank"))
    // recall vs the float LSH path: candidates are identical (same buckets),
    // only the scoring metric differs — top-5 overlap must stay high
    val float = Similarity.lshTopK(
      embs, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, planes = 8, tables = 6).collect()
    val fSet = float.map(r => (r.getLong(0), r.getLong(1))).toSet
    val qSet = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((qSet & fSet).size >= fSet.size - 2,
      s"int8∩float=${(qSet & fSet).size} of ${fSet.size}")
  }

  test("LSH topk returns subset consistent with brute force at rank 1") {
    val queries = embs.filter(F.col("vec_id") < 2).select("vec_id", "embedding")
    val approx = Similarity.lshTopK(
      embs, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 3, planes = 6, tables = 8).collect()
    // recall sanity, not exactness: every query returns ≥1 candidate
    assert(approx.map(_.getLong(0)).distinct.length == 2)
  }

  test("IVF topk: recall vs brute force at rank 1 with generous nprobe") {
    val queries = embs.filter(F.col("vec_id") < 3).select("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(
      embs, "vec_id", "embedding", queries, "vec_id", "embedding", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Similarity.ivfTopK(
      embs, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 1, nlist = 8, nprobe = 8) // nprobe = nlist → exhaustive → exact
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivf == exact)
    // narrow probe still returns k results per query
    val narrow = Similarity.ivfTopK(
      embs, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 2).collect()
    assert(narrow.map(_.getLong(0)).distinct.length == 3)
  }

  test("embedding-cosine dedup: LSH candidate path recall vs brute force") {
    // plant near-duplicates: a slightly perturbed copy of each of 60 vectors
    // (id + 100000) — cosine to the original stays near 1, mutual cosines of
    // unrelated vectors stay low, so ground truth ≈ the planted pairs
    val base = embs.filter(F.col("vec_id") < 60).select("vec_id", "embedding")
    val perturbed = base.select(
      (F.col("vec_id") + 100000L).as("vec_id"),
      F.transform(F.col("embedding"),
        (x, i) => (x + (i % 3 - 1).cast("float") * F.lit(0.02f)).cast("float"))
        .as("embedding"))
    val corpus = base.union(perturbed)
    val thr = 0.95
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairSet(Dedup.embeddingCosinePairs(
      corpus, "vec_id", "embedding", threshold = thr, bruteForce = true))
    assume(truth.nonEmpty, "no near-dup pairs at this threshold")
    val lsh = pairSet(Dedup.embeddingCosinePairs(
      corpus, "vec_id", "embedding", threshold = thr, bruteForce = false))
    val recall = (lsh & truth).size.toDouble / truth.size
    info(f"cosine-pair LSH recall at >=$thr: $recall%.3f (${truth.size} true pairs)")
    assert((lsh -- truth).isEmpty, "LSH path must verify pairs exactly (no false positives)")
    assert(recall >= 0.8, f"candidate recall too low: $recall%.3f")
  }

  test("ANN recall@10: narrow-probe IVF and LSH against brute-force truth") {
    val k = 10
    val queries = embs.filter(F.col("vec_id") < 20).select("vec_id", "embedding")
    def topSets(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val truth = topSets(Similarity.bruteForceTopK(
      embs, "vec_id", "embedding", queries, "vec_id", "embedding", k = k).collect())
    def recallOf(approx: Map[Long, Set[Long]]): Double = {
      val per = truth.map { case (q, t) =>
        approx.get(q).map(a => (a & t).size.toDouble / t.size).getOrElse(0.0)
      }
      per.sum / per.size
    }
    val ivfRecall = recallOf(topSets(Similarity.ivfTopK(
      embs, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = k, nlist = 8, nprobe = 3).collect()))
    val lshRecall = recallOf(topSets(Similarity.lshTopK(
      embs, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = k, planes = 6, tables = 8).collect()))
    info(f"recall@$k: ivf(nprobe=3/8) = $ivfRecall%.3f, lsh(6 planes x 8 tables) = $lshRecall%.3f")
    // quality floors: an index that misses most of the true neighbors is
    // misconfigured, not merely approximate
    assert(ivfRecall >= 0.5, f"IVF recall@$k too low: $ivfRecall%.3f")
    assert(lshRecall >= 0.4, f"LSH recall@$k too low: $lshRecall%.3f")
  }

  test("multimodal: media struct + stub decode + frame sampling") {
    val media = docs.limit(5).select(
      F.col("doc_id"),
      F.col("text").cast("binary").as("payload"))
      .withColumn("meta", Multimodal.asMediaColumn(F.col("payload"), "text/plain"))
      .withColumn("features", Multimodal.decodeImageStub(F.col("payload")))
    val rows = media.collect()
    assert(rows.forall(_.getAs[org.apache.spark.sql.Row]("meta").getAs[Long]("n_bytes") > 0))
    assert(rows.forall(_.getSeq[Double](3).length == 8))
    val frames = Multimodal.sampleFrames(media.select("doc_id", "payload"), "payload")
    assert(frames.count() >= 5)
    assert(frames.columns.contains("frame_idx"))
  }

  test("multimodal: REAL image decode and resize via the JDK codecs (png + jpeg)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def encode(fmt: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val schema = StructType(Seq(
      StructField("img_id", LongType), StructField("png", BinaryType)))
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(Seq(
      Row(1L, encode("png", 20, 10, 0x808080)),   // solid mid-gray
      Row(2L, encode("jpeg", 16, 16, 0xffffff)),  // solid white, lossy codec
      Row(3L, "garbage".getBytes("UTF-8")),       // corrupt
      Row(4L, null)                               // null payload
    ).asJava, schema)

    val dec = Multimodal.decodeImages(df, "img_id", "png")
      .collect().map(r => r.getLong(0) -> r).toMap
    // png solid gray: exact dims + mean 128/255
    assert(dec(1L).getBoolean(1) && dec(1L).getInt(2) == 20 && dec(1L).getInt(3) == 10)
    assert(math.abs(dec(1L).getDouble(4) - 128.0 / 255.0) < 1e-9, dec(1L).toString)
    // jpeg decodes through the same kernel; solid white survives the lossy
    // roundtrip to within a hair
    assert(dec(2L).getBoolean(1) && dec(2L).getInt(2) == 16)
    assert(dec(2L).getDouble(4) > 0.98, dec(2L).toString)
    // corrupt and null payloads are DATA (decoded=false, null stats)
    assert(!dec(3L).getBoolean(1) && dec(3L).isNullAt(2))
    assert(!dec(4L).getBoolean(1))

    // resize: solid image stays solid at the new dims; re-decode proves it
    val rez = Multimodal.resizeImages(df.filter(F.col("img_id") === 1), "img_id", "png", 5, 4)
    val back = Multimodal.decodeImages(rez, "img_id", "png").collect().head
    assert(back.getInt(2) == 5 && back.getInt(3) == 4, back.toString)
    assert(math.abs(back.getDouble(4) - 128.0 / 255.0) < 1e-9, back.toString)
  }

  test("multimodal: REAL audio decode via the JDK WAV reader, incl. stereo") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // hand-built 16-bit PCM WAV through the JDK writer: max-amplitude
    // square wave, STEREO (the catalog row covers mono)
    def wav(channels: Int, rate: Float, frames: Int)(sample: (Int, Int) => Short): Array[Byte] = {
      val pcm = new Array[Byte](frames * channels * 2)
      for (f <- 0 until frames; c <- 0 until channels) {
        val v = sample(f, c)
        val i = (f * channels + c) * 2
        pcm(i) = (v & 0xff).toByte
        pcm(i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val schema = StructType(Seq(
      StructField("audio_id", LongType), StructField("wav", BinaryType)))
    import scala.jdk.CollectionConverters._
    // stereo square at full scale: every sample ±32767 -> rms = 32767/32768
    val stereo = wav(2, 44100f, 441)((f, _) => (if ((f / 10) % 2 == 0) 32767 else -32767).toShort)
    val df = spark.createDataFrame(Seq(
      Row(1L, stereo),
      Row(2L, "not audio".getBytes("UTF-8"))
    ).asJava, schema)
    val dec = Multimodal.decodeAudio(df, "audio_id", "wav")
      .collect().map(r => r.getLong(0) -> r).toMap
    val s = dec(1L)
    assert(s.getBoolean(1) && s.getInt(2) == 44100 && s.getInt(3) == 2, s.toString)
    assert(s.getLong(4) == 441, s.toString)
    assert(math.abs(s.getDouble(6) - 32767.0 / 32768.0) < 1e-9, s.toString)
    // 441 frames in 10-sample blocks -> 44 full borders crossed
    assert(s.getLong(7) == 44, s.toString)
    assert(!dec(2L).getBoolean(1) && dec(2L).isNullAt(2))
  }

  test("multimodal: REAL MJPEG-AVI frame decode (JPEG frames via javax.imageio)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // hand-built AVI whose movi frames are JPEGs — the MJPEG layout; the
    // raw-DIB flavor is pinned exactly by the q_multimodal_video oracle,
    // this covers the lossy-codec branch with tolerance
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]) = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++ pad
    }
    def list(t: String, body: Array[Byte]) = chunk("LIST", t.getBytes("US-ASCII") ++ body)
    def jpegFrame(gray: Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (gray << 16) | (gray << 8) | gray)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", bos)
      bos.toByteArray
    }
    val avih = new Array[Byte](56)
    System.arraycopy(le32(16), 0, avih, 32, 4)
    System.arraycopy(le32(16), 0, avih, 36, 4)
    val movi = (0 until 4).map(i => chunk("00dc", jpegFrame(60 + 40 * i, 16, 16))).reduce(_ ++ _)
    val body = "AVI ".getBytes("US-ASCII") ++ list("hdrl", chunk("avih", avih)) ++ list("movi", movi)
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body

    val schema = StructType(Seq(
      StructField("video_id", LongType), StructField("avi", BinaryType)))
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(Seq(Row(7L, avi)).asJava, schema)
    val frames = Multimodal.decodeVideoFrames(df, "video_id", "avi", stride = 1)
      .collect().sortBy(_.getInt(3))
    assert(frames.length == 4, frames.mkString(";"))
    frames.zipWithIndex.foreach { case (f, i) =>
      assert(f.getBoolean(1) && f.getInt(4) == 16 && f.getInt(5) == 16, f.toString)
      // JPEG is lossy: the solid level survives within a couple of levels
      assert(math.abs(f.getDouble(6) - (60 + 40 * i) / 255.0) < 0.02, f.toString)
    }

    // crafted AVI with an absurd chunk size: the RIFF walk must terminate
    // with decoded=false, not hang or throw
    val evil = "RIFF".getBytes("US-ASCII") ++ le32(1000) ++ "AVI ".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ le32(Int.MaxValue) ++ "movi".getBytes("US-ASCII") ++
      "00db".getBytes("US-ASCII") ++ le32(-5) ++ new Array[Byte](32)
    val evilDf = spark.createDataFrame(Seq(Row(8L, evil)).asJava, schema)
    val evilRows = Multimodal.decodeVideoFrames(evilDf, "video_id", "avi").collect()
    assert(evilRows.length == 1 && !evilRows.head.getBoolean(1), evilRows.mkString(";"))
  }
}
