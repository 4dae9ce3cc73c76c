package graft.server

import graft.SparkTestBase

/** Pins the generated operator reference to the dispatch registry (the
  * TableFunctionRegistrySpec pattern, extended to the docs page): every
  * registry native appears exactly once with a probed signature, the
  * oracle-row mapping points at real catalog rows, and the page renders
  * without hand-maintained content. A registry rename/removal that the
  * page misses fails here, not in a stale HTML table. */
class OperatorDocsSpec extends SparkTestBase {

  private lazy val docs = {
    OperatorDocs.clearCache()
    OperatorDocs.build(spark, sfDir)
  }

  test("every registry native is documented exactly once, in registry order") {
    assert(docs.map(_.name) == graft.lang.Lowering.nativeTableFunctions,
      "docs page diverged from Lowering.nativeTableFunctions")
  }

  test("every entry carries a dispatch-derived signature") {
    val blank = docs.filter(_.args.trim.isEmpty)
    assert(blank.isEmpty, s"entries with no signature: ${blank.map(_.name).mkString(", ")}")
    // probed signatures are the dispatch's own `expects (…)` text (or `()`
    // for zero-arg natives) — a pinned handful use prose errors instead
    val proseOk = Set("range", "parquet_metadata")
    val odd = docs.filterNot(d =>
      d.args.trim.startsWith("(") || proseOk.contains(d.name))
    assert(odd.isEmpty,
      s"signatures not parsed from the dispatch: ${odd.map(d => d.name + " -> " + d.args).mkString("; ")}")
  }

  test("oracle-row mapping points at real catalog rows with oracles") {
    val known = graft.SparkEntry.queries.keySet
    docs.foreach { d =>
      d.oracleRows.foreach(r => assert(known.contains(r),
        s"${d.name} maps to unknown row $r"))
    }
    // the flagship families must map to at least one oracled row each
    Seq("similarity_topk", "dedup_bloom", "perplexity_score", "contamination_report",
      "dsir_weight", "quality_classifier_score", "top_ngrams").foreach { op =>
      val doc = docs.find(_.name == op).get
      assert(doc.oracleRows.nonEmpty, s"$op has no mapped oracle row")
      assert(doc.oracleRows.exists(graft.SparkEntry.oracleSql.contains),
        s"$op maps to rows without oracle SQL: ${doc.oracleRows}")
    }
  }

  test("schema probe resolves output schemas for the core operators") {
    // not every example can lower (path-typed args, placeholder relations
    // without aliases) — but the teaching set must show real schemas
    Seq("similarity_topk", "dedup_bloom", "perplexity_score", "top_ngrams",
      "contamination_report", "prototypicality_score").foreach { op =>
      val doc = docs.find(_.name == op).get
      assert(doc.schema.nonEmpty, s"$op example failed the schema probe")
    }
    val d = docs.find(_.name == "dedup_bloom").get
    assert(d.schema.contains("keep_id") && d.schema.contains("dup_count"), d.schema)
  }

  test("scale exponents parse from BENCH_SCALE.json when present") {
    val exps = OperatorDocs.scaleExponents()
    if (java.nio.file.Files.exists(java.nio.file.Paths.get("BENCH_SCALE.json"))) {
      assert(exps.nonEmpty, "BENCH_SCALE.json present but no exponents parsed")
      assert(exps.keys.forall(_.startsWith("q_")))
    }
  }

  test("the HTML page renders every native and nothing hand-maintained leaks") {
    val html = OperatorDocs.page(spark, sfDir)
    graft.lang.Lowering.nativeTableFunctions.foreach { n =>
      assert(html.contains(s"<code>$n</code>"), s"page missing $n")
    }
  }
}
