package graft.catalog

import graft.SparkTestBase

/** Catalog-level invariants every oracle row must satisfy BEFORE the
  * driver sees it (VERDICT r17 Next #2). The driver's comparator
  * hash-sorts every output column, so a row emitting an array/struct/map
  * column crashes it — r17's q_bpe_encode shipped a raw `array<string>`
  * and the round's only red row was the comparator's pandas lexsort
  * dying, not a wrong answer. This spec compiles every wv-surface row
  * ANALYSIS-ONLY (no jobs — the analysisOnly contract) and rejects
  * non-scalar output columns; the Scala-lambda rows (whose plans only
  * exist at execution) are gated by the same check inside Verify itself,
  * which fails the row loudly before the driver's compare. */
class CatalogInvariantSpec extends SparkTestBase {

  test("every wv oracle row compiles to scalar-only output columns") {
    val texts = QueryCatalog.queryWvTexts
    assert(texts.size > 100, s"wv-text capture looks broken: ${texts.size} rows")
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    var checked = 0
    texts.toSeq.sortBy(_._1).foreach { case (name, text) =>
      val df =
        try Some(graft.CompileApi.compileOnly(spark, text, sfDir, None))
        catch {
          // write-effecting rows (save/dml) refuse compile-only by design;
          // their execution schemas are covered by Verify's check
          case e: graft.lang.LoweringException
              if String.valueOf(e.getMessage).contains("compile-only") => None
        }
      df.foreach { d =>
        checked += 1
        val bad = QueryCatalog.nonScalarColumns(d.schema)
        if (bad.nonEmpty) offenders += s"$name -> ${bad.mkString(", ")}"
      }
    }
    assert(checked > 80, s"too few rows actually compiled: $checked")
    assert(offenders.isEmpty,
      "rows with non-scalar output columns (the driver comparator crashes " +
        "on these — serialize via array_join, the q_array_funcs convention):\n  " +
        offenders.mkString("\n  "))
  }

  test("the r17 failure shape is rejected: a raw array column is flagged") {
    // regression guard for the guard: bpe_encode WITHOUT the array_join
    // serialization is exactly what must be caught
    val df = graft.CompileApi.compileOnly(spark,
      """
        model m = { from [['b', 'c', 1]] as m(left, right, rank) }
        model c = { from [[1, 'abcd']] as c(id, text) }
        from bpe_encode('c', 'id', 'text', 'm')
      """, sfDir, None)
    val bad = QueryCatalog.nonScalarColumns(df.schema)
    assert(bad.exists(_.startsWith("bpe_tokens")), s"expected bpe_tokens flagged, got $bad")
  }
}
