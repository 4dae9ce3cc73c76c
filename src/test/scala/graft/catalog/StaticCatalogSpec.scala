package graft.catalog

import graft.SparkTestBase

/** Static catalog round-trip: export testdata schemas as `.wv` type defs,
  * load them back, and COMPILE queries against empty typed frames — the
  * reference's compile-without-DB workflow (StaticCatalogExporter.scala,
  * examples/static-catalog). */
class StaticCatalogSpec extends SparkTestBase {

  test("export -> load round-trips every table schema") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cat").toString
    val out = s"$tmp/catalog.wv"
    val names = StaticCatalog.exportDir(spark, sfDir, out)
    assert(names.contains("lineitem") && names.contains("documents"))
    val types = StaticCatalog.load(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out))))
    names.foreach { n =>
      val real = graft.Tables.read(spark, sfDir, n).schema
      val loaded = types(n)
      assert(loaded.fields.map(_.name).toList == real.fields.map(_.name).toList,
        s"$n column names differ")
    }
    // embeddings vector column survives as array type
    assert(types("embeddings").fields.exists(f =>
      f.name == "embedding" && f.dataType.typeName == "array"))
  }

  test("queries compile and validate against the static catalog (no data)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cat2").toString
    val out = s"$tmp/catalog.wv"
    StaticCatalog.exportDir(spark, sfDir, out)
    val resolver = StaticCatalog.resolverFromFile(spark, out)
    // a realistic query analyzes fully (schemas known) and yields 0 rows
    val df = graft.Graft.query(spark, """
      from lineitem
      where l_quantity > 10
      group by l_returnflag
      agg n = _.count, s = l_extendedprice.sum
      order by l_returnflag
    """, resolver)
    assert(df.columns.toList == List("l_returnflag", "n", "s"))
    assert(df.count() == 0)
    // an invalid column still FAILS analysis — compile-time validation works
    intercept[Exception] {
      graft.Graft.query(spark, "from lineitem select no_such_column", resolver)
        .queryExecution.analyzed
    }
  }
}
