package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.lang.{Lowering, Parser, TypeDefStmt}

/** Static catalog export/import (reference: StaticCatalogExporter.scala —
  * 358 LoC — and examples/static-catalog): table schemas are exported as
  * `.wv` `type` definitions so queries COMPILE without a live connection
  * to the data. The import half builds a resolver serving empty, correctly
  * typed DataFrames — plans analyze and validate end-to-end; only actions
  * need the real data.
  */
object StaticCatalog {

  /** Render one table schema as a `type name in <schema> = {…}` block. */
  def typeDef(name: String, schema: StructType, inSchema: String = "main"): String = {
    val fields = schema.fields.map { f =>
      s"  ${f.name}: ${Lowering.wvTypeName(f.dataType)}"
    }
    s"type $name in $inSchema = {\n${fields.mkString("\n")}\n}"
  }

  /** Export every parquet table of a data directory as a `.wv` catalog. */
  def exportDir(spark: SparkSession, dataDir: String, outFile: String): Seq[String] = {
    val dir = new java.io.File(dataDir)
    val tables = dir.listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
      .map { f =>
        val name = f.getName.stripSuffix(".parquet")
        name -> spark.read.parquet(f.getAbsolutePath).schema
      }
    val text = tables.map { case (n, s) => typeDef(n, s) }.mkString("\n\n") + "\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), text)
    tables.map(_._1)
  }

  /** `array(T)` / `map(K,V)` wvlet spelling → Spark DDL `array<T>` angle
    * brackets; decimal(p,s) parens stay parens. */
  private def ddlType(t: String): String = {
    val sb = new StringBuilder
    val stack = scala.collection.mutable.Stack.empty[Boolean] // angle?
    var k = 0
    while (k < t.length) {
      val c = t.charAt(k)
      if (c == '(') {
        var j = k
        while (j > 0 && (t.charAt(j - 1).isLetterOrDigit || t.charAt(j - 1) == '_')) j -= 1
        val word = t.substring(j, k).toLowerCase
        val angle = word == "array" || word == "map" || word == "struct" || word == "row"
        stack.push(angle)
        sb += (if (angle) '<' else '(')
      } else if (c == ')') {
        sb += (if (stack.nonEmpty && stack.pop()) '>' else ')')
      } else sb += c
      k += 1
    }
    sb.toString
  }

  /** Parse an exported catalog back into name → StructType. */
  def load(text: String): Map[String, StructType] =
    Parser.parseStatements(text).collect {
      case TypeDefStmt(name, _, fields, _, _) =>
        name -> StructType.fromDDL(fields.map { case (f, t) =>
          s"$f ${ddlType(Lowering.mapTypeName(t))}"
        }.mkString(", "))
    }.toMap

  /** A table resolver over the static catalog: every table is an EMPTY
    * frame with the exported schema — compilation and plan validation work
    * without the data (the reference's compile-without-DB workflow). */
  def resolver(spark: SparkSession, types: Map[String, StructType]): String => DataFrame =
    name => types.get(name) match {
      case Some(schema) =>
        spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      case None =>
        throw new IllegalArgumentException(s"table '$name' not in the static catalog")
    }

  def resolverFromFile(spark: SparkSession, file: String): String => DataFrame =
    resolver(spark, load(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)))))
}
