package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.lang._

/** Public entry points for the Graft engine: compile flow-style queries
  * (the reference language's pipe syntax) into Spark DataFrames.
  *
  * {{{
  * val df = Graft.query(spark, """
  *   from orders
  *   where o_orderstatus = 'F'
  *   group by o_custkey
  *   agg order_count = _.count, total = o_totalprice.sum
  *   order by total desc
  *   limit 10
  * """, name => spark.read.parquet(s"/data/$name.parquet"))
  * }}}
  */
object Graft {

  /** Compile + lower a query text to a DataFrame. Multi-statement inputs
    * (model defs, vals, then a query) are supported; the last query wins. */
  def query(
      spark: SparkSession,
      text: String,
      tableResolver: String => DataFrame,
      basePath: String = "",
      params: Seq[Any] = Nil
  ): DataFrame = {
    val ctx = Lowering.Context(spark, tableResolver, basePath, params = params)
    val stmts = Parser.parseStatements(text)
    val out = Lowering.lowerStatements(stmts, ctx)
    runDebugs(ctx)
    out.getOrElse(throw new LoweringException("no query statement in input"))
  }

  /** Execute `debug { … }` side branches eagerly, printing a bounded sample
    * to stderr (the reference runs the branch as a side task —
    * ExecutionPlanner.scala:39-41; a silent no-op would hide user errors). */
  private def runDebugs(ctx: Lowering.Context): Unit =
    ctx.debugs.foreach { df =>
      df.limit(20).collect().foreach(r => System.err.println(s"[debug] $r"))
    }

  /** Like `query` but resolves table names through the session catalog. */
  def query(spark: SparkSession, text: String): DataFrame =
    query(spark, text, name => spark.table(name))

  /** Compile and also evaluate embedded `test ...` assertions (the
    * reference's self-verifying spec style; RunnerSpec.scala:30-93).
    * Returns the final DataFrame; throws TestFailure on assertion failure. */
  def run(
      spark: SparkSession,
      text: String,
      tableResolver: String => DataFrame,
      basePath: String = ""
  ): DataFrame = {
    val ctx = Lowering.Context(spark, tableResolver, basePath)
    val stmts = Parser.parseStatements(text)
    val out = Lowering.lowerStatements(stmts, ctx)
    runDebugs(ctx)
    ctx.tests.foreach { case (df, assertion) => TestRunner.check(df, assertion) }
    out.getOrElse(throw new LoweringException("no query statement in input"))
  }

  /** Raw Spark SQL escape hatch (the reference's RawSQL node). */
  def sql(spark: SparkSession, text: String): DataFrame = spark.sql(text)

  /** Parse only — returns statements for inspection / tooling. */
  def parse(text: String): List[Statement] = Parser.parseStatements(text)
}
