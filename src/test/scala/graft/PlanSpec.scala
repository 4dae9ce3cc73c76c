package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan quality gates: the plans behind the flagship queries must
  * keep the properties that make them survive a 100x scale-up — filters
  * pushed into the parquet scan, read schemas pruned to referenced
  * columns, dimension joins broadcast, aggregates split partial/final,
  * and no cartesian products where an equi-join exists. A green result
  * that reads every column or shuffles a broadcastable dimension is a
  * scale bug even when the rows match. */
class PlanSpec extends SparkTestBase {

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("filters push into the parquet scan; read schema is pruned") {
    val df = wv("""
      from lineitem
      where l_quantity > 45
      select l_orderkey, l_quantity
    """)
    val plan = planOf(df)
    assert(plan.contains("PushedFilters") &&
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThan\\(l_quantity.*"),
      s"filter not pushed:\n$plan")
    // pruned scan: only the two referenced columns reach the reader
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity") &&
      !readSchema.contains("l_comment") && !readSchema.contains("l_extendedprice"),
      s"schema not pruned: $readSchema")
  }

  test("dimension joins broadcast; no shuffle of the small side") {
    val df = wv("""
      from orders
      join customer on o_custkey = c_custkey
      join nation on c_nationkey = n_nationkey
      group by n_name
      agg revenue = o_totalprice.sum
    """)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
  }

  test("aggregates run partial then final (map-side combine)") {
    val df = wv("""
      from lineitem
      group by l_returnflag
      agg n = _.count, qty = l_quantity.sum
    """)
    val plan = planOf(df)
    val hashAggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate:\n$plan")
    assert(plan.contains("partial_"), s"no partial aggregation:\n$plan")
  }

  test("semi-join subqueries plan as joins, not per-row subplans") {
    val df = wv("""
      from orders
      where o_custkey in (from customer where c_acctbal > 0 select c_custkey)
      count
    """)
    val plan = planOf(df)
    assert(plan.contains("LeftSemi") || plan.contains("SemiJoin"),
      s"IN subquery did not plan as a semi join:\n$plan")
  }

  test("whole-stage codegen covers the scan-filter-project pipeline") {
    val df = wv("""
      from lineitem
      where l_discount between 0.05 and 0.07
      select l_orderkey, l_extendedprice
    """)
    // FormattedMode marks codegen-stage operators with a `*` prefix
    val plan = planOf(df)
    assert(plan.contains("* Filter") && plan.contains("* Project"),
      s"scan-filter-project not inside a codegen stage:\n$plan")
  }

  test("custom vector expressions stay inside codegen") {
    import org.apache.spark.sql.{functions => F}
    val embs = table("embeddings")
    val df = embs.select(
      graft.functions.VectorExpressions.cosineSimilarity(
        F.col("embedding"), F.col("embedding")).as("c"))
    val plan = planOf(df)
    assert(plan.contains("* Project"),
      s"vector expr fell out of codegen:\n$plan")
  }
}
