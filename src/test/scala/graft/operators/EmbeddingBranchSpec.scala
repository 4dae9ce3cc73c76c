package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.{functions => F}

/** Force the AT-SCALE arms of the size-gated pair kernels (r18 verdict
  * "what's wrong" #4 / next-round #3): at every test SF the plan-statistics
  * gates always take the small-input arm, leaving the 100 TB shapes —
  * embeddingCosinePairs' ids-only candidate exchange and the shingle
  * kernel's spread/pass-through pair — dead code under the whole suite.
  * These specs override the gates through their system-property hooks and
  * pin (a) row equality between the arms on the same fixture and (b) the
  * plan property the big arm exists for: the candidate dropDuplicates
  * exchange must carry NO vector column.
  */
class EmbeddingBranchSpec extends SparkTestBase {

  private def withProp[T](key: String, value: String)(body: => T): T = {
    val old = sys.props.get(key)
    sys.props(key) = value
    try body
    finally old match {
      case Some(v) => sys.props(key) = v
      case None => sys.props.remove(key)
    }
  }

  /** Planted near-dups (the PipelineSpec recall fixture): a perturbed copy
    * of each of 60 vectors, so pairs exist at threshold 0.95. */
  private def corpus: DataFrame = {
    val base = table("embeddings").filter(F.col("vec_id") < 60)
      .select("vec_id", "embedding")
    val perturbed = base.select(
      (F.col("vec_id") + 100000L).as("vec_id"),
      F.transform(F.col("embedding"),
        (x, i) => (x + (i % 3 - 1).cast("float") * F.lit(0.02f)).cast("float"))
        .as("embedding"))
    base.union(perturbed)
  }

  private def pairRows(df: DataFrame): List[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toList.sorted

  /** The candidate-dedup exchanges: hash-partitioned on exactly the pair
    * key (id_a, id_b). Exchanges are inserted by EnsureRequirements, so
    * inspect the executed plan (unwrapping AQE's root — before execution it
    * holds the initial physical plan). */
  private def pairKeyExchanges(df: DataFrame): Seq[ShuffleExchangeExec] = {
    val root = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    root.collect {
      case e: ShuffleExchangeExec => e
    }.filter(_.outputPartitioning match {
      case h: HashPartitioning =>
        val keys = h.expressions.flatMap(_.references.toSeq.map(_.name)).toSet
        keys == Set("id_a", "id_b")
      case _ => false
    })
  }

  test("embedding pair kernel: ids-only arm ≡ vector-carrying arm, row for row") {
    val fixture = corpus
    // default gate at this SF: vectors ride the candidate rows
    val fat = Dedup.embeddingCosinePairs(fixture, "vec_id", "embedding", threshold = 0.95)
    // force the at-scale arm: candidates travel as (id, id) only
    val idsOnly = withProp("graft.pairVecCarryMaxBytes", "1") {
      Dedup.embeddingCosinePairs(fixture, "vec_id", "embedding", threshold = 0.95)
    }
    val a = pairRows(fat)
    val b = pairRows(idsOnly)
    assert(a.nonEmpty, "fixture produced no pairs — threshold too high for the spec")
    assert(a == b, s"arms diverged: fat=${a.size} rows, idsOnly=${b.size} rows")
  }

  test("ids-only arm: the candidate dedup exchange carries no vector column") {
    val fixture = corpus
    val idsOnly = withProp("graft.pairVecCarryMaxBytes", "1") {
      Dedup.embeddingCosinePairs(fixture, "vec_id", "embedding", threshold = 0.95)
    }
    val dedupEx = pairKeyExchanges(idsOnly)
    assert(dedupEx.nonEmpty, s"no pair-keyed exchange found:\n${idsOnly.queryExecution.sparkPlan}")
    dedupEx.foreach { e =>
      val out = e.output.map(_.name)
      assert(out == Seq("id_a", "id_b"),
        s"candidate exchange must carry the bare pair key, got: $out")
    }
    // inverse sanity on the default arm: the fat dedup exchange carries the
    // vector aggregation buffers on top of the pair key (that is exactly
    // what the gate trades away at scale)
    val fat = Dedup.embeddingCosinePairs(fixture, "vec_id", "embedding", threshold = 0.95)
    val fatEx = pairKeyExchanges(fat)
    assert(fatEx.exists(_.output.size > 2),
      "gate sanity: expected the small-input arm's dedup exchange to carry more than the pair key")
  }

  test("shingle kernel: spread arm ≡ pass-through arm, row for row") {
    val docs = table("documents")
    def run(): DataFrame =
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.12)
    // force the pass-through arm (no pre-shingle exchange)…
    val serial = withProp("graft.shingleSpreadMinBytes", Long.MaxValue.toString) {
      run()
    }
    // …and the spread arm (unconditional pre-shingle exchange)
    val spread = withProp("graft.shingleSpreadMinBytes", "0") { run() }
    val a = pairRows(serial)
    val b = pairRows(spread)
    assert(a.nonEmpty, "fixture produced no near-dup pairs")
    assert(a == b, s"arms diverged: serial=${a.size} rows, spread=${b.size} rows")
  }
}
