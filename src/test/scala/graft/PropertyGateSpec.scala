package graft

/** The approximate queries (minhash-LSH, simhash, LSH/IVF top-k) have no
  * DuckDB oracle — their hashes are engine-specific — so the catalog
  * carries *_property companions whose outputs ARE oracle-checkable
  * invariants (subset/exactness/recall-floor). This spec pins each
  * companion to its expected row at sf0.001; the driver checks the same
  * rows against constant oracles at sf0.01. A regression in any
  * approximate operator (broken verify stage, broken blocking, broken
  * cosine kernel, collapsed recall) flips a field and fails both gates. */
class PropertyGateSpec extends SparkTestBase {

  private def row(name: String) =
    SparkEntry.queries(name)(spark, sfDir).collect().head

  test("minhash-LSH: emitted ⊆ exact pairs; strong pairs (j >= 0.7) all found") {
    val r = row("q_dedup_minhash_property")
    assert((r.getLong(0), r.getLong(1)) == ((0L, 0L)))
  }

  test("simhash: pair set EQUALS brute force over the signatures") {
    val r = row("q_dedup_simhash_property")
    assert((r.getLong(0), r.getLong(1)) == ((0L, 0L)))
  }

  test("LSH top-k: exact cosines on hits; recall@5 clears the floor") {
    val r = row("q_similarity_lsh_property")
    assert(r.getLong(0) == 0L && r.getBoolean(1))
  }

  test("IVF top-k: exact cosines on hits; recall@5 clears the floor") {
    val r = row("q_similarity_ivf_property")
    assert(r.getLong(0) == 0L && r.getBoolean(1))
  }

  test("int8 top-k: recall@5 vs float brute force clears the 0.9 floor") {
    val r = row("q_similarity_int8_property")
    assert(r.getBoolean(0))
  }

  test("PQ top-k: recall@5 clears the 0.3 floor; bitwise deterministic") {
    val r = row("q_similarity_pq_property")
    assert(r.getBoolean(0) && r.getLong(1) == 0L, r.toString)
  }

  test("TRAINED PQ top-k: recall@5 clears the 0.7 floor; bitwise deterministic") {
    val r = row("q_similarity_pq_trained_property")
    assert(r.getBoolean(0) && r.getLong(1) == 0L, r.toString)
  }
}
