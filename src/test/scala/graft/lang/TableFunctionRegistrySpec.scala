package graft.lang

import org.scalatest.funsuite.AnyFunSuite

/** Pins Lowering.nativeTableFunctions — the single registry the LSP
  * completion list and the playground derive from — to the ACTUAL dispatch
  * cases in Lowering.scala, by grepping the source. Adding a
  * `name.toLowerCase == "new_fn"` dispatch case without adding "new_fn" to
  * the registry (or vice versa) fails here, so the completion/demo
  * staleness that hit r13 and r14 is structurally impossible. */
class TableFunctionRegistrySpec extends AnyFunSuite {

  private def dispatchCases(): Set[String] = {
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/lang/Lowering.scala"))
    """name\.toLowerCase == "([a-z0-9_]+)"""".r
      .findAllMatchIn(src).map(_.group(1)).toSet
  }

  test("registry equals the Lowering dispatch cases") {
    val cases = dispatchCases()
    val registry = Lowering.nativeTableFunctions.toSet
    val missing = cases -- registry
    val phantom = registry -- cases
    assert(missing.isEmpty,
      s"dispatch cases missing from Lowering.nativeTableFunctions: ${missing.toSeq.sorted.mkString(", ")}")
    assert(phantom.isEmpty,
      s"registry names with no dispatch case: ${phantom.toSeq.sorted.mkString(", ")}")
  }

  test("registry is sorted and duplicate-free") {
    val r = Lowering.nativeTableFunctions
    assert(r.distinct == r, "duplicate registry entries")
    assert(r.sorted == r, "keep the registry sorted — diffs stay reviewable")
  }

  test("every playground demo table function is a registry native") {
    // demos are creative content (can't be derived), but a demo referencing
    // a renamed/removed native must fail the build, not 500 the page
    val fnRe = """from\s+([a-z0-9_]+)\s*\(""".r
    val known = Lowering.nativeTableFunctions.toSet + "unnest"
    graft.server.Playground.demos.foreach { case (name, q) =>
      fnRe.findAllMatchIn(q).map(_.group(1)).foreach { fn =>
        assert(known.contains(fn), s"demo $name references unknown table function $fn")
      }
    }
  }

  test("the LLM-operator teaching set has a demo per operator") {
    val text = graft.server.Playground.demos.map(_._2).mkString("\n")
    val teachingSet = Seq("similarity_topk", "split_by_cluster", "dedup_semantic",
      "perplexity_score", "perplexity_score_bigram", "select_token_budget",
      "contamination_report", "contamination_report_semantic", "vocab_profile",
      "mix_by_temperature",
      "bpe_count", "bpe_count_merges", "bpe_stats", "build_vocab", "bpe_train")
    teachingSet.foreach { fn =>
      assert(text.contains(s"$fn("), s"no playground demo exercises $fn")
    }
  }
}
