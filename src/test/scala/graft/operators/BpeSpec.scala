package graft.operators

import graft.SparkTestBase
import graft.functions.{BpeExpressions, BpeTrie}
import org.apache.spark.sql.{functions => F}

/** Byte-level greedy longest-match BPE counting/segmentation gates: the
  * handmade closed-form cases pin the tokenizer semantics (longest match
  * wins, byte fallback is total, UTF-8 splits fall back per byte), and the
  * corpus properties pin the invariants the oracle rows lean on
  * (lossless segmentation, count = segment size, count = octet_length
  * under a non-occurring vocab). */
class BpeSpec extends SparkTestBase {

  private lazy val docs = table("documents")

  private def utf8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  test("trie: greedy longest match, handmade closed forms") {
    val trie = BpeTrie.fromStrings(Seq("the", "there", "an", "and", "é"))
    val cases = Seq(
      "there" -> 1L, // longest match beats nested 'the'
      "theres" -> 2L, // 'there' + 's'
      "thethe" -> 2L,
      "andthe" -> 2L,
      "an" -> 1L,
      "ant" -> 2L, // 'an' + 't'
      "thean" -> 2L, // 'the' + 'an' (maximal munch does not backtrack)
      "xyz" -> 3L, // pure byte fallback
      "thé" -> 3L, // 't','h' singles + 'é' (no 'the': third byte is 0xC3)
      "théré" -> 5L, // 't','h','é','r','é'
      "" -> 0L
    )
    cases.foreach { case (s, n) =>
      assert(trie.count(utf8(s)) == n, s"count('$s')")
      val seg = trie.segment(utf8(s))
      assert(seg.length == n, s"segment size('$s')")
      assert(seg.flatten.toSeq == utf8(s).toSeq, s"lossless('$s')")
    }
  }

  test("trie: a vocab token that is a strict extension dead-ends back to the last terminal") {
    // 'therefore' in vocab, text 'theref': the walk reaches depth 6 without
    // a terminal beyond 'there' — must emit 'there' + 'f', not fallback
    val trie = BpeTrie.fromStrings(Seq("the", "there", "therefore"))
    assert(trie.count(utf8("theref")) == 2L)
    assert(trie.segment(utf8("theref")).map(new String(_, "UTF-8")).toSeq ==
      Seq("there", "f"))
    assert(trie.count(utf8("therefore")) == 1L)
  }

  test("trie: invalid UTF-8 fragments and arbitrary bytes are total") {
    val trie = BpeTrie.fromStrings(Seq("ab"))
    val bytes = Array[Byte](0x61, 0x62, 0xC3.toByte, 0x61, 0x62, 0xFF.toByte, 0x00)
    assert(trie.count(bytes) == 5L) // 'ab', C3, 'ab', FF, 00
    assert(trie.segment(bytes).flatten.toSeq == bytes.toSeq)
  }

  test("expression: codegen path over a DataFrame, null text stays null") {
    import spark.implicits._
    val vocab = Seq("the", "there")
    val df = Seq((1L, "there"), (2L, "thethex"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select($"id",
        BpeExpressions.bpeCount($"text", vocab).as("n"),
        BpeExpressions.bpeSegment($"text", vocab).as("seg"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(rows == Map(1L -> 1L, 2L -> 3L, 3L -> -1L))
    // segmentation is lossless and sized like the count, on the same rows
    val seg = df.filter($"id" === 2L).select(F.expr("seg")).head.getSeq[Array[Byte]](0)
    assert(seg.map(new String(_, "UTF-8")).mkString == "thethex")
  }

  test("corpus properties: lossless segmentation, count bounds, byte identity") {
    val vocab = Seq("the", "and", "ing", "tion")
    val checked = docs.select(
        F.col("doc_id"),
        F.col("text"),
        BpeExpressions.bpeCount(F.col("text"), vocab).as("n"),
        BpeExpressions.bpeSegment(F.col("text"), vocab).as("seg"),
        F.octet_length(F.col("text")).as("bytes"),
        // a vocab that never occurs: count == octet_length exactly
        BpeExpressions.bpeCount(F.col("text"), Seq("zzzzqqzz")).as("n_bytes"))
      .withColumn("seg_n", F.size(F.col("seg")))
      .withColumn("rejoined", F.array_join(
        F.transform(F.col("seg"), b => b.cast("string")), ""))
    val bad = checked.filter(
      F.col("n") =!= F.col("seg_n") ||
        F.col("n") > F.col("bytes") ||
        F.col("n_bytes") =!= F.col("bytes") ||
        F.col("rejoined") =!= F.col("text"))
    assert(bad.count() == 0, bad.select("doc_id").collect().mkString(", "))
    // non-vacuous: the vocab actually merges something somewhere
    assert(checked.filter(F.col("n") < F.col("bytes")).count() > 0)
    // deterministic across evaluations
    val a = checked.select("doc_id", "n").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = docs.select(F.col("doc_id"),
      BpeExpressions.bpeCount(F.col("text"), vocab).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("bpe_stats: fallback closed forms, byte identities, null-text row") {
    // fallbackBytes distinguishes 1-token hits from fallbacks on the same
    // literal set the longest-match oracle pins: 'é' ∈ vocab is a 2-byte
    // HIT, the broken-up 't','h','r' singles are fallbacks
    val trie = BpeTrie.fromStrings(Seq("the", "there", "an", "and", "é"))
    val fbCases = Seq("there" -> 0L, "theres" -> 1L, "thethe" -> 0L,
      "thé" -> 2L, "théré" -> 3L, "andthean" -> 0L, "xyz" -> 3L, "" -> 0L)
    fbCases.foreach { case (s, fb) =>
      assert(trie.fallbackBytes(utf8(s)) == fb, s"fallbackBytes('$s')")
    }
    // real corpus: with an all-multi-byte vocab, fallbacks are EXACTLY the
    // 1-byte segments, matched + fallback = octet_length, hits >= 0
    val vocab = Seq("the", "and", "ing", "tion")
    val checked = docs.select(
        F.col("doc_id"),
        BpeExpressions.bpeCount(F.col("text"), vocab).as("n"),
        BpeExpressions.bpeFallbackBytes(F.col("text"), vocab).as("fb"),
        BpeExpressions.bpeSegment(F.col("text"), vocab).as("seg"),
        F.octet_length(F.col("text")).cast("long").as("bytes"))
      .withColumn("one_byte_segs",
        F.size(F.filter(F.col("seg"), b => F.length(b) === 1)).cast("long"))
      .withColumn("matched_bytes",
        F.aggregate(F.col("seg"), F.lit(0L), (acc, b) => acc + F.length(b)) - F.col("fb"))
    val bad = checked.filter(
      F.col("fb") =!= F.col("one_byte_segs") ||
        F.col("matched_bytes") + F.col("fb") =!= F.col("bytes") ||
        F.col("n") - F.col("fb") < 0)
    assert(bad.count() == 0, bad.select("doc_id").collect().mkString(", "))
    // the operator surface: ratios bounded, null text → zero counts + null ratios
    import spark.implicits._
    val withNull = docs.select("doc_id", "text")
      .union(Seq((999999L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val stats = Bpe.withStats(withNull, "text", vocab)
    val badStats = stats.filter(F.col("text").isNotNull &&
      (F.col("bpe_coverage") < 0.0 || F.col("bpe_coverage") > 1.0 ||
        F.col("fallback_bytes") > F.col("n_bytes") ||
        F.col("n_bpe_tokens") > F.col("n_bytes")))
    assert(badStats.count() == 0)
    val nullRow = stats.filter(F.col("doc_id") === 999999L).collect()
    assert(nullRow.length == 1 && nullRow.head.getAs[Long]("n_bpe_tokens") == 0L &&
      nullRow.head.getAs[Long]("n_bytes") == 0L &&
      nullRow.head.isNullAt(nullRow.head.fieldIndex("bpe_coverage")) &&
      nullRow.head.isNullAt(nullRow.head.fieldIndex("fertility")))
    // non-vacuous: the fitted corpus has BOTH covered and fallback bytes
    assert(checked.filter(F.col("fb") > 0).count() > 0)
    assert(checked.filter(F.col("matched_bytes") > 0).count() > 0)
  }

  test("loadVocab: distinct, null/empty filtered, cap enforced") {
    import spark.implicits._
    val v = Seq("the", "the", "", null.asInstanceOf[String], "and").toDF("token")
    assert(Bpe.loadVocab(v) == Seq("and", "the"))
    val big = spark.range(Bpe.MaxVocab + 1L).selectExpr("cast(id as string) as token")
    intercept[IllegalArgumentException](Bpe.loadVocab(big))
  }

  test("build_vocab composes into bpe_count: learned vocab ≡ manually loaded vocab") {
    // the intended pipeline: build the vocab FROM the corpus, count WITH it
    val built = CorpusStats.buildVocab(docs, "text", 20)
    assert(built.count() == 20) // corpus has 31 distinct tokens; the cut is exact
    // rank is dense 1..20 in (cnt desc, token) order
    val rows = built.orderBy("rank").collect()
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 20))
    val pairs = rows.map(r => (r.getAs[Long]("cnt"), r.getAs[String]("token")))
    assert(pairs.sortBy { case (c, t) => (-c, t) }.toSeq == pairs.toSeq)
    val vocab = Bpe.loadVocab(built)
    val viaOp = Bpe.withCount(docs, "text", vocab).select("doc_id", "n_bpe_tokens")
    val viaExpr = docs.select(F.col("doc_id"),
      BpeExpressions.bpeCount(F.col("text"), vocab).as("n_bpe_tokens"))
    assert(viaOp.except(viaExpr).count() == 0 && viaExpr.except(viaOp).count() == 0)
    // word-vocab counts sit strictly below raw byte counts (merges happen)
    val merged = viaOp.join(
        docs.select(F.col("doc_id"), F.octet_length(F.col("text")).as("bytes")), Seq("doc_id"))
      .filter(F.col("n_bpe_tokens") >= F.col("bytes"))
    assert(merged.count() == 0)
  }

  test("bpe_train: exact merges on a planted corpus, ties break lexicographically") {
    import spark.implicits._
    // hand-derived sequence (the q_bpe_train oracle): aa(6) → ab(4) → aaab(3)
    val planted = Seq((1L, "aaab aaab"), (2L, "aaab ab")).toDF("id", "text")
    val merges = BpeTrain.bpeTrain(planted, "text", 3).orderBy("rank").collect()
      .map(r => (r.getAs[String]("token"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count"), r.getAs[Int]("rank"))).toSeq
    assert(merges == Seq(("aa", "a", "a", 6L, 1), ("ab", "a", "b", 4L, 2),
      ("aaab", "aa", "ab", 3L, 3)))
    // tied pair counts: (x,y) and (x,z) both at 2 — the lexicographically
    // smaller pair merges first, deterministically
    val tied = Seq((1L, "xy xz"), (2L, "xy xz")).toDF("id", "text")
    val t = BpeTrain.bpeTrain(tied, "text", 2).orderBy("rank").collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Int]("rank"))).toSeq
    assert(t == Seq(("xy", 1), ("xz", 2)))
    // merges stop early when no pairs remain (requesting more is safe)
    val tiny = Seq((1L, "ab")).toDF("id", "text")
    assert(BpeTrain.bpeTrain(tiny, "text", 10).count() == 1)
  }

  test("bpe_train on the corpus: non-increasing merge counts, composes into bpe_count") {
    val merges = BpeTrain.bpeTrain(docs, "text", 40)
    val seq = merges.orderBy("rank").collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("pair_count"),
        r.getAs[Int]("rank"))).toSeq
    assert(seq.size == 40)
    assert(seq.map(_._3) == (1 to 40), "ranks dense in merge order")
    // a merge can only create pairs no more frequent than itself
    assert(seq.map(_._2).sliding(2).forall(w => w.head >= w.last),
      s"pair counts increased: ${seq.map(_._2)}")
    // tokens are concatenations over the ASCII token alphabet
    assert(seq.forall(_._1.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))))
    // the learned vocab drives the greedy counter end-to-end
    val vocab = Bpe.loadVocab(merges)
    val counted = Bpe.withCount(docs, "text", vocab)
    assert(counted.filter(F.col("n_bpe_tokens") >=
      F.octet_length(F.col("text"))).count() == 0, "learned merges never fire")
  }

  test("merge replay: diverges from greedy exactly as constructed; trainer-consistent") {
    import spark.implicits._
    // the classic divergence: greedy over the DERIVED vocab takes 'ab'
    // first on 'abcd' (maximal munch) and pays 3; rank-ordered replay
    // merges (b,c) then (bc,d) -> [a, bcd] = 2
    val merges = Seq(("b", "c"), ("bc", "d"), ("a", "b"))
    val vocab = merges.map { case (a, b) => a + b } // {bc, bcd, ab}
    val one = Seq((1L, "abcd")).toDF("id", "text")
    val greedy = Bpe.withCount(one, "text", vocab).head.getAs[Long]("n_bpe_tokens")
    val replay = Bpe.withMergeCount(one, "text", merges)
      .head.getAs[Long]("n_bpe_merge_tokens")
    assert(greedy == 3L && replay == 2L, s"greedy $greedy replay $replay")
    // trainer consistency: encoding the trainer's own corpus with its own
    // merges reproduces the hand-derived final symbol counts (every word
    // of the q_bpe_train planted corpus collapses to ONE token)
    val planted = Seq((1L, "aaab aaab"), (2L, "aaab ab")).toDF("id", "text")
    val learned = Bpe.loadMerges(BpeTrain.bpeTrain(planted, "text", 3))
    val counts = Bpe.withMergeCount(planted, "text", learned)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getAs[Long]("n_bpe_merge_tokens")))
    assert(counts.toSeq == Seq((1L, 2L), (2L, 2L)), counts.mkString(","))
    // with NO merges the count is the character count of the word stream;
    // replay count never exceeds it and is deterministic
    val base = docs.limit(30).select(F.col("doc_id"), F.col("text"))
    val zero = Bpe.withMergeCount(base, "text", Nil)
    val chars = base.select(F.col("doc_id"),
      F.aggregate(graft.functions.TextFunctions.tokens(F.col("text")),
        F.lit(0L), (acc, w) => acc + F.length(w)).as("nc"))
    val joined = zero.join(chars, "doc_id")
    assert(joined.filter(F.col("n_bpe_merge_tokens") =!= F.col("nc")).count() == 0)
    val learned40 = Bpe.loadMerges(BpeTrain.bpeTrain(docs, "text", 40))
    val a = Bpe.withMergeCount(base, "text", learned40)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_bpe_merge_tokens")).toMap
    val b = Bpe.withMergeCount(base, "text", learned40)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_bpe_merge_tokens")).toMap
    assert(a == b)
    assert(a.nonEmpty && joined.count() > 0)
  }

  test("bpe_encode: sequence length == merge count, concat reconstructs the stream") {
    // the encode surface and the counter run the SAME replay kernel — pin
    // it over the real corpus in both pretok modes: size(tokens) equals
    // n_bpe_merge_tokens row for row, and the concatenated symbols spell
    // exactly the concatenated pre-tokens (lossless tokenization)
    val corpus = docs.limit(120)
    Seq("words", "gpt2").foreach { pretok =>
      val merges = Bpe.loadMerges(
        BpeTrain.bpeTrain(corpus, "text", nMerges = 40, pretok = pretok))
      val enc = Bpe.encode(corpus, "doc_id", "text", merges, pretok)
      val counted = Bpe.withMergeCount(corpus, "text", merges, pretok = pretok)
        .select(F.col("doc_id"), F.col("n_bpe_merge_tokens"))
      val joined = enc.join(counted, Seq("doc_id"))
      val bad = joined.filter(
        F.coalesce(F.size(F.col("bpe_tokens")), F.lit(0)).cast("long") =!=
          F.col("n_bpe_merge_tokens")).count()
      assert(bad == 0, s"[$pretok] encode length diverged from merge count")
      val lossy = enc
        .join(corpus.select("doc_id", "text"), Seq("doc_id"))
        .filter(F.col("text").isNotNull)
        .filter(F.array_join(F.col("bpe_tokens"), "") =!=
          F.array_join(BpeTrain.pretokStream("text", pretok), ""))
        .count()
      assert(lossy == 0, s"[$pretok] tokenization not lossless over the pretok stream")
    }
    // null text → null tokens, count 0 (the counter's convention)
    import spark.implicits._
    val withNull = Seq((900001L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val m = Seq(("a", "b"))
    val r = Bpe.encode(withNull, "doc_id", "text", m).collect().head
    assert(r.isNullAt(1) && r.getLong(2) == 0L)
  }

  test("incremental trainer ≡ naive recount loop: planted, tied, and fuzz corpora") {
    // the r15 verdict #2 gate: the incremental (HF-tokenizers-shaped) loop
    // must be BIT-identical to the full-recount reference on every input —
    // same merges, same order, same pair_count at merge time
    def check(wc: Array[(String, Long)], nMerges: Int): Unit = {
      val naive = BpeTrain.mergeLoopNaive(wc, nMerges)
      val inc = BpeTrain.mergeLoopIncremental(wc, nMerges)
      assert(inc == naive, s"diverged on ${wc.take(5).toSeq}…: $inc vs $naive")
    }
    // planted (the q_bpe_train oracle corpus shape) and the tie corpus
    check(Array("abab" -> 3L, "abc" -> 2L, "cab" -> 1L), 5)
    check(Array("xy" -> 2L, "yx" -> 2L, "xx" -> 1L), 3)
    // degenerate: single chars only (no pairs → zero merges both ways)
    check(Array("a" -> 5L, "b" -> 3L), 4)
    // deterministic fuzz: random words over a small alphabet force dense
    // tie-breaking and pair re-creation across merges
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val wc = Array.fill(200)(
        (1 to (2 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
          -> (1L + rnd.nextInt(9)))
        .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }.toArray
      check(wc, 50)
    }
  }

  test("gpt2 pretokenizer: contractions, leading spaces, punctuation runs, case kept") {
    val rows = Seq(
      "don't stop don't" -> Seq("don", "'t", " stop", " don", "'t"),
      "Stop!! stop" -> Seq("Stop", "!!", " stop"),
      // double space: all-but-last space is its own run, last glues to 'b'
      "a  b" -> Seq("a", " ", " b"),
      "x9y" -> Seq("x", "9", "y"), // letter/digit runs split
      "hi  " -> Seq("hi", "  "), // trailing whitespace is one run
      "it's we're I'll" -> Seq("it", "'s", " we", "'re", " I", "'ll")
    )
    val df = spark.createDataFrame(rows.map(r => Tuple1(r._1))).toDF("text")
      .withColumn("pt", graft.functions.TextFunctions.gpt2Pretokens(F.col("text")))
    val got = df.select("pt").collect().map(_.getSeq[String](0).toSeq)
    rows.map(_._2).zip(got).foreach { case (exp, g) =>
      assert(g == exp, s"expected $exp got $g")
    }
  }

  test("bpe_train 'gpt2' pretok: planted merges diverge from the word stream as constructed") {
    val s = spark
    import s.implicits._
    val planted = Seq((1, "don't stop don't"), (2, "Stop!! stop")).toDF("id", "text")
    // hand-derived: pretypes don:1 't:2 ' stop':2 ' don':1 Stop:1 !!:1
    // round 1: (t,o) and (o,p) both 3 → lexicographic (o,p) wins, 'op'@3
    // round 2: (t,op)@3 → 'top'  round 3: five pairs tied at 2 → (' ','s')
    val gpt2 = BpeTrain.bpeTrain(planted, "text", 3, pretok = "gpt2")
      .orderBy("rank").collect()
    assert(gpt2.map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq ==
      Seq(("o", "p", 3L), ("t", "op", 3L), (" ", "s", 2L)), gpt2.mkString(", "))
    // the word stream lowercases and strips ' ', '!', casing: same corpus
    // trains a DIFFERENT merge sequence (don/t/stop × counts: stop:3 ...)
    val words = BpeTrain.bpeTrain(planted, "text", 3).orderBy("rank").collect()
    assert(words.map(_.getString(0)).toSeq !=
      gpt2.map(_.getString(0)).toSeq, "gpt2 and word-stream merges must diverge")
  }

  test("bpe_count_merges 'gpt2': space-bearing symbols replay unambiguously") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1, "don't stop"), (2, "stop  stop"), (3, "STOP")).toDF("id", "text")
    // merges over gpt2 pretokens incl. a space-led symbol and an all-space
    // pair — the length-prefixed pair key keeps (' ','s')+('t','o')
    // distinct from any space-separator collision
    val merges = Seq(("s", "t"), (" ", "st"), ("o", "p"), (" ", " "))
    val got = Bpe.withMergeCount(corpus, "text", merges, pretok = "gpt2")
      .orderBy("id").select("n_bpe_merge_tokens").collect().map(_.getLong(0))
    // doc1: [don]['t][ stop] → don(3) + 't(2) + ' stop'→[ ,s,t,o,p]→
    //   [ ,st,op]→[ st,op]→2 → 7
    // doc2: [stop][  ][ stop] → [st,op]=2 + ['  ']→(' ',' ') merged→1 +
    //   [ st,op]=2 → 5
    // doc3: [STOP] → no merges (case kept) → 4
    assert(got.toSeq == Seq(7L, 5L, 4L), got.mkString(","))
  }

  test("incremental trainer wall-clock: 4K merges over 100K word types") {
    // the scale posture the incremental loop exists for: the naive loop's
    // full recount at this size would take minutes; the incremental loop
    // must finish in seconds (bound is generous vs ~2 s measured to stay
    // load-robust, but far below the naive loop's cost)
    val rnd = new scala.util.Random(7)
    val wc = Array.tabulate(100000) { i =>
      val w = (1 to (3 + rnd.nextInt(10)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      w -> (1L + 1000000L / (i + 1)) // Zipf-ish
    }.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }.toArray
    val t0 = System.nanoTime()
    val merges = BpeTrain.mergeLoopIncremental(wc, 4096)
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"4096 merges over ${wc.length} types: $sec%.1f s")
    assert(merges.size == 4096, s"only ${merges.size} merges")
    assert(sec < 60.0, f"incremental trainer too slow: $sec%.1f s")
  }

  test("budget + packing accept the BPE counter: unit swaps, anatomy unchanged") {
    val vocab = Seq("the", "and", "ing", "tion")
    val counter = Bpe.counter(vocab)
    val sel = Sampling.selectTokenBudget(docs, "doc_id", "text", 50000,
      tokenCounter = Some(counter))
    // n_tokens is the BPE count, not the word count
    val one = sel.select(F.col("doc_id"), F.col("n_tokens"),
        BpeExpressions.bpeCount(F.col("text"), vocab).as("expect"))
      .filter(F.col("n_tokens") =!= F.col("expect"))
    assert(one.count() == 0)
    // cum_tokens is the prefix sum of those units (spot: max cum <= budget)
    assert(sel.agg(F.max("cum_tokens")).head.getLong(0) <= 50000L)
    val packed = Packing.packSequences(docs, "doc_id", "text", budget = 512,
      tokenCounter = Some(counter))
    val mismatch = packed.join(
        docs.select(F.col("doc_id"),
          BpeExpressions.bpeCount(F.col("text"), vocab).as("expect")), Seq("doc_id"))
      .filter(F.col("n_tokens") =!= F.col("expect"))
    assert(mismatch.count() == 0)
  }
}
