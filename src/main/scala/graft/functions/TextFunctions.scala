package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** Text-analysis column functions for large-scale training-data pipelines.
  *
  * Everything here is a pure `Column` expression (no UDFs): whole-stage
  * codegen applies, predicates stay pushable, and the functions compose
  * with any DataFrame plan at 100 TB scale. Where a function must be
  * reproducible in ANSI SQL (for the DuckDB correctness oracle), the
  * building blocks are deliberately restricted to portable primitives
  * (split / md5 / length / regexp).
  */
object TextFunctions {

  /** Lowercased alphanumeric word tokens — THE canonical unigram stream.
    * Every token-counting operator (perplexity, vocab profile, token
    * budget, packing) uses this column; the one-pass hash kernel
    * (TextHashExpressions.shingleHashes64, used by dedup / token stats /
    * decontamination) tokenizes with the same boundaries, and a
    * PipelineSpec gate asserts per-doc distinct-token-count equality of
    * the two streams over a mixed Unicode corpus, so quality features and
    * dedup cannot silently disagree on what a token is. */
  def tokens(text: Column): Column =
    F.filter(F.split(F.lower(text), "[^a-z0-9]+"), t => F.length(t) > 0)

  /** The GPT-2 pre-tokenization regex (Radford et al. 2019, the public
    * encoder.py pattern): contractions split off ('s 't 're 've 'm 'll
    * 'd), letter/digit runs keep ONE leading space, punctuation runs
    * group, case and whitespace are KEPT — this is what HF byte-level BPE
    * tokenizers segment before merging, vs [[tokens]]' lowercased
    * `[a-z0-9]+` stream. Java regex (the lookahead `\s+(?!\S)` keeps
    * trailing-whitespace runs off the following word's leading space). */
  val gpt2PretokenPattern: String =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""

  /** GPT-2 pre-token stream of a text column — the optional `'gpt2'`
    * pretok mode of bpe_train / bpe_count_merges. Merges then apply
    * WITHIN these pre-tokens (never across), exactly like the canonical
    * word stream; the merge alphabet stays characters (the byte→unicode
    * remap of full byte-level BPE changes nothing about segmentation or
    * counts for valid UTF-8 text). */
  def gpt2Pretokens(text: Column): Column =
    F.filter(F.regexp_extract_all(text, F.lit(gpt2PretokenPattern), F.lit(0)),
      t => F.length(t) > 0)

  /** Token count under the engine's canonical tokenizer: LOWERCASED
    * ALPHANUMERIC RUNS (`[a-z0-9]+`), not whitespace words — hyphenated,
    * punctuated, or accented text yields more tokens than a whitespace
    * split ("state-of-the-art" is 4). Chunking's `n_words` is the
    * whitespace count; the two deliberately differ. */
  def tokenCount(text: Column): Column = F.size(tokens(text))

  /** BPE-ish subword count estimate: words + extra tokens for long words
    * (every 4 chars beyond the first 4 adds one), a standard cheap proxy. */
  def subwordCountEstimate(text: Column): Column =
    F.aggregate(
      tokens(text),
      F.lit(0L),
      (acc, w) => acc + F.lit(1L) + F.floor((F.length(w) - 1) / 4).cast("long")
    )

  /** Document fingerprint: md5 of normalized text (lowercase, collapsed
    * whitespace). Portable across engines — DuckDB md5() agrees. */
  def fingerprint(text: Column): Column =
    F.md5(F.trim(F.regexp_replace(F.lower(text), "\\s+", " ")).cast("binary"))

  // --- quality scoring -------------------------------------------------------

  /** Ratio of alphabetic characters. */
  def alphaRatio(text: Column): Column = {
    val len = F.length(text)
    F.when(len === 0, 0.0)
      .otherwise(F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("double") / len)
  }

  /** English stopwords used for stopword-ratio and language ID. Fixed,
    * deterministic list — must match the SQL oracle verbatim. */
  val enStopwords: Seq[String] =
    Seq("the", "and", "of", "to", "in", "is", "it", "a", "that", "for", "on", "with", "as")
  val deStopwords: Seq[String] =
    Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit", "von", "auf")
  val frStopwords: Seq[String] =
    Seq("le", "la", "les", "et", "est", "un", "une", "de", "du", "pour", "dans", "que")
  val esStopwords: Seq[String] =
    Seq("el", "la", "los", "las", "y", "es", "un", "una", "de", "del", "para", "en")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val n = F.size(toks)
    F.when(n === 0, 0.0).otherwise(
      F.size(F.filter(toks, t => t.isin(enStopwords: _*))).cast("double") / n)
  }

  /** Mean token length. */
  def meanWordLength(text: Column): Column = {
    val toks = tokens(text)
    val n = F.size(toks)
    F.when(n === 0, 0.0).otherwise(
      F.aggregate(toks, F.lit(0L), (acc, w) => acc + F.length(w)).cast("double") / n)
  }

  /** Composite quality score in [0,1] — weighted blend of length,
    * alpha-ratio, stopword presence and word-length sanity. Deterministic
    * and SQL-replicable. */
  def qualityScore(text: Column): Column = {
    val lengthScore = F.least(F.length(text).cast("double") / 500.0, F.lit(1.0))
    val alpha = alphaRatio(text)
    val stop = F.least(stopwordRatio(text) * 4.0, F.lit(1.0))
    val mwl = meanWordLength(text)
    val wordLenScore =
      F.when(mwl.between(3.0, 10.0), 1.0).otherwise(0.5)
    F.round(lengthScore * 0.3 + alpha * 0.3 + stop * 0.2 + wordLenScore * 0.2, 4)
  }

  // --- corpus cleaning -------------------------------------------------------

  /** PII patterns shared with the SQL oracle VERBATIM — deterministic regex
    * redaction of emails, international-ish phone numbers, and IPv4
    * addresses (the standard pre-training scrub; engine-portable, no UDF). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+?\\d{1,3}[-. ]?\\(?\\d{2,4}\\)?[-. ]?\\d{3,4}[-. ]?\\d{3,4}"
  val ipv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Redact emails/phones/IPv4s with typed placeholders. Order matters:
    * emails first (their local part can look like a phone run), then IPs
    * (dotted digits would otherwise half-match the phone pattern), then
    * phones. */
  def redactPii(text: Column): Column = {
    val noEmail = F.regexp_replace(text, emailPattern, "<EMAIL>")
    val noIp = F.regexp_replace(noEmail, ipv4Pattern, "<IP>")
    F.regexp_replace(noIp, phonePattern, "<PHONE>")
  }

  /** Strip HTML/XML markup: script and style blocks wholesale, then tags,
    * then common entities, then whitespace collapse. A regex approximation
    * by design — real DOM parsing needs a decode kernel; this is the
    * deterministic, SQL-replicable cleaning pass that covers web-scrape
    * boilerplate. */
  def stripHtml(text: Column): Column = {
    // one pass PER tag: the single-alternation form `<(script|style)…>.*?
    // </(script|style)>` let a lazy match close a <script> block at a
    // `</style>` inside its body, leaking script text into the cleaned
    // output. Two backreference-free passes keep the DuckDB oracle (RE2,
    // no backreferences) byte-identical.
    val noScript = F.regexp_replace(text, "(?is)<script[^>]*>.*?</script>", " ")
    val noBlocks = F.regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = F.regexp_replace(noBlocks, "<[^>]+>", " ")
    val noEntities = F.regexp_replace(noTags,
      "&(amp|lt|gt|quot|nbsp|#\\d+);", " ")
    F.trim(F.regexp_replace(noEntities, "\\s+", " "))
  }

  // --- repetition filters (Gopher-style quality rules) ----------------------

  /** Non-empty trimmed lines of a document. */
  def lines(text: Column): Column =
    F.filter(F.transform(F.split(text, "\n"), l => F.trim(l)),
      l => F.length(l) > 0)

  /** Fraction of lines that are duplicates of an earlier line
    * (Gopher/MassiveText `duplicate line fraction`; high values mark
    * boilerplate-heavy scrapes). 0.0 for documents with no lines. */
  def duplicateLineFraction(text: Column): Column = {
    val ls = lines(text)
    val n = F.size(ls)
    F.when(n === 0, F.lit(0.0))
      .otherwise((n - F.size(F.array_distinct(ls))).cast("double") / n)
  }

  /** Fraction of CHARACTERS inside repeated lines (the companion
    * MassiveText rule: long duplicated paragraphs weigh more than short
    * duplicated separators). Characters of every occurrence beyond the
    * first count as duplicated. */
  def duplicateLineCharFraction(text: Column): Column = {
    val ls = lines(text)
    val total = F.aggregate(ls, F.lit(0L), (acc, l) => acc + F.length(l))
    val distinctChars = F.aggregate(F.array_distinct(ls), F.lit(0L),
      (acc, l) => acc + F.length(l))
    F.when(total === 0, F.lit(0.0))
      .otherwise((total - distinctChars).cast("double") / total)
  }

  /** Fraction of tokens inside the single most-frequent token (Gopher's
    * `top 1-gram fraction`): prose scores low, keyword-stuffed or
    * generator-degenerate text scores high. */
  def topTokenFraction(text: Column): Column = {
    val toks = tokens(text)
    val n = F.size(toks)
    // longest equal-run over the SORTED token array — one O(n log n) pass.
    // The previous distinct×filter form was O(n_distinct · n) in
    // interpreted HOFs: ~750M comparisons for one 50k-token web page.
    val topCount = F.aggregate(
      F.array_sort(toks),
      F.struct(F.lit("").as("prev"), F.lit(0L).as("run"), F.lit(0L).as("best")),
      (acc, x) => {
        val run = F.when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(F.lit(1L))
        F.struct(x.as("prev"), run.as("run"),
          F.greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    F.when(n === 0, F.lit(0.0)).otherwise(topCount.cast("double") / n)
  }

  // --- C4-style cleaning rules (Raffel et al. 2020, §2.2) --------------------

  /** Sentence count: non-empty spans between terminal punctuation. */
  def sentenceCount(text: Column): Column =
    F.size(F.filter(F.split(text, "[.!?]"), s => F.length(F.trim(s)) > 0))

  /** Fraction of lines ending in terminal punctuation (C4 keeps only such
    * lines; the fraction is the per-doc diagnostic). 0.0 for empty docs. */
  def terminalPunctLineFraction(text: Column): Column = {
    val ls = lines(text)
    val n = F.size(ls)
    F.when(n === 0, F.lit(0.0)).otherwise(
      F.size(F.filter(ls, l => l.rlike("[.!?\"']$"))).cast("double") / n)
  }

  /** C4 line cleaning: keep lines that end in terminal punctuation, have at
    * least `minWords` words, and carry no javascript/cookie/policy
    * boilerplate; surviving lines re-join with newlines. Pure column
    * expressions — applies in the scan projection, no UDF, no shuffle. */
  def c4CleanLines(text: Column, minWords: Int = 5): Column =
    F.array_join(
      F.filter(lines(text), l =>
        l.rlike("[.!?\"']$") &&
          F.size(F.split(l, "\\s+")) >= minWords &&
          !F.lower(l).rlike("javascript|cookie policy|privacy policy|terms of use|uses cookies")),
      "\n")

  /** C4 page filter: at least 3 sentences, no "lorem ipsum", no curly brace
    * (code markers). Returns a boolean keep flag. */
  def c4PageKeep(text: Column): Column =
    sentenceCount(text) >= 3 &&
      !F.lower(text).contains("lorem ipsum") &&
      !text.contains("{")

  // --- language identification ----------------------------------------------

  /** Stopword-overlap language ID over {en, de, fr, es}; deterministic
    * tiebreak by score then language code. Returns the language code. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    def score(words: Seq[String]): Column =
      F.size(F.filter(toks, t => t.isin(words: _*)))
    val scored = F.array(
      F.struct(score(enStopwords).as("score"), F.lit("en").as("lang")),
      F.struct(score(deStopwords).as("score"), F.lit("de").as("lang")),
      F.struct(score(frStopwords).as("score"), F.lit("fr").as("lang")),
      F.struct(score(esStopwords).as("score"), F.lit("es").as("lang"))
    )
    // max by (score, lang) — struct ordering is lexicographic; ties broken by
    // the lang code itself so the result is total and deterministic. ZERO
    // hits across all four stopword lists means "no evidence", not the
    // max-lang-code ('fr') — Italian/Japanese/stopword-free text is 'und';
    // NULL text likewise (it has no tokens to score)
    F.when(text.isNull || F.size(toks) === 0, F.lit("und"))
      .when(F.array_max(scored).getField("score") === 0, F.lit("und"))
      .otherwise(F.array_max(scored).getField("lang"))
  }

  // --- shingles (for dedup) ---------------------------------------------------

  /** Word n-gram shingles as strings: n consecutive tokens joined by a space.
    * Distinct set — dedup semantics use set Jaccard. */
  // NOTE: the former wordShingles/charShingles/shingleHashes Column
  // helpers were REMOVED: no operator used them, and their xxhash64-of-
  // string hash family was incompatible with the engine's canonical
  // shingle kernel (TextHashExpressions.shingleHashes64, FNV-1a + mix) —
  // a future caller mixing the two families would get zero overlap with
  // no error. All shingling goes through the one native kernel.
}
