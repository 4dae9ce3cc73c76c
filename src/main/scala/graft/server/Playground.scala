package graft.server

/** Playground page served at `/playground` — the counterpart of the
  * reference's wvlet-ui-playground module (PlaygroundUI.scala: Monaco
  * QueryEditor + QueryNavigator of demo query sets + a LIVE SQLPreview
  * that recompiles on every edit + QueryResultViewer over an embedded
  * engine). Same WHAT, Spark-first HOW: one embedded dependency-free HTML
  * page over the server's public JSON API — the demo set navigates on the
  * left, the editor recompiles to the selected dialect as you type
  * (debounced POST /api/v1/to_sql, the playground's signature behavior vs
  * the console's on-demand button), and run executes on the server's
  * Spark session (POST /api/v1/query, row-limited like the reference's
  * 40-row viewer). The console workbench at `/` stays the day-to-day
  * surface; this page is the teaching/demo surface.
  */
object Playground {

  /** Demo query set (reference DemoQuerySet.scala: one teaching query per
    * language feature, tpch-flavored). Authored for THIS dialect over the
    * driver testdata tables; each entry must compile AND run. */
  val demos: Seq[(String, String)] = Seq(
    "00_sample" ->
      """-- scan a table, filter, group, aggregate, sort
        |from lineitem
        |where l_quantity > 0.0
        |group by l_returnflag, l_linestatus
        |agg
        |  sum_qty = l_quantity.sum,
        |  sum_ext_price = l_extendedprice.sum
        |order by sum_qty desc""".stripMargin,
    "add_column" ->
      """from lineitem
        |-- add a computed column (keeps every existing column)
        |add price = l_extendedprice - l_discount
        |select l_orderkey, price
        |limit 10""".stripMargin,
    "agg_dot_notation" ->
      """from lineitem
        |group by l_returnflag, l_linestatus
        |agg
        |  -- _ refers to the current group
        |  cnt = _.count,
        |  sum_qty = l_quantity.sum,
        |  avg_price = l_extendedprice.avg
        |order by sum_qty desc""".stripMargin,
    "case_expression" ->
      """from lineitem
        |group by l_returnflag
        |agg cnt = _.count
        |add return_code = case l_returnflag
        |  when 'A' then 1
        |  when 'R' then 2
        |  when 'N' then 3
        |  else 0
        |end
        |order by return_code""".stripMargin,
    "column_ops" ->
      """from lineitem
        |add ship_label = l_returnflag + ':' + l_linestatus
        |-- drop columns without naming the ones you keep
        |exclude l_tax, l_discount
        |limit 10""".stripMargin,
    "values_and_concat" ->
      """from [
        |  [1, 'apple', 100],
        |  [2, 'banana', 50],
        |] as fruit(id, name, price)
        |concat {
        |  from [[3, 'coconut', 120]] as fruit(id, name, price)
        |}
        |order by id""".stripMargin,
    "join" ->
      """from orders
        |join customer on o_custkey = c_custkey
        |group by c_mktsegment
        |agg n_orders = _.count, total = o_totalprice.sum.round(2)
        |order by total desc""".stripMargin,
    "join_asof" ->
      """-- asof join: most recent stock price at or before each holding date
        |from [
        |  ['AAPL', '2024-11-08', 2.0],
        |  ['AAPL', '2024-11-10', 4.0],
        |] as holding(symbol, date, shares)
        |asof join {
        |  from [
        |    ['AAPL', '2024-11-07', 10],
        |    ['AAPL', '2024-11-09', 100],
        |  ] as stock(symbol, date, price)
        |} as stock
        |on stock.symbol = holding.symbol and stock.date <= holding.date
        |add holding_value = stock.price * holding.shares
        |select symbol, date, shares, price, holding_value
        |order by date""".stripMargin,
    "pivot" ->
      """from orders
        |select o_orderpriority, o_orderstatus, o_totalprice
        |pivot on o_orderstatus in ('O', 'F', 'P') using total = o_totalprice.sum.round(2)
        |order by o_orderpriority""".stripMargin,
    "unnest" ->
      """from part
        |where p_partkey <= 10
        |select p_partkey, words = p_name.split(' ')
        |cross join unnest(words) with ordinality as t(w)
        |order by p_partkey, w_ordinal""".stripMargin,
    "window" ->
      """from lineitem
        |where l_orderkey <= 50
        |select l_orderkey, l_linenumber,
        |  rn = row_number() over (partition by l_orderkey order by l_linenumber),
        |  running = l_quantity.sum over (partition by l_orderkey order by l_linenumber rows[,0])
        |order by l_orderkey, l_linenumber""".stripMargin,
    "model" ->
      """-- models are reusable named queries (compile to CTEs)
        |model big_orders = {
        |  from orders
        |  where o_totalprice > 100000
        |}
        |from big_orders
        |group by o_orderpriority
        |agg n = _.count
        |order by o_orderpriority""".stripMargin,
    "tpch_q1" ->
      """-- TPC-H Q1 pricing summary in this dialect
        |from lineitem
        |where l_shipdate <= '1998-09-02'
        |group by l_returnflag, l_linestatus
        |agg
        |  sum_qty = l_quantity.sum,
        |  sum_base_price = l_extendedprice.sum,
        |  avg_disc = l_discount.avg.round(4),
        |  count_order = _.count
        |order by l_returnflag, l_linestatus""".stripMargin,
    // --- the LLM-pipeline operator surface (table functions; these have
    // no SQL spelling, so the dialect preview refuses loudly — the run
    // path executes the native Spark operators) ---
    "llm_similarity_topk" ->
      """-- approximate-nearest-neighbor: cosine top-3 per embedding
        |-- (methods: brute | lsh | ivf | int8 | persisted-index variants)
        |from similarity_topk('embeddings', 'vec_id', 'embedding', 3, 'brute')
        |where query_id < 5
        |select query_id, corpus_id, cos_sim, rank
        |order by query_id, rank""".stripMargin,
    "llm_split_by_cluster" ->
      """-- leakage-safe train/test split: near-duplicate clusters land
        |-- whole in one split, so eval text can't leak into train.
        |-- split_by_cluster_stats(...) shows cluster sizes before you
        |-- trust a split; split_by_cluster_pairs(...) reuses pairs the
        |-- pipeline already verified.
        |from split_by_cluster('documents', 'doc_id', 'text', 0.8)
        |group by split
        |agg docs = _.count
        |order by split""".stripMargin,
    "llm_dedup_semantic" ->
      """-- SemDeDup: drop all but one representative of each semantic
        |-- near-duplicate cluster (seeded centroids, within-bucket cosine)
        |from dedup_semantic('embeddings', 'vec_id', 'embedding', 8, 0.95)
        |group by label
        |agg kept = _.count
        |order by label""".stripMargin,
    "llm_dedup_bloom" ->
      """-- bloom-pruned EXACT dedup (the Dolma recipe): a "seen-twice"
        |-- bloom routes unique docs around the shuffle; only bloom hits
        |-- go through the exact recheck. Same rows as exact dedup.
        |from dedup_bloom('documents', 'doc_id', 'text', 0.01)
        |group by dup_count
        |agg groups = _.count
        |order by dup_count""".stripMargin,
    "llm_perplexity_score" ->
      """-- CCNet-style quality filter: fit a unigram LM on the corpus
        |-- itself, score each doc by mean token negative-log-likelihood.
        |-- High avg_nll = rare-token garble; low = boilerplate soup —
        |-- the standard pipeline move is a two-sided cut.
        |from perplexity_score('documents', 'doc_id', 'text')
        |order by avg_nll desc
        |limit 10""".stripMargin,
    "llm_perplexity_bigram" ->
      """-- context-aware v2 of the perplexity filter: Stupid Backoff
        |-- bigram LM (pruned at min_count=2 — hapax bigrams back off to
        |-- alpha*unigram). Catches common-token WORD SALAD the unigram
        |-- score cannot see: same words, improbable order.
        |from perplexity_score_bigram('documents', 'doc_id', 'text', 0.4, 2)
        |order by avg_nll desc
        |limit 10""".stripMargin,
    "llm_token_budget" ->
      """-- "cut the corpus to N training tokens": keep the md5-ordered
        |-- prefix whose cumulative token count fits the budget —
        |-- deterministic across runs AND engines (distributed prefix-sum,
        |-- no single-partition stage)
        |from select_token_budget('documents', 'doc_id', 'text', 15000)
        |agg docs_kept = _.count, tokens_kept = n_tokens.sum""".stripMargin,
    "llm_contamination_report" ->
      """-- benchmark-contamination audit (the transpose of
        |-- decontamination): for each eval doc, how many corpus docs
        |-- share a 4-token n-gram with it, and how many n-grams leak
        |model trainset = { from documents where doc_id >= 3 }
        |model evalset = { from documents where doc_id < 3 }
        |from contamination_report('trainset', 'evalset', 'doc_id', 'text', 4)
        |order by doc_id""".stripMargin,
    "llm_token_budget_quality" ->
      """-- the QUALITY-FIRST budget cut: keep the highest-scoring docs
        |-- that fit N training tokens (a random prefix burns budget on
        |-- low-quality text). Any numeric column orders the cut.
        |model scored = {
        |  from documents
        |  select doc_id, text, quality = text.length
        |}
        |from select_token_budget_by('scored', 'doc_id', 'text', 15000, 'quality')
        |agg docs_kept = _.count, tokens_kept = n_tokens.sum""".stripMargin,
    "llm_contamination_semantic" ->
      """-- embedding-space contamination audit (paraphrase-robust twin of
        |-- the n-gram report): per eval vector, how many corpus vectors
        |-- sit within the cosine threshold — zeros kept, "this benchmark
        |-- item is clean" is the point
        |model evalvecs = { from embeddings where vec_id % 4 = 0 }
        |model corpusvecs = { from embeddings where vec_id % 4 != 0 }
        |from contamination_report_semantic('corpusvecs', 'evalvecs', 'vec_id', 'embedding', 0.35)
        |order by leaking_docs desc, vec_id
        |limit 10""".stripMargin,
    "llm_mix_temperature" ->
      """-- GPT-3/PaLM-style temperature mixing: re-balance domains toward
        |-- share^alpha (alpha<1 upsamples rare languages/domains,
        |-- shrinks dominant ones) — deterministic across runs AND engines
        |from mix_by_temperature('documents', 'lang', 'doc_id', 0.5)
        |group by lang
        |agg docs = _.count
        |order by lang""".stripMargin,
    "llm_vocab_profile" ->
      """-- one-row Zipf health check before committing to tokenizer /
        |-- filter settings: top-100 coverage near 1 = boilerplate soup,
        |-- hapax share near 1 = OCR garble
        |from vocab_profile('documents', 'text', 100)""".stripMargin,
    "llm_bpe_train" ->
      """-- learn BPE merges from the corpus itself: ONE scan to the
        |-- word-frequency table, then the exact merge loop runs over that
        |-- bounded table (the sentencepiece/HF trainer shape). The learned
        |-- vocab feeds bpe_count / select_token_budget / pack_sequences.
        |from bpe_train('documents', 'text', 20)
        |order by rank""".stripMargin,
    "llm_bpe_stats" ->
      """-- tokenizer-fitness report: does this vocab FIT this corpus?
        |-- bpe_coverage = byte fraction the vocab natively spells;
        |-- fallback_bytes = OOV mass; fertility = BPE tokens per word
        |-- (>=2 means your token budget buys half the text you think)
        |model my_vocab = {
        |  from build_vocab('documents', 'text', 500)
        |}
        |from bpe_stats('documents', 'text', 'my_vocab')
        |agg docs = _.count, bytes = n_bytes.sum,
        |    oov_bytes = fallback_bytes.sum, bpe_tokens = n_bpe_tokens.sum""".stripMargin,
    "llm_bpe_merge_replay" ->
      """-- TRUE rank-ordered BPE inference: learn merges from the corpus,
        |-- then count by replaying them in rank order (the HF/sentencepiece
        |-- encode). Greedy bpe_count approximates this from the vocab
        |-- alone; they diverge where maximal munch blocks a lower-rank merge.
        |model my_merges = {
        |  from bpe_train('documents', 'text', 50)
        |}
        |from bpe_count_merges('documents', 'text', 'my_merges')
        |agg docs = _.count, merge_tokens = n_bpe_merge_tokens.sum""".stripMargin,
    "llm_bpe_encode" ->
      """-- the actual TOKENIZE step: learn merges, then emit each doc's
        |-- final symbol sequence (rank-ordered merge replay — what ships
        |-- to training). size(bpe_tokens) == bpe_count_merges' count.
        |model my_merges = {
        |  from bpe_train('documents', 'text', 50)
        |}
        |from bpe_encode('documents', 'doc_id', 'text', 'my_merges')
        |select doc_id, n_bpe_tokens, bpe_tokens
        |order by doc_id
        |limit 10""".stripMargin,
    "llm_bm25" ->
      """-- Okapi BM25 retrieval: the k corpus docs most lexically relevant
        |-- to each query/eval doc — the retrieval-based contamination and
        |-- data-selection net between n-gram overlap and embeddings.
        |model evalset = {
        |  from documents
        |  where doc_id < 3
        |}
        |from bm25_topk('documents', 'doc_id', 'text', 'evalset', 5)
        |order by query_id, rank""".stripMargin,
    "llm_keywords" ->
      """-- per-doc tf-idf keywords: a template token that appears in
        |-- every doc scores ln(N/N) = 0, so each doc's DISTINCTIVE terms
        |-- float to the top — labeling and boilerplate-spotting in one.
        |from keywords_tfidf('documents', 'doc_id', 'text', 3)
        |where doc_id < 5
        |order by doc_id, rank""".stripMargin,
    "llm_bpe_count" ->
      """-- count in TOKENIZER tokens, not words: byte-level greedy
        |-- longest-match against a vocab relation (single-byte fallback
        |-- makes it total). Build the vocab FROM the corpus with
        |-- build_vocab(...); also the optional budget unit of
        |-- select_token_budget(..., 'vocab') and pack_sequences.
        |model my_vocab = {
        |  from build_vocab('documents', 'text', 500)
        |}
        |from bpe_count('documents', 'text', 'my_vocab')
        |agg docs = _.count, bpe_tokens = n_bpe_tokens.sum""".stripMargin,
    "llm_ann_pq" ->
      """-- product-quantization ANN: vectors stored as small subspace
        |-- CODES (a ~21x byte cut), ranked by O(m) table lookups instead
        |-- of float math. 'pq' = seeded teaching codebook (bitwise
        |-- oracle-friendly); 'pq_trained' = per-subspace k-means PQ32x8
        |-- (recall@5 ~0.9 vs ~0.4); 'ivf_pq' / 'ivf_pq_trained' compose
        |-- coarse cells (candidate cut) with PQ (byte cut) — FAISS's
        |-- workhorse. Persist with ann_pq_index(...), serve float-free
        |-- with similarity_topk('<path>', ..., 'pq_index').
        |from similarity_topk('embeddings', 'vec_id', 'embedding', 3, 'pq_trained')
        |where query_id < 5
        |order by query_id, rank""".stripMargin,
    "llm_perplexity_kn" ->
      """-- Kneser-Ney smoothing: the QUALITY-reference bigram LM next to
        |-- web-scale Stupid Backoff. Discounted bigram hits interpolate
        |-- with CONTINUATION probability — "Francisco" is frequent but
        |-- follows almost nothing, so KN scores it low outside "San _".
        |from perplexity_score_bigram('documents', 'doc_id', 'text', 'kn', 0.75, 2)
        |order by avg_nll desc
        |limit 10""".stripMargin,
    "llm_quality_classifier" ->
      """-- the GPT-3/LLaMA-style quality classifier (the third net after
        |-- heuristics and perplexity): logistic regression over hashed
        |-- token features, trained on reference-vs-boilerplate seed sets,
        |-- scored over the whole corpus in one pass.
        |model good_docs = {
        |  from [[1, 'careful natural prose about science and history']] as p(doc_id, text)
        |}
        |model boiler_docs = {
        |  from [[2, 'click here subscribe buy now free deals']] as n(doc_id, text)
        |}
        |from quality_classifier_score('documents', 'doc_id', 'text',
        |  'good_docs', 'boiler_docs')
        |order by quality_prob desc
        |limit 10""".stripMargin,
    "llm_prototypicality" ->
      """-- SSL-prototypes data pruning (Sorscher et al. 2022): score each
        |-- embedding by cosine to its own cluster prototype. High =
        |-- prototypical/easy, low = hard/outlier; prune easy examples when
        |-- data is abundant, hard ones when scarce.
        |from prototypicality_score('embeddings', 'vec_id', 'embedding', 32)
        |order by proto_cos
        |limit 10""".stripMargin,
    "llm_dsir" ->
      """-- DSIR (Xie et al. 2023): importance weight = how much a doc
        |-- looks like the TARGET distribution, from hashed-unigram models
        |-- fit on target vs raw corpus. Feed the column to
        |-- select_token_budget_by for the principled budget cut.
        |model reference_docs = { from documents where doc_id < 50 }
        |from dsir_weight('documents', 'doc_id', 'text', 'reference_docs')
        |order by dsir_weight desc
        |limit 10""".stripMargin,
    "llm_dsir_sample" ->
      """-- DSIR's actual selection step: Gumbel-top-k importance
        |-- resampling — keep k docs with probability proportional to
        |-- exp(dsir_weight), deterministic via seeded portable noise.
        |model reference_docs = { from documents where doc_id < 50 }
        |from dsir_sample('documents', 'doc_id', 'text', 'reference_docs', 10)
        |order by sample_key desc""".stripMargin,
    "llm_top_ngrams" ->
      """-- boilerplate-template discovery (the C4/Gopher corpus
        |-- analyses): the most frequent n-grams ARE the templates — feed
        |-- offenders back as filter patterns or dedup keys.
        |from top_ngrams('documents', 'text', 3, 15)
        |order by rank""".stripMargin,
    "llm_bpe_gpt2" ->
      """-- GPT-2 pre-tokenization mode: contractions split ('t), letter
        |-- runs keep one leading space, punctuation runs group, case kept
        |-- — trained vocabs match what HF byte-level tokenizers learn,
        |-- vs the lowercased [a-z0-9]+ word stream.
        |model gpt2_merges = {
        |  from bpe_train('documents', 'text', 30, 1048576, 'gpt2')
        |}
        |from gpt2_merges
        |order by rank""".stripMargin,
  )

  /** Demos whose table functions have no SQL spelling: the dialect preview
    * must refuse loudly (400 + compile error), never emit wrong SQL; the
    * run path executes them natively. ServerSpec gates both behaviors. */
  val sqlRefusingDemos: Set[String] =
    Set("join_asof", "llm_similarity_topk", "llm_split_by_cluster", "llm_dedup_semantic",
      "llm_dedup_bloom",
      "llm_perplexity_score", "llm_perplexity_bigram", "llm_token_budget",
      "llm_contamination_report", "llm_contamination_semantic", "llm_mix_temperature",
      "llm_token_budget_quality",
      "llm_vocab_profile", "llm_bpe_count", "llm_bpe_stats", "llm_bpe_train",
      "llm_bpe_merge_replay", "llm_bpe_encode", "llm_bm25", "llm_keywords",
      "llm_ann_pq", "llm_perplexity_kn",
      "llm_quality_classifier", "llm_bpe_gpt2", "llm_prototypicality", "llm_dsir",
      "llm_dsir_sample", "llm_top_ngrams")

  private def jsStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => ""
      case '<' => "\\u003c" // never form "</script>" inside the embed
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def demosJson: String =
    demos.map { case (n, q) => s"{name:${jsStr(n)},query:${jsStr(q)}}" }
      .mkString("[", ",", "]")

  def page: String =
    s"""<!doctype html>
<html>
<head>
<meta charset="utf-8">
<title>graft playground</title>
<style>
  body { font-family: ui-monospace, SFMono-Regular, Menlo, monospace;
         margin: 1.25rem auto; max-width: 100rem; padding: 0 1rem; color: #1a1a1a; }
  h1 { font-size: 1.1rem; margin: 0 0 .75rem; }
  h1 a { font-weight: normal; font-size: .8rem; margin-left: 1rem; }
  .layout { display: flex; gap: 1rem; align-items: flex-start; }
  #nav { flex: 0 0 11rem; border: 1px solid #ddd; border-radius: 4px;
         padding: .5rem; font-size: .8rem; max-height: 82vh; overflow: auto; }
  #nav h2 { font-size: .85rem; margin: .2rem 0 .4rem; color: #555; }
  #nav .demo { cursor: pointer; padding: .15rem .3rem; border-radius: 3px; }
  #nav .demo:hover { background: #f0f4ff; }
  #nav .demo.sel { background: #e3ecff; font-weight: 600; }
  main { flex: 1 1 auto; min-width: 0; display: flex; gap: 1rem; }
  .col { flex: 1 1 50%; min-width: 0; }
  .editor { position: relative; width: 100%; height: 22rem; }
  .editor textarea, .editor pre {
    position: absolute; inset: 0; margin: 0; font: inherit; font-size: .95rem;
    line-height: 1.35; padding: .5rem; box-sizing: border-box;
    white-space: pre-wrap; word-break: break-word; overflow: auto;
    border: 1px solid #bbb; border-radius: 4px; }
  .editor pre { pointer-events: none; background: #fff; color: #1a1a1a; }
  .editor textarea { background: transparent; color: transparent;
    caret-color: #1a1a1a; resize: none; z-index: 1; border-color: transparent; }
  #sqlprev { height: 22rem; overflow: auto; border: 1px solid #ddd;
             border-radius: 4px; padding: .5rem; background: #fafafa;
             white-space: pre-wrap; font-size: .9rem; box-sizing: border-box; }
  #sqlprev.err { color: #b00020; }
  .tk-kw  { color: #0550ae; font-weight: 600; }
  .tk-str { color: #0a7a36; }
  .tk-num { color: #953800; }
  .tk-com { color: #8a8a8a; font-style: italic; }
  .tk-op  { color: #8250df; }
  .tk-ty  { color: #7a5200; }
  button, select { font: inherit; padding: .3rem .8rem; margin: .5rem .5rem 0 0;
           border: 1px solid #888; border-radius: 4px; background: #f4f4f4;
           cursor: pointer; }
  button:hover { background: #e8e8e8; }
  #status { margin: .6rem 0; color: #555; }
  #status.err { color: #b00020; white-space: pre-wrap; }
  table { border-collapse: collapse; margin-top: .4rem; font-size: .85rem; }
  th, td { border: 1px solid #ccc; padding: .2rem .55rem; text-align: left; }
  th { background: #f0f0f0; }
  .dim { color: #777; font-size: .8rem; }
</style>
</head>
<body>
<h1>graft playground <a href="/">console &rarr;</a>
<a href="/operators">operator reference &rarr;</a></h1>
<div class="layout">
<nav id="nav"><h2>examples</h2><div id="demos"></div></nav>
<main>
<div class="col">
  <div class="editor">
    <pre id="hl" aria-hidden="true"></pre>
    <textarea id="q" spellcheck="false"></textarea>
  </div>
  <div>
    <button onclick="run()">run</button>
    <select id="dialect" onchange="preview()">
      <option>spark</option><option>duckdb</option><option>trino</option><option>hive</option>
    </select>
    <span class="dim">SQL preview recompiles as you type</span>
  </div>
  <div id="status"></div>
  <div id="out"></div>
</div>
<div class="col">
  <div id="sqlprev">(compiled SQL appears here)</div>
</div>
</main>
</div>
<script>
const $$ = id => document.getElementById(id);
const DEMOS = ${demosJson};

// --- inline highlighter (prismjs-graft token rules, same as the console) ---
const KW = new Set(('def model type val flow stage package import export native inline extends ' +
  'create alter insert update upsert merge delete truncate save append overwrite into use ' +
  'explain prepare execute call show describe run schema table catalog from select where ' +
  'group having order limit offset agg transform add prepend exclude rename shift pivot ' +
  'unpivot sample distinct dedup count concat intersect except union all unnest lateral by as ' +
  'join left right full inner cross semi anti asof on using natural over partition rows range ' +
  'unbounded preceding following current row grouping sets rollup cube filter subscribe ' +
  'watermark incremental incrementalize window route fork depends wait until activate end ' +
  'and or not is in like rlike between exists contains case when then else if cast extract ' +
  'interval at time zone for with to of test should be contain debug true false null').split(' '));
const TY = new Set(('boolean byte short int long float double decimal string char date ' +
  'timestamp array map struct binary json sql asc desc nulls first last').split(' '));
const TOKEN_RE = /(---[\\s\\S]*?(?:---|$$))|(--[^\\n]*)|("{3}[\\s\\S]*?(?:"{3}|$$)|"(?:\\\\.|[^"\\\\\\n])*"?|'(?:\\\\.|[^'\\\\\\n])*'?|`[^`\\n]*`?)|(\\b0[xX][0-9a-fA-F_]+\\b|\\b\\d[\\d_]*(?:\\.\\d+)?\\b)|(->|<-|=>|!=|<=|>=|[|<>=+*\\/%])|([A-Za-z_][A-Za-z0-9_]*)/g;
function esc(s) {
  return s.replace(/&/g, '&amp;').replace(/</g, '&lt;').replace(/>/g, '&gt;');
}
function highlight(src) {
  let out = '', last = 0, m;
  TOKEN_RE.lastIndex = 0;
  while ((m = TOKEN_RE.exec(src))) {
    out += esc(src.slice(last, m.index));
    const t = m[0];
    const cls = m[1] || m[2] ? 'tk-com' : m[3] ? 'tk-str' : m[4] ? 'tk-num'
      : m[5] ? 'tk-op'
      : KW.has(t) ? 'tk-kw' : TY.has(t) ? 'tk-ty'
      : /^[A-Z]/.test(t) ? 'tk-ty' : null;
    out += cls ? '<span class="' + cls + '">' + esc(t) + '</span>' : esc(t);
    last = m.index + t.length;
  }
  return out + esc(src.slice(last)) + '\\n';
}
function sync() {
  $$('hl').innerHTML = highlight($$('q').value);
  $$('hl').scrollTop = $$('q').scrollTop;
  $$('hl').scrollLeft = $$('q').scrollLeft;
}

async function post(path, body) {
  const r = await fetch(path, { method: 'POST', body: JSON.stringify(body) });
  return await r.json();
}

// --- demo navigator (reference QueryNavigator) ---
let selected = -1;
function renderDemos() {
  const box = $$('demos'); box.innerHTML = '';
  DEMOS.forEach((d, i) => {
    const el = document.createElement('div');
    el.className = 'demo' + (i === selected ? ' sel' : '');
    el.textContent = d.name;
    el.onclick = () => loadDemo(i);
    box.appendChild(el);
  });
}
function loadDemo(i) {
  selected = i;
  $$('q').value = DEMOS[i].query;
  $$('out').innerHTML = ''; $$('status').textContent = '';
  sync(); renderDemos(); preview();
}

// --- live SQL preview (reference SQLPreview: recompile on every edit) ---
let previewTimer = null, previewSeq = 0;
async function preview() {
  const seq = ++previewSeq;
  const resp = await post('/api/v1/to_sql',
    { query: $$('q').value, target: $$('dialect').value });
  if (seq !== previewSeq) return; // a newer edit superseded this compile
  const box = $$('sqlprev');
  if (resp.sql) { box.className = ''; box.textContent = '-- ' + $$('dialect').value + '\\n' + resp.sql; }
  else { box.className = 'err'; box.textContent = 'compile error:\\n' + (resp.error || 'failed'); }
}
function schedulePreview() {
  if (previewTimer) clearTimeout(previewTimer);
  previewTimer = setTimeout(preview, 350);
}
$$('q').addEventListener('input', () => { sync(); schedulePreview(); });
$$('q').addEventListener('scroll', sync);

// --- run + result viewer (reference QueryResultViewer, 40-row limit) ---
function setStatus(msg, err) {
  const s = $$('status'); s.textContent = msg; s.className = err ? 'err' : '';
}
async function run() {
  $$('out').innerHTML = '';
  setStatus('running…');
  const sub = await post('/api/v1/query', { query: $$('q').value, maxRows: 40 });
  if (!sub.queryId) { setStatus(sub.error || 'submit failed', true); return; }
  let info;
  for (;;) {
    info = await (await fetch('/api/v1/query/' + sub.queryId)).json();
    if (info.status !== 'running') break;
    await new Promise(res => setTimeout(res, 250));
  }
  if (info.status === 'failed') { setStatus(info.error, true); return; }
  setStatus('finished — ' + info.totalRows + ' row(s)' +
            (info.truncated ? ' (showing first 40)' : ''));
  if (!info.schema.length) return;
  const tbl = document.createElement('table');
  const hdr = tbl.insertRow();
  info.schema.forEach(c => {
    const th = document.createElement('th');
    th.textContent = c.name + ' : ' + c.typeName;
    hdr.appendChild(th);
  });
  info.rows.forEach(r => {
    const tr = tbl.insertRow();
    r.forEach(v => { tr.insertCell().textContent = v === null ? 'null' : v; });
  });
  $$('out').appendChild(tbl);
}

renderDemos();
loadDemo(0);
</script>
</body>
</html>
"""
}
