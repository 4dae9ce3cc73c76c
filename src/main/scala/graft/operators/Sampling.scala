package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling/splitting for training-data pipelines. All three
  * operators key on md5 of a seed-prefixed id, which makes them
  * (a) reproducible across runs AND engines (md5 is bit-identical
  * everywhere, unlike rand(seed) which is engine-private), and
  * (b) shuffle-bounded: stratified sampling is one window per class
  * partition, splitting is a stateless filter, shuffling is one global
  * sort — each the plan shape that survives 100 TB.
  *
  * (The reference's `sample` operator — reservoir/system/bernoulli,
  * relation.scala Sample — covers RANDOM sampling; these are its
  * deterministic pipeline-grade complements.)
  */
object Sampling {

  private def key(seed: String, id: Column): Column =
    F.md5(F.concat(F.lit(seed), id.cast("string")))

  /** Exactly min(k, |class|) rows per class, chosen by hash order: a
    * deterministic stratified sample for class rebalancing. One shuffle
    * (the window partition); the md5 tiebreak makes the choice uniform
    * and independent of input order. */
  def stratifiedTopK(
      df: DataFrame,
      classCol: String,
      idCol: String,
      k: Int,
      seed: String = "graft"
  ): DataFrame = {
    val w = Window.partitionBy(F.col(classCol))
      .orderBy(key(seed, F.col(idCol)), F.col(idCol))
    df.withColumn("__rk", F.row_number().over(w))
      .filter(F.col("__rk") <= k)
      .drop("__rk")
  }

  /** Deterministic train/test split: a row lands in train iff the leading
    * byte pair of md5(seed||id) sorts below the threshold derived from
    * `trainFraction` (resolution 1/65536). Stateless — no shuffle, no
    * state, any worker can recompute membership; split fractions are exact
    * in expectation and fixed forever for a given (seed, id). */
  def trainTestSplit(
      df: DataFrame,
      idCol: String,
      trainFraction: Double,
      seed: String = "graft"
  ): DataFrame = {
    require(trainFraction > 0 && trainFraction < 1, "trainFraction in (0,1)")
    // clamp to 0xffff — same reason as weightedMix: 0.99999 rounds to
    // 65536, rendering the 5-char "10000" whose 4-char prefix compare
    // INVERTS the split (~94% landing in test)
    val threshold = f"${math.min(0xffff, math.round(trainFraction * 65536).toInt)}%04x"
    df.withColumn("split",
      F.when(F.substring(key(seed, F.col(idCol)), 1, 4) < F.lit(threshold), "train")
        .otherwise("test"))
  }

  /** Leakage-safe deterministic split: near-duplicate documents must land
    * in the SAME split, or held-out evaluation scores are inflated by
    * training-set text that survived doc-level splitting (the classic
    * eval-leak a plain [[trainTestSplit]] cannot prevent — two near-dups
    * hash independently). Membership is decided per CLUSTER: every member
    * of a connected component of the verified near-dup pair list inherits
    * the split of its cluster representative (the minimum member id,
    * [[Dedup.connectedComponents]]' label convention); docs in no pair are
    * their own representative. The assignment itself is the stateless
    * md5-threshold of [[trainTestSplit]] applied to the REPRESENTATIVE id,
    * so growing the corpus with non-dup docs never reshuffles existing
    * splits, and a doc later joined into a cluster moves WITH its cluster.
    *
    * Scale shape: the label table is near-dup-proportional (pairs survive
    * candidate blocking AND verification — orders of magnitude smaller
    * than the corpus at real dup rates), so the only corpus-sized work is
    * ONE left join against a frame AQE will broadcast; everything else
    * rides [[Dedup.connectedComponents]]' documented bounded paths.
    *
    * Footgun: an aggressive pair threshold can PERCOLATE the near-dup
    * graph into one giant cluster whose single assignment draw swings the
    * realized train fraction silently — check [[splitByClusterStats]]
    * (max_cluster_size, frac_delta) before trusting a split. */
  def splitByCluster(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      trainFraction: Double,
      seed: String = "graft"
  ): DataFrame = {
    // no checkpoint on the labels (optimization r19): connectedComponents
    // always returns materialized-or-local data — the driver union-find
    // path yields a LocalRelation and the iterative path's last round is
    // already checkpointed — so both consumers here (the diagnostics agg +
    // the assignment join) re-read cheap data, and the extra eager
    // localCheckpoint bought nothing but block-manager churn.
    val labels = clusterLabels(pairs, idCol)
    logSplitDiagnostics(labels, trainFraction, seed)
    assignByRep(df, idCol, labels, trainFraction, seed).drop("__rep")
  }

  /** One diagnostic line of the most recent [[splitByCluster]] invocation —
    * a spec hook mirroring the stderr log, not API. */
  @volatile private[graft] var lastSplitDiagnostics: Option[String] = None

  /** The percolation footgun, surfaced WITHOUT opting into
    * [[splitByClusterStats]]: every split logs one line of cluster-level
    * diagnostics computed from the (pair-proportional, already
    * checkpointed) label table alone — no extra corpus pass. The realized
    * train fraction of CLUSTERED docs is the concentration signal
    * (singleton docs converge to the target by independence); a
    * max_cluster_size that is a material share of clustered_docs is the
    * percolating-graph failure mode and flips the line to a WARNING. */
  private def logSplitDiagnostics(
      labels: DataFrame,
      trainFraction: Double,
      seed: String
  ): Unit = {
    val threshold = f"${math.min(0xffff, math.round(trainFraction * 65536).toInt)}%04x"
    val repTrain = F.substring(key(seed, F.col("__rep")), 1, 4) < F.lit(threshold)
    val r = labels.groupBy("__rep").agg(F.count(F.lit(1)).as("__sz"))
      .agg(
        F.count(F.lit(1)).as("n_clusters"),
        F.coalesce(F.sum("__sz"), F.lit(0L)).as("clustered_docs"),
        F.coalesce(F.max("__sz"), F.lit(0L)).as("max_cluster_size"),
        F.coalesce(F.sum(F.when(repTrain, F.col("__sz")).otherwise(0L)), F.lit(0L))
          .as("train_docs"))
      .collect().head
    val clustered = r.getAs[Long]("clustered_docs")
    val maxSz = r.getAs[Long]("max_cluster_size")
    val trainFrac =
      if (clustered == 0) trainFraction
      else r.getAs[Long]("train_docs").toDouble / clustered
    val percolating = clustered > 0 && maxSz.toDouble / clustered > 0.25 && maxSz > 1
    val line = (if (percolating) "[split_by_cluster] WARNING percolating near-dup graph — "
                else "[split_by_cluster] ") +
      f"n_clusters=${r.getAs[Long]("n_clusters")} clustered_docs=$clustered " +
      f"max_cluster_size=$maxSz clustered_train_frac=$trainFrac%.4f " +
      f"target=$trainFraction%.4f" +
      (if (percolating) " — check split_by_cluster_stats(...) and raise the pair threshold"
       else "")
    lastSplitDiagnostics = Some(line)
    System.err.println(line)
  }

  /** (idCol, __rep) label table from the verified pair list — the cluster
    * representative of every doc that appears in ≥1 pair. */
  private def clusterLabels(pairs: DataFrame, idCol: String): DataFrame =
    Dedup.connectedComponents(pairs)
      .select(F.col("id").as(idCol), F.col("cluster").as("__rep"))

  /** The split assignment, keeping the `__rep` column (callers drop or
    * aggregate it). The only corpus-sized operation is the unhinted left
    * join against the label table — AQE broadcasts it at runtime. */
  private def assignByRep(
      df: DataFrame,
      idCol: String,
      labels: DataFrame,
      trainFraction: Double,
      seed: String
  ): DataFrame = {
    require(trainFraction > 0 && trainFraction < 1, "trainFraction in (0,1)")
    val threshold = f"${math.min(0xffff, math.round(trainFraction * 65536).toInt)}%04x"
    df.join(labels, Seq(idCol), "left")
      .withColumn("__rep", F.coalesce(F.col("__rep"), F.col(idCol)))
      .withColumn("split",
        F.when(F.substring(key(seed, F.col("__rep")), 1, 4) < F.lit(threshold), "train")
          .otherwise("test"))
  }

  /** Observability companion to [[splitByCluster]] — one row of cluster and
    * assignment statistics for the SAME (df, pairs, trainFraction, seed):
    *
    *   n_docs, n_clusters, clustered_docs, max_cluster_size,
    *   train_docs, train_frac (6 dp), target_frac, frac_delta (6 dp)
    *
    * Why it exists (the percolation footgun): cluster-level assignment
    * trades per-doc independence for leakage safety, so the realized train
    * fraction concentrates on CLUSTER draws, not doc draws. An aggressive
    * pair threshold (e.g. bigram Jaccard near 0.1 over boilerplate-heavy
    * web text) can percolate the near-dup graph into one giant component —
    * then a single md5 draw moves `max_cluster_size` docs together and the
    * realized fraction can sit arbitrarily far from the target, silently.
    * A `max_cluster_size` that is a material share of `n_docs`, or a
    * `frac_delta` far from 0, is that failure mode — raise the threshold
    * (or verify pairs more strictly) until clusters are small.
    *
    * Scale shape: reuses the label table once (cluster sizes are one agg
    * over the pair-proportional labels) and the corpus-sized work is the
    * same single unhinted left join as the split itself. */
  def splitByClusterStats(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      trainFraction: Double,
      seed: String = "graft"
  ): DataFrame = {
    // same rationale as splitByCluster: the label table arrives
    // materialized-or-local from connectedComponents
    val labels = clusterLabels(pairs, idCol)
    val assigned = assignByRep(df, idCol, labels, trainFraction, seed)
    val assignStats = assigned.agg(
      F.count(F.lit(1)).as("n_docs"),
      F.count(F.when(F.col("split") === "train", 1)).as("train_docs"),
      F.round(F.count(F.when(F.col("split") === "train", 1)).cast("double") /
        F.count(F.lit(1)), 6).as("train_frac"))
    val clusterStats = labels.groupBy("__rep")
      .agg(F.count(F.lit(1)).as("__sz"))
      .agg(
        F.count(F.lit(1)).as("n_clusters"),
        F.coalesce(F.sum("__sz"), F.lit(0L)).as("clustered_docs"),
        F.coalesce(F.max("__sz"), F.lit(0L)).as("max_cluster_size"))
    assignStats.crossJoin(clusterStats)
      .withColumn("target_frac", F.lit(trainFraction))
      .withColumn("frac_delta",
        F.round(F.col("train_frac") - F.col("target_frac"), 6))
      .select("n_docs", "n_clusters", "clustered_docs", "max_cluster_size",
        "train_docs", "train_frac", "target_frac", "frac_delta")
  }

  /** Deterministic token-budget corpus selection: keep the prefix of the
    * md5-ordered corpus whose CUMULATIVE token count fits `budgetTokens` —
    * the "cut the corpus to N training tokens" curation step, reproducible
    * across runs and engines (same md5-order contract as every sampler
    * here). A doc is kept iff its cumulative count (inclusive) is within
    * budget, so the boundary doc that would overflow is dropped.
    *
    * Scale shape — the naive form is a GLOBAL cumsum window, which Spark
    * executes on a SINGLE partition (Exchange SinglePartition): a
    * non-starter at 100 TB. This is instead the classic distributed
    * prefix-sum: docs bucket by the leading md5 byte-pair (256 ordered
    * ranges, uniform by construction), per-bucket token totals prefix-sum
    * DRIVER-side (256 longs — bounded), and each bucket computes its local
    * cumsum in a per-bucket window plus its range offset. One shuffle (the
    * bucket window), no single-partition stage — PlanSpec-gated.
    *
    * Tokens are the shared lower/[^a-z0-9]+ stream (the unigramNll /
    * oracle tokenizer), so the DuckDB oracle recomputes the selection
    * bit-for-bit with one global window over the same keys.
    *
    * Output: input columns + n_tokens + cum_tokens. */
  def selectTokenBudget(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budgetTokens: Long,
      seed: String = "graft",
      tokenCounter: Option[Column => Column] = None
  ): DataFrame = {
    require(budgetTokens >= 0, "budgetTokens must be >= 0")
    val k = key(seed, F.col(idCol))
    // null-text docs count as EXPLICIT 0-token docs: they stay selectable
    // (consuming no budget) instead of carrying a null n_tokens that both
    // poisons the bucket-total sum (NPE at the driver-side offset collect)
    // and silently rides through the cumsum filter
    // tokenCounter swaps the budget UNIT (e.g. Bpe.counter for real
    // tokenizer tokens instead of regex words) — the prefix-sum anatomy is
    // unit-agnostic
    val counted = tokenCounter.map(c => c(F.col(textCol)).cast("long")).getOrElse(
      F.size(graft.functions.TextFunctions.tokens(F.col(textCol))).cast("long"))
    val nTok = F.when(F.col(textCol).isNull, F.lit(0L)).otherwise(counted)
    // ONE tokenization pass: the bucket-totals collect and the per-bucket
    // cumsum window previously each re-evaluated the tokenizer over the
    // full text column — two complete text scans where one suffices, and
    // at 100 TB the tokenization IS the cost. The narrow
    // (id, key, bucket, n_tokens) projection (~50 B/row vs the text
    // column) is checkpointed once; the totals and the window both read
    // the checkpoint, and the kept prefix joins back to the corpus by id —
    // one unhinted corpus-sized join (AQE broadcasts the kept side when a
    // tight budget makes it small) instead of a second tokenize+shuffle.
    val narrow = df.select(
        F.col(idCol),
        k.as("__k"),
        F.substring(k, 1, 2).as("__b"),
        nTok.as("n_tokens"))
      .localCheckpoint(true)
    // 256 bucket totals → driver prefix offsets (bounded collect, the same
    // footprint class as an IVF centroid set)
    val totals: Map[String, Long] = narrow.groupBy("__b")
      .agg(F.coalesce(F.sum("n_tokens"), F.lit(0L)).as("__t"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val offsets: Seq[(String, Long)] = totals.toSeq.sortBy(_._1)
      .scanLeft(("", 0L)) { case ((_, acc), (b, t)) => (b, acc + t) }
      .sliding(2).collect { case Seq((_, acc), (b, _)) => (b, acc) }.toSeq
    val offCol = F.element_at(
      F.map(offsets.flatMap { case (b, o) => Seq(F.lit(b), F.lit(o)) }: _*),
      F.col("__b"))
    val w = Window.partitionBy(F.col("__b")).orderBy(F.col("__k"), F.col(idCol))
    val kept = narrow
      .withColumn("cum_tokens", F.sum(F.col("n_tokens")).over(w) + offCol)
      .filter(F.col("cum_tokens") <= budgetTokens)
      .drop("__k", "__b")
    df.join(kept, Seq(idCol))
  }

  /** Quality-ordered token-budget selection — [[selectTokenBudget]] with
    * the md5 order swapped for (orderCol DESC, id ASC): keep the
    * HIGHEST-scoring docs whose cumulative token count fits the budget,
    * the "quality-first cut" production pipelines actually run (a random
    * prefix burns budget on low-quality text).
    *
    * Distributed decomposition: repartitionByRange on the order key makes
    * every partition a CONTIGUOUS RANGE of the global order, so global
    * cumsum = partition offset + partition-local window — and crucially the
    * OUTPUT is independent of where the sampled range boundaries land (any
    * contiguous bucketing yields the same global cumsum), so the sampled
    * partitioner cannot perturb determinism. The ranged narrow frame is
    * checkpointed with its partition ids materialized; totals collect is
    * 256 longs; no SinglePartition stage (PlanSpec-gated like the md5
    * form). Ties in orderCol break by id, so the DuckDB oracle's single
    * global window reproduces the selection exactly. */
  def selectTokenBudgetBy(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budgetTokens: Long,
      orderCol: String,
      tokenCounter: Option[Column => Column] = None
  ): DataFrame = {
    require(budgetTokens >= 0, "budgetTokens must be >= 0")
    val counted = tokenCounter.map(c => c(F.col(textCol)).cast("long")).getOrElse(
      F.size(graft.functions.TextFunctions.tokens(F.col(textCol))).cast("long"))
    val nTok = F.when(F.col(textCol).isNull, F.lit(0L)).otherwise(counted)
    val ranged = df.select(
        F.col(idCol),
        F.col(orderCol).as("__q"),
        nTok.as("n_tokens"))
      .repartitionByRange(256, F.col("__q").desc_nulls_last, F.col(idCol).asc)
      .withColumn("__b", F.spark_partition_id())
      .localCheckpoint(true)
    val totals: Map[Int, Long] = ranged.groupBy("__b")
      .agg(F.coalesce(F.sum("n_tokens"), F.lit(0L)).as("__t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val offsets: Seq[(Int, Long)] = totals.toSeq.sortBy(_._1)
      .scanLeft((-1, 0L)) { case ((_, acc), (b, t)) => (b, acc + t) }
      .sliding(2).collect { case Seq((_, acc), (b, _)) => (b, acc) }.toSeq
    val offCol = F.element_at(
      F.map(offsets.flatMap { case (b, o) => Seq(F.lit(b), F.lit(o)) }: _*),
      F.col("__b"))
    val w = Window.partitionBy(F.col("__b"))
      .orderBy(F.col("__q").desc_nulls_last, F.col(idCol).asc)
    val kept = ranged
      .withColumn("cum_tokens", F.sum(F.col("n_tokens")).over(w) + offCol)
      .filter(F.col("cum_tokens") <= budgetTokens)
      .select(F.col(idCol), F.col("n_tokens"), F.col("cum_tokens"))
    df.join(kept, Seq(idCol))
  }

  /** Deterministic global shuffle: total order by the hash key. At scale
    * this is exactly one range-partitioned sort — the standard "shuffle the
    * corpus once before sharding to trainers" step, reproducible across
    * engines and runs. */
  def deterministicShuffle(
      df: DataFrame,
      idCol: String,
      seed: String = "graft"
  ): DataFrame =
    df.orderBy(key(seed, F.col(idCol)), F.col(idCol))

  /** Deterministic domain-weighted corpus mixing — the static-reweighting
    * step of a training mixture (downsample over-represented domains,
    * upsample scarce ones). A row with domain weight w is emitted
    * floor(w) times, plus once more iff its md5 fraction sorts below
    * frac(w) (the trainTestSplit hex-threshold trick, resolution 1/65536)
    * — so per-domain token counts hit w·|domain| exactly in expectation,
    * deterministically, with no engine-private randomness. Domains absent
    * from `weights` are dropped (an explicit mixture).
    *
    * Stateless and shuffle-free: membership and copy counts are computed
    * per row from (seed, id), so the plan is filter + explode over the
    * scan — any worker recomputes the same mixture at 100 TB. The emitted
    * `copy` column (1-based replica index) keeps upsampled duplicates
    * distinguishable downstream (e.g. for a later global shuffle). */
  /** Temperature-scaled domain mixing — the standard LLM data-mixing
    * recipe (sample domains ∝ share^alpha, the multinomial temperature of
    * GPT-3/PaLM-style multilingual/multi-domain training): target
    * composition q_d = p_d^α / Σ_e p_e^α over the observed doc-count
    * shares p_d, realized by per-doc weights w_d = q_d / p_d fed to
    * [[weightedMix]]'s deterministic md5-threshold machinery (α < 1
    * upweights rare domains above 1 — duplication — and shrinks dominant
    * ones; α = 1 is ~identity).
    *
    * Determinism across engines: the domain-count table is collected
    * driver-side (bounded — domains are a vocabulary-class set, capped at
    * `maxDomains`), Σ p^α accumulates in ASCENDING DOMAIN order, and each
    * weight is rounded to 6 dp before thresholding, so the DuckDB oracle
    * (ordered list_sum + the same pow/divide/round sequence) reproduces
    * every weight bitwise. One tiny groupBy + the weightedMix scan — no
    * corpus-sized collect. */
  def mixByTemperature(
      df: DataFrame,
      domainCol: String,
      idCol: String,
      alpha: Double,
      seed: String = "graft-mix",
      maxDomains: Int = 100000
  ): DataFrame = {
    require(alpha > 0.0 && alpha <= 10.0, "alpha in (0, 10]")
    val counts = df.filter(F.col(domainCol).isNotNull)
      .groupBy(domainCol).agg(F.count(F.lit(1)).as("__c"))
      .orderBy(domainCol)
      .collect().map(r => (r.get(0).toString, r.getLong(1)))
    require(counts.nonEmpty, "mixByTemperature: no non-null domains")
    require(counts.length <= maxDomains,
      s"mixByTemperature: ${counts.length} domains exceeds the $maxDomains cap")
    val n = counts.map(_._2).sum.toDouble
    // ascending-domain accumulation (the collect is already domain-ordered)
    val z = counts.foldLeft(0.0) { case (acc, (_, c)) => acc + math.pow(c / n, alpha) }
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val weights = counts.map { case (d, c) =>
      val p = c / n
      d -> round6(math.pow(p, alpha) / z / p)
    }.toMap
    weightedMix(df, domainCol, idCol, weights, seed)
  }

  def weightedMix(
      df: DataFrame,
      domainCol: String,
      idCol: String,
      weights: Map[String, Double],
      seed: String = "graft-mix"
  ): DataFrame = {
    require(weights.nonEmpty, "at least one domain weight required")
    require(weights.values.forall(w => w >= 0 && w.isFinite), "weights must be >= 0")
    val floorW = weights.foldLeft(F.lit(null).cast("int")) { case (acc, (d, w)) =>
      F.when(F.col(domainCol) === d, F.lit(math.floor(w).toInt)).otherwise(acc)
    }
    val thr = weights.foldLeft(F.lit(null).cast("string")) { case (acc, (d, w)) =>
      // clamp to 0xffff: a fractional part rounding to 65536 would render
      // as the 5-char "10000" and the 4-char prefix compare would
      // under-sample (~6%) instead of taking (almost) every row
      val frac = math.min(0xffff, math.round((w - math.floor(w)) * 65536).toInt)
      F.when(F.col(domainCol) === d, F.lit(f"$frac%04x")).otherwise(acc)
    }
    df.withColumn("__copies",
        floorW + F.when(
          F.substring(key(seed, F.col(idCol)), 1, 4) < thr, 1).otherwise(0))
      .filter(F.col("__copies") > 0) // also drops unlisted domains (null copies)
      .withColumn("copy", F.explode(F.sequence(F.lit(1), F.col("__copies"))))
      .drop("__copies")
  }

  /** DSIR importance weight (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling") — the principled "make the corpus
    * look like the target" selector: fit hashed-unigram multinomials on
    * the TARGET set and on the RAW corpus (Laplace-smoothed over the
    * [[graft.operators.QualityClassifier.Buckets]] hashed buckets — the
    * same portable 3-hex-md5 bucketing as the quality classifier), and
    * score every raw doc by its log importance weight
    *
    *   dsir_weight(doc) = Σ_tokens [ln p_target(b(t)) − ln p_raw(b(t))]
    *
    * — high weight = "looks like the target distribution". DSIR proper
    * then resamples with Gumbel noise; here selection stays deterministic
    * and composable: feed the column to `select_token_budget_by` (the
    * quality-first budget cut) or a plain threshold filter.
    *
    * Plan shape at 100 TB: two bucket-keyed groupBys whose RESULTS are
    * ≤ 4096 rows each (broadcast back to the postings), one postings
    * aggregation per doc — no corpus-sized collect, no window. Both
    * ln-probability tables are joined as one 4096-row broadcast, so the
    * scoring pass is a single shuffle on the doc id.
    *
    * Output: (idCol, n_tokens, dsir_weight) — weight rounded via the
    * shared +5e-9/4dp convention (per-position lnp values are fixed
    * doubles; only the per-doc sum order is engine-dependent); token-free
    * docs keep their row with n_tokens 0 and a null weight (the NLL-family
    * contract). */
  /** DSIR's actual SELECTION step — Gumbel-top-k importance resampling
    * (Xie et al. 2023 §2; Gumbel-top-k samples k items ∝ exp(log-weight)
    * without replacement): key = dsir_weight + Gumbel noise, keep the k
    * largest keys. The noise is SEEDED AND ENGINE-PORTABLE: u ∈ (0,1)
    * derives from 4 md5 hex chars of the seed-prefixed id
    * (u = (v + 0.5)/65536 — the +0.5 keeps ln(u) finite), g = −ln(−ln u),
    * and the key rounds via the shared +5e-9/6dp convention so the DuckDB
    * oracle reproduces the exact ordering. The base weight is the already
    * ROUNDED [[dsirWeight]] column — the rounding is what absorbs the
    * per-doc sum-order noise BEFORE the noise-add, keeping the key
    * deterministic across engines.
    *
    * Scale anatomy: [[dsirWeight]]'s plan + one TakeOrdered top-k — no
    * extra shuffle beyond the existing doc-keyed aggregation. */
  def dsirSample(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      targetTextCol: String,
      k: Int,
      seed: String = "dsir",
      features: String = "unigram"
  ): DataFrame = {
    require(k > 0, "k must be positive")
    val w = dsirWeight(corpus, idCol, textCol, target, targetTextCol, features)
      .filter(F.col("dsir_weight").isNotNull) // token-free docs can't be sampled
    val u = (F.conv(F.substring(key(seed, F.col(idCol)), 1, 4), 16, 10)
      .cast("double") + F.lit(0.5)) / F.lit(65536.0)
    w.withColumn("sample_key",
        F.round(F.col("dsir_weight") + -F.log(-F.log(u)) + F.lit(5e-9), 6))
      .orderBy(F.col("sample_key").desc, F.col(idCol))
      .limit(k)
  }

  /** Feature array for DSIR's hashed-n-gram bag: structs (f, u) where
    * `u` flags unigram features — 'unigram' mode = tokens only; 'bigram'
    * mode = tokens PLUS space-joined adjacent pairs hashed into the SAME
    * bucket space (the paper's actual feature set; Xie et al. 2023 §3).
    * Built inside the per-doc array — no shuffle, no window. `toks` MUST
    * be a materialized column REFERENCE, not the tokenize expression: an
    * element_at over the inline subtree re-tokenizes the whole text per
    * lambda element (O(tokens²) per doc — 16 s vs 2 s at sf0.1). */
  private def dsirFeatures(toks: Column, features: String): Column =
    features match {
      case "unigram" =>
        F.transform(toks, t => F.struct(t.as("f"), F.lit(true).as("u")))
      case "bigram" =>
        val unis = F.transform(toks, t => F.struct(t.as("f"), F.lit(true).as("u")))
        val bis = F.when(F.size(toks) > 1,
            F.transform(F.sequence(F.lit(1), F.size(toks) - 1), i =>
              F.struct(F.concat(F.element_at(toks, i), F.lit(" "),
                F.element_at(toks, i + 1)).as("f"), F.lit(false).as("u"))))
          .otherwise(F.array().cast("array<struct<f:string,u:boolean>>"))
        F.concat(unis, bis)
      case other => throw new IllegalArgumentException(
        s"dsir features must be 'unigram' or 'bigram', got '$other'")
    }

  /** The DSIR fit alone: target/raw hashed-feature bucket models (ln p
    * with Laplace smoothing) plus their totals — the stateful corpus/
    * target passes. Exposed so a STREAM can be scored against models fit
    * ONCE ([[graft.streaming.Subscribe.scoredAppend]]); [[dsirWeight]] is
    * dsirWeightAgainst(corpus, fit(corpus, target)) by construction, so
    * the split is invisible to the oracles. */
  final case class DsirModel(
      tModel: DataFrame, rModel: DataFrame, tN: Double, rN: Double,
      features: String)

  def dsirFit(
      corpus: DataFrame,
      textCol: String,
      target: DataFrame,
      targetTextCol: String,
      features: String = "unigram"
  ): DsirModel = {
    val buckets = graft.operators.QualityClassifier.Buckets
    def bucketed(df: DataFrame, text: String): DataFrame =
      df.select(graft.functions.TextFunctions.tokens(F.col(text)).as("__toks"))
        .select(F.explode(dsirFeatures(F.col("__toks"), features)).as("__s"))
        .select(graft.operators.QualityClassifier.bucketCol(F.col("__s.f")).as("__b"))
        .groupBy("__b").agg(F.count(F.lit(1)).as("__c"))
    // ln p(b) = ln((c_b + 1) / (N + B)) — Laplace over the full bucket
    // domain, so buckets unseen in either model still score finitely via
    // the smoothed floor ln(1 / (N + B)).
    // One bounded COLLECT per counts frame (optimization r19, r18 verdict
    // #5 + advice): the frame is ≤ Buckets (4096) (bucket, count) rows —
    // the same bounded class as the totals the old code already pulled to
    // the driver — but its lineage is a full tokenize+bucket pass with TWO
    // consumers (the total + the broadcast model build at scoring). r18
    // materialized it with eager localCheckpoint, which pins blocks whose
    // truncated lineage cannot be recomputed after an executor loss (a job
    // killer at 100 TB, and WARN spam locally). Collecting once and
    // rebuilding a LocalRelation gives the same single tokenize pass,
    // computes the total for free from the collected rows, ships the model
    // as plan-local data (broadcast-friendly), and leaves nothing cached
    // that a later run could reuse.
    def materialized(df: DataFrame): (DataFrame, Double) = {
      val rows = df.collect() // ≤ Buckets rows of (string/long, long)
      val spark = df.sparkSession
      val local = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), df.schema)
      (local, rows.map(_.getLong(1)).sum.toDouble)
    }
    val (tCounts, tN) = materialized(bucketed(target, targetTextCol))
    val (rCounts, rN) = materialized(bucketed(corpus, textCol))
    def lnModel(counts: DataFrame, n: Double, out: String): DataFrame =
      counts.select(F.col("__b"),
        F.log((F.col("__c").cast("double") + F.lit(1.0)) /
          (F.lit(n) + F.lit(buckets.toDouble))).as(out))
    DsirModel(lnModel(tCounts, tN, "__lnt"), lnModel(rCounts, rN, "__lnr"),
      tN, rN, features)
  }

  def dsirWeight(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      targetTextCol: String,
      features: String = "unigram"
  ): DataFrame =
    dsirWeightAgainst(corpus, idCol, textCol,
      dsirFit(corpus, textCol, target, targetTextCol, features))

  /** The scoring half: per-doc DSIR log importance weight of `docs`
    * against a pre-fit [[DsirModel]] — stateless per document (two
    * broadcast bucket joins, one doc-keyed aggregation), so micro-batched
    * scoring reproduces the batch run row for row. */
  def dsirWeightAgainst(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: DsirModel
  ): DataFrame = {
    val buckets = graft.operators.QualityClassifier.Buckets
    val features = model.features
    val tModel = model.tModel
    val rModel = model.rModel
    val tN = model.tN
    val rN = model.rN
    def lnFloor(n: Double): Column =
      F.log(F.lit(1.0) / (F.lit(n) + F.lit(buckets.toDouble)))
    val tok = docs.select(
        F.col(idCol),
        graft.functions.TextFunctions.tokens(F.col(textCol)).as("__toks"))
      .select(F.col(idCol),
        F.explode_outer(dsirFeatures(F.col("__toks"), features)).as("__s"))
      .select(F.col(idCol), F.col("__s.f").as("__t"), F.col("__s.u").as("__u"))
      .withColumn("__b",
        F.when(F.col("__t").isNotNull,
          graft.operators.QualityClassifier.bucketCol(F.col("__t"))))
    tok
      .join(F.broadcast(tModel), Seq("__b"), "left")
      .join(F.broadcast(rModel), Seq("__b"), "left")
      .withColumn("__lr",
        F.when(F.col("__t").isNull, F.lit(null).cast("double"))
          .otherwise(
            F.coalesce(F.col("__lnt"), lnFloor(tN)) -
            F.coalesce(F.col("__lnr"), lnFloor(rN))))
      .groupBy(F.col(idCol))
      .agg(
        // n_tokens counts UNIGRAM positions in every mode (the canonical
        // token count); the weight sums over ALL hashed features
        F.sum(F.when(F.col("__u"), 1L).otherwise(0L)).as("n_tokens"),
        F.sum(F.col("__lr")).as("__s"))
      .withColumn("dsir_weight",
        F.when(F.col("n_tokens") > 0,
          F.round(F.col("__s") + F.lit(5e-9), 4)))
      .select(idCol, "n_tokens", "dsir_weight")
  }
}
