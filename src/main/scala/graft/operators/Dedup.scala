package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines, designed for
  * 100 TB scale: every variant is expressed as shuffle-bounded DataFrame
  * plans (explode → groupBy → join) with candidate generation *before*
  * pairwise verification, never an O(n²) cross join. No UDFs — all column
  * expressions stay inside whole-stage codegen.
  *
  * Variants (SURVEY §7 step 13 / BASELINE.json north star):
  *   - exact: hash groupBy on a normalized fingerprint
  *   - minhashLsh: shingle → minhash signature → banded LSH buckets →
  *     candidate pairs → exact-Jaccard verify
  *   - simhash: 64-bit simhash → 16-bit band blocking → hamming verify
  *   - ngramJaccard: exact set-similarity via token-posting join
  *     (SQL-expressible — used as the DuckDB-oracle-checkable variant)
  *   - embeddingCosine: cosine near-dup over an embedding column
  */
object Dedup {

  // ---------------------------------------------------------------------------
  // Exact dedup
  // ---------------------------------------------------------------------------

  /** Exact dedup on normalized text: md5 fingerprint groupBy, keeping the
    * smallest id per group. One shuffle on the fingerprint (a uniform hash →
    * no skew); scales linearly. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = TextFunctions.fingerprint(F.col(textCol))
    df.withColumn("__fp", fp)
      .groupBy(F.col("__fp"))
      .agg(F.min(F.col(idCol)).as(idCol), F.count(F.lit(1)).as("dup_count"))
      .drop("__fp")
      .join(df, Seq(idCol))
  }

  /** Exact-dup groups only (fingerprint, kept id, count) — cheap audit view. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(F.col(idCol), TextFunctions.fingerprint(F.col(textCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(F.min(F.col(idCol)).as("keep_id"), F.count(F.lit(1)).as("dup_count"))

  // ---------------------------------------------------------------------------
  // MinHash + LSH
  // ---------------------------------------------------------------------------

  /** Deterministic (a, b) parameters for the k minhash permutations
    * h_j(x) = (a_j·x + b_j) mod p — fixed seed so results are stable.
    * p = 2^31−1 (Mersenne) keeps a·x within a 64-bit long under ANSI
    * arithmetic: a, x < 2^31 ⇒ a·x < 2^62. */
  private def minhashParams(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42L)
    Seq.fill(k)((
      (math.abs(rnd.nextLong()) % (MersennePrime - 1)) + 1,
      math.abs(rnd.nextLong()) % MersennePrime))
  }
  private val MersennePrime = (1L << 31) - 1

  /** MinHash signature column: array of k minimums over the shingle hash set.
    * Entirely columnar — k × array_min(transform(...)) under one projection.
    *
    * NOTE: higher-order functions are interpreted per element in Spark —
    * fine for a handful of rows, but for table-scale signatures use
    * [[minhashSignatures]] (explode + codegen'd wide min-aggregate), which
    * is ~100× faster and shuffle-bounded. */
  def minhashSignature(text: Column, numHashes: Int = 128, shingleSize: Int = 3): Column = {
    val hashes = TextFunctions.shingleHashes(text, shingleSize)
    val sigs = minhashParams(numHashes).map { case (a, b) =>
      F.array_min(F.transform(hashes, x =>
        F.pmod(F.pmod(x, F.lit(MersennePrime)) * a + b, F.lit(MersennePrime))))
    }
    F.when(F.size(hashes) === 0, F.lit(null)).otherwise(F.array(sigs: _*))
  }

  /** Table-scale minhash signatures: (id, __m0 … __m{k-1}), one row per doc
    * with ≥1 shingle. Relational formulation: explode shingle hashes, then a
    * single hash-aggregate with k `min` columns — whole-stage codegen'd with
    * map-side partial aggregation, one shuffle on the doc id. */
  def minhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int,
      shingleSize: Int
  ): DataFrame = {
    val exploded = df.select(
      F.col(idCol),
      F.explode(TextFunctions.shingleHashes(F.col(textCol), shingleSize)).as("__h0"))
      .select(F.col(idCol), F.pmod(F.col("__h0"), F.lit(MersennePrime)).as("__h"))
    val mins = minhashParams(numHashes).zipWithIndex.map { case ((a, b), j) =>
      F.min(F.pmod(F.col("__h") * a + b, F.lit(MersennePrime))).as(s"__m$j")
    }
    exploded.groupBy(F.col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** Candidate near-dup pairs via banded LSH over minhash signatures.
    *
    * bands × rowsPerBand = numHashes; two docs collide when any band of
    * their signatures matches exactly. P(collide) ≈ 1-(1-s^r)^b.
    *
    * Plan shape: explode to (bandIdx, bandHash, id) postings — b rows per
    * doc — then self-join postings on (bandIdx, bandHash) with id < id2.
    * Shuffle cost O(b·n); buckets are hash-distributed. Pathological buckets
    * (identical boilerplate docs) are capped via `maxBucketSize` to bound the
    * quadratic in-bucket pair expansion — the standard guard at web scale.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      numHashes: Int = 128,
      bands: Int = 32,
      shingleSize: Int = 3,
      maxBucketSize: Int = 1000
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    val sig = minhashSignatures(df, idCol, textCol, numHashes, shingleSize)

    // band hash = xxhash64 over the band's r signature columns (variadic —
    // no intermediate array); postings carry ONLY (id, band_idx, band_hash),
    // not the shingle arrays: at 100 TB, shipping each doc's shingle set
    // through b=32 posting rows would multiply the shuffle by ~b×doc_size.
    val bandHashes = (0 until bands).map { bi =>
      F.xxhash64((bi * r until (bi + 1) * r).map(j => F.col(s"__m$j")): _*)
    }
    val postings = sig.select(
      F.col(idCol),
      F.posexplode(F.array(bandHashes: _*)).as(Seq("band_idx", "band_hash")))

    // bucket-size guard: drop pathologically hot buckets (boilerplate storms)
    val bucketed = postings
      .withColumn(
        "__bucket_n",
        F.count(F.lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("band_idx", "band_hash"))
      )
      .filter(F.col("__bucket_n") <= maxBucketSize)
      .drop("__bucket_n")

    val left = bucketed.select(
      F.col("band_idx"), F.col("band_hash"), F.col(idCol).as("id_a"))
    val right = bucketed.select(
      F.col("band_idx"), F.col("band_hash"), F.col(idCol).as("id_b"))

    val candidates = left
      .join(right, Seq("band_idx", "band_hash"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    // verify candidates with exact Jaccard: re-join the shingle sets by id
    // (two equi-joins on the candidate ids — far smaller than the postings)
    val shingleSets = df.select(
      F.col(idCol).as("__id"),
      TextFunctions.wordShingles(F.col(textCol), shingleSize).as("__sh"))
    val withSets = candidates
      .join(shingleSets.select(F.col("__id").as("id_a"), F.col("__sh").as("__sh_a")), Seq("id_a"))
      .join(shingleSets.select(F.col("__id").as("id_b"), F.col("__sh").as("__sh_b")), Seq("id_b"))
    val common = F.size(F.array_intersect(F.col("__sh_a"), F.col("__sh_b")))
    val union = F.size(F.col("__sh_a")) + F.size(F.col("__sh_b")) - common
    withSets
      .withColumn("jaccard", F.round(common.cast("double") / union, 6))
      .filter(F.col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash-LSH dedup: drop every doc that has a verified near-dup with a
    * smaller id (greedy canonical-representative policy — no iterative
    * connected components, one extra semi-join). */
  def minhashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      numHashes: Int = 128,
      bands: Int = 32,
      shingleSize: Int = 3
  ): DataFrame = {
    val losers = minhashLshPairs(df, idCol, textCol, threshold, numHashes, bands, shingleSize)
      .select(F.col("id_b").as(idCol))
      .distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  // ---------------------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------------------

  /** 64-bit SimHash over token hashes: per bit position, sum +1/-1 votes
    * across token hashes, take the sign. Columnar via nested
    * transform+aggregate (bit extraction through the SQL `shiftright`, which
    * accepts a column shift amount).
    *
    * NOTE: 64 interpreted higher-order `aggregate` passes per row — use only
    * on small/constant inputs. Table-scale: [[simhashTable]]. */
  def simhash(text: Column): Column = {
    val hashes = TextFunctions.shingleHashes(text, 1) // unigram token hashes
    val bits = F.transform(
      F.sequence(F.lit(0), F.lit(63)),
      i =>
        F.when(
          F.aggregate(
            hashes,
            F.lit(0L),
            (acc, h) =>
              acc + F.when(
                F.call_function("shiftright", h, i).bitwiseAND(F.lit(1L)) === 1L, 1L
              ).otherwise(-1L)
          ) > 0, F.lit(1L)).otherwise(F.lit(0L))
    )
    // fold bits into one long (bit 63 first)
    F.aggregate(F.reverse(bits), F.lit(0L), (acc, b) => F.shiftleft(acc, 1).bitwiseOR(b))
  }

  /** Table-scale simhash: (id, simhash) with one row per doc that has ≥1
    * token (token-less docs are dropped — an all-zero simhash would spuriously
    * pair every empty doc). Relational formulation: explode token hashes,
    * one hash-aggregate with 64 conditional-sum vote columns (whole-stage
    * codegen, map-side partial agg, one shuffle on id), then fold the vote
    * signs into a single 64-bit long in a projection. */
  def simhashTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = df.select(
      F.col(idCol),
      F.explode(TextFunctions.shingleHashes(F.col(textCol), 1)).as("__h"))
    val votes = (0 until 64).map { i =>
      F.sum(
        F.when(F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1L)) === 1L, 1L)
          .otherwise(-1L)).as(s"__b$i")
    }
    val agg = exploded.groupBy(F.col(idCol)).agg(votes.head, votes.tail: _*)
    val sim = (0 until 64)
      .map(i => F.when(F.col(s"__b$i") > 0, F.lit(1L << i)).otherwise(F.lit(0L)))
      .reduce(_.bitwiseOR(_))
    agg.select(F.col(idCol), sim.as("simhash"))
  }

  /** SimHash near-dup pairs: block on `maxHamming + 1` disjoint bit chunks —
    * two hashes within hamming distance ≤ maxHamming must agree on at least
    * one chunk (pigeonhole) — then verify exact hamming distance. The chunk
    * count adapts to maxHamming so blocking recall is exact, not best-effort. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3
  ): DataFrame = {
    val numChunks = math.min(maxHamming + 1, 16) // ≥4-bit chunks
    val bounds = (0 to numChunks).map(i => i * 64 / numChunks)
    val chunkCols = (0 until numChunks).map { i =>
      val width = bounds(i + 1) - bounds(i)
      val mask = if (width == 64) -1L else (1L << width) - 1
      F.shiftrightunsigned(F.col("simhash"), bounds(i)).bitwiseAND(F.lit(mask))
    }
    val withSim = simhashTable(df, idCol, textCol)
    // repartition on the blocking key — see ngramJaccardPairs
    val chunks = withSim.select(
      F.col(idCol), F.col("simhash"),
      F.posexplode(F.array(chunkCols: _*)).as(Seq("chunk_idx", "chunk"))
    ).repartition(F.col("chunk_idx"), F.col("chunk"))
    val l = chunks.select(F.col("chunk_idx"), F.col("chunk"),
      F.col(idCol).as("id_a"), F.col("simhash").as("sim_a"))
    val r = chunks.select(F.col("chunk_idx"), F.col("chunk"),
      F.col(idCol).as("id_b"), F.col("simhash").as("sim_b"))
    l.join(r, Seq("chunk_idx", "chunk"))
      .filter(F.col("id_a") < F.col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
      .filter(F.col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // ---------------------------------------------------------------------------
  // Exact n-gram Jaccard (oracle-checkable)
  // ---------------------------------------------------------------------------

  /** Exact word-n-gram Jaccard similarity pairs via posting-list join:
    * explode distinct shingles, join on shingle, count common, compute
    * |A∩B| / (|A|+|B|-|A∩B|). Exact (no hashing) — reproducible in ANSI SQL
    * for the DuckDB oracle. Shuffle: one explode + one groupBy(pair).
    * At 100 TB add prefix filtering (only k rarest shingles per doc);
    * exposed via `maxPostings`. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 2,
      threshold: Double = 0.5
  ): DataFrame = {
    val sh = df.select(
      F.col(idCol).as("id"),
      TextFunctions.wordShingles(F.col(textCol), n).as("__sh"))
      .withColumn("__n", F.size(F.col("__sh")))
      .filter(F.col("__n") > 0)
    // postings carry (xxhash64(shingle), id) only — an 8-byte join key and
    // no doc-size payload: the posting self-join is the quadratic part
    // (Σ df(s)² rows), so every byte per row multiplies; doc sizes are
    // re-attached AFTER the pair aggregation via two joins against the
    // tiny per-doc size table. 64-bit hashing cannot (p ≈ |vocab|²/2⁶⁵)
    // merge two shingles, so counts match the exact-string oracle.
    // repartition on the join key: the posting table often derives from a
    // narrow scan (one small file → one partition), which would serialize
    // the quadratic self-join into a single task. Hash-partitioning on
    // `shingle` both parallelizes it and already satisfies the join's
    // distribution requirement, so no further shuffle is added.
    val postings = sh.select(F.col("id"), F.explode(F.col("__sh")).as("__s"))
      .select(F.col("id"), F.xxhash64(F.col("__s")).as("shingle"))
      .repartition(F.col("shingle"))
    val sizes = sh.select(F.col("id"), F.col("__n"))
    val a = postings.select(F.col("shingle"), F.col("id").as("id_a"))
    val b = postings.select(F.col("shingle"), F.col("id").as("id_b"))
    a.join(b, Seq("shingle"))
      .filter(F.col("id_a") < F.col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(F.count(F.lit(1)).as("common"))
      // no broadcast hint: the size table scales with the corpus; AQE
      // converts these to broadcast joins at runtime when it is small
      .join(sizes.select(F.col("id").as("id_a"), F.col("__n").as("n_a")), Seq("id_a"))
      .join(sizes.select(F.col("id").as("id_b"), F.col("__n").as("n_b")), Seq("id_b"))
      .withColumn(
        "jaccard",
        F.round(F.col("common").cast("double") /
          (F.col("n_a") + F.col("n_b") - F.col("common")), 6))
      .filter(F.col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---------------------------------------------------------------------------
  // Embedding cosine near-dup
  // ---------------------------------------------------------------------------

  /** Cosine similarity of two float-array columns, computed in double.
    * Sequential fold in index order — bit-for-bit reproducible. Backed by
    * the native codegen'd [[graft.functions.VectorExpressions]] expression
    * (the HOF zip_with/aggregate formulation is interpreted per element and
    * dominated the similarity joins). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosineSimilarity(a, b)

  /** Embedding near-dup pairs above a cosine threshold.
    *
    * Candidate generation uses random-hyperplane LSH (`planes` bits, docs
    * sharing a signature bucket are compared); set `bruteForce = true` for
    * the exact O(n²) reference path (only sane at small n / as an oracle).
    */
  def embeddingCosinePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      planes: Int = 12,
      bruteForce: Boolean = false
  ): DataFrame = {
    val base = df.select(F.col(idCol).as("id"), F.col(vecCol).as("vec"))
    val pairs =
      if (bruteForce) {
        val a = base.select(F.col("id").as("id_a"), F.col("vec").as("vec_a"))
        val b = base.select(F.col("id").as("id_b"), F.col("vec").as("vec_b"))
        a.join(b, F.col("id_a") < F.col("id_b"))
      } else {
        val withSig = base.withColumn("bucket", Similarity.hyperplaneSignature(F.col("vec"), planes))
        val a = withSig.select(F.col("bucket"),
          F.col("id").as("id_a"), F.col("vec").as("vec_a"))
        val b = withSig.select(F.col("bucket"),
          F.col("id").as("id_b"), F.col("vec").as("vec_b"))
        a.join(b, Seq("bucket")).filter(F.col("id_a") < F.col("id_b"))
          .drop("bucket").dropDuplicates("id_a", "id_b")
      }
    pairs
      .withColumn("cos_sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6))
      .filter(F.col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }
}
