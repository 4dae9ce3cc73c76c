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
    * Entirely columnar — k × array_min(transform(...)) under one projection. */
  def minhashSignature(text: Column, numHashes: Int = 128, shingleSize: Int = 3): Column = {
    val hashes = TextFunctions.shingleHashes(text, shingleSize)
    val sigs = minhashParams(numHashes).map { case (a, b) =>
      F.array_min(F.transform(hashes, x =>
        F.pmod(F.pmod(x, F.lit(MersennePrime)) * a + b, F.lit(MersennePrime))))
    }
    F.when(F.size(hashes) === 0, F.lit(null)).otherwise(F.array(sigs: _*))
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
    val withSig = df
      .select(F.col(idCol), F.col(textCol))
      .withColumn("__sig", minhashSignature(F.col(textCol), numHashes, shingleSize))
      .filter(F.col("__sig").isNotNull)
      .withColumn("__shingles", TextFunctions.wordShingles(F.col(textCol), shingleSize))
      .drop(textCol)

    val postings = withSig
      .select(
        F.col(idCol),
        F.col("__shingles"),
        F.posexplode(
          F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            b => F.xxhash64(F.slice(F.col("__sig"), b * r + 1, F.lit(r)))
          )
        ).as(Seq("band_idx", "band_hash"))
      )

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
      F.col("band_idx"), F.col("band_hash"),
      F.col(idCol).as("id_a"), F.col("__shingles").as("__sh_a"))
    val right = bucketed.select(
      F.col("band_idx"), F.col("band_hash"),
      F.col(idCol).as("id_b"), F.col("__shingles").as("__sh_b"))

    val candidates = left
      .join(right, Seq("band_idx", "band_hash"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select("id_a", "id_b", "__sh_a", "__sh_b")
      .dropDuplicates("id_a", "id_b")

    // verify candidates with exact Jaccard on the shingle sets
    val common = F.size(F.array_intersect(F.col("__sh_a"), F.col("__sh_b")))
    val union = F.size(F.col("__sh_a")) + F.size(F.col("__sh_b")) - common
    candidates
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
    * accepts a column shift amount). */
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

  /** SimHash near-dup pairs: block on 4 × 16-bit chunks (two docs within
    * hamming distance ≤ 3 of a 64-bit hash must share at least one of 4
    * chunks — pigeonhole), then verify exact hamming distance. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3
  ): DataFrame = {
    val withSim = df.select(F.col(idCol), simhash(F.col(textCol)).as("simhash"))
    val chunks = withSim.select(
      F.col(idCol), F.col("simhash"),
      F.posexplode(F.array(
        (0 until 4).map(i =>
          F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFFL))): _*
      )).as(Seq("chunk_idx", "chunk"))
    )
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
    val postings = sh.select(F.col("id"), F.col("__n"), F.explode(F.col("__sh")).as("shingle"))
    val a = postings.select(F.col("shingle"), F.col("id").as("id_a"), F.col("__n").as("n_a"))
    val b = postings.select(F.col("shingle"), F.col("id").as("id_b"), F.col("__n").as("n_b"))
    a.join(b, Seq("shingle"))
      .filter(F.col("id_a") < F.col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(F.count(F.lit(1)).as("common"))
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
    * Sequential fold in index order — bit-for-bit reproducible. */
  def cosine(a: Column, b: Column): Column = {
    val dot = F.aggregate(
      F.zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      F.lit(0.0), (acc, v) => acc + v)
    val na = F.sqrt(F.aggregate(a, F.lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = F.sqrt(F.aggregate(b, F.lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (na * nb)
  }

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
