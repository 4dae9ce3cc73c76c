package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** GPT-style sequence packing metadata: concatenate the corpus in a
  * deterministic order and cut every `budget` tokens; each document gets
  * its pack coordinates (first/last pack index, offset inside the first
  * pack). Documents may straddle pack boundaries — exactly how pretraining
  * packing concatenates-and-cuts; a trainer shards by pack index.
  *
  * 100 TB anatomy: a single global concatenation order would serialize the
  * cumulative sum onto one partition, so the corpus is first split into
  * `shards` deterministic groups (an md5-hex-prefix bucket —
  * engine-portable, reproducible, independent of input partitioning) and
  * packed WITHIN each shard: one shuffle (the shard window), per-shard
  * sequential semantics, shard count = write parallelism — up to 4096
  * shards (three md5 hex digits read as a radix-16 number, so every shard
  * count in 1..4096 gets its own window task). Token counts use the
  * alphanumeric-run tokenizer (TextFunctions.tokenCount — NOT whitespace
  * words; hyphens/punctuation split) — swap in a real tokenizer count
  * column upstream when available.
  */
object Packing {

  /** (id, shard, n_tokens, token offset within the shard, pack_first,
    * pack_last, pack_offset). Deterministic under (seed, shards, budget). */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      shards: Int = 16,
      seed: String = "graft-pack",
      tokenCounter: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None
  ): DataFrame = {
    require(budget > 0 && shards > 0 && shards <= 4096,
      "budget > 0; shards in 1..4096 (md5-hex-prefix sharding)")
    val key = F.md5(F.concat(F.lit(seed), F.col(idCol).cast("string")))
    // shard in [0, shards): read the smallest md5 hex prefix that covers
    // `shards` buckets as a radix-16 number — no engine-private hash, so
    // the assignment is oracle-reproducible. (When shards doesn't divide
    // 16^k the % leaves a <1/16 uniformity skew across buckets —
    // irrelevant for write parallelism.)
    val hexDigits = { var k = 1; var cap = 16L; while (cap < shards) { k += 1; cap *= 16 }; k }
    def hexDigit(i: Int) = F.call_function("locate",
      F.substring(key, i, 1), F.lit("0123456789abcdef")) - 1
    val shard = (1 to hexDigits).map(hexDigit)
      .reduceLeft((acc, d) => acc * 16 + d) % shards
    // tokenCounter swaps the packing UNIT (e.g. Bpe.counter for tokenizer
    // tokens); the shard-window anatomy is unit-agnostic
    val toks = tokenCounter.map(c => c(F.col(textCol)).cast("long")).getOrElse(
      graft.functions.TextFunctions.tokenCount(F.col(textCol)).cast("long"))
    // explicit ROWS frame: the default RANGE frame would collapse the
    // cumulative sum for rows tied on (__key, id); ROWS keeps one offset
    // per row regardless (ids are expected unique, but don't depend on it)
    val w = Window.partitionBy(F.col("shard")).orderBy(F.col("__key"), F.col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(
        F.col(idCol),
        shard.cast("int").as("shard"),
        key.as("__key"),
        toks.as("n_tokens"))
      .withColumn("offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
      .withColumn("pack_first", F.floor(F.col("offset") / budget))
      .withColumn("pack_last",
        F.floor((F.col("offset") + F.greatest(F.col("n_tokens"), F.lit(1L)) - 1) / budget))
      .withColumn("pack_offset", F.col("offset") % budget)
      .drop("__key")
  }
}
