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
  * sequential semantics, shard count = write parallelism. Token counts use
  * the whitespace tokenizer (TextFunctions.tokenCount) — swap in a real
  * tokenizer count column upstream when available.
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
      seed: String = "graft-pack"
  ): DataFrame = {
    require(budget > 0 && shards > 0 && shards <= 16,
      "budget > 0; shards in 1..16 (hex-prefix sharding)")
    val key = F.md5(F.concat(F.lit(seed), F.col(idCol).cast("string")))
    // hex-prefix shard in [0, shards): locate over the md5 alphabet — no
    // engine-private hash, so the assignment is oracle-reproducible
    val shard = (F.call_function("locate",
      F.substring(key, 1, 1), F.lit("0123456789abcdef")) - 1) % shards
    val toks = graft.functions.TextFunctions.tokenCount(F.col(textCol)).cast("long")
    val w = Window.partitionBy(F.col("shard")).orderBy(F.col("__key"), F.col(idCol))
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
