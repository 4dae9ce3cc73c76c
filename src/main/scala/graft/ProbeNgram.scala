package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Scratch stage-decomposition probe for the ngram-jaccard pair kernel
  * (optimization round instrumentation — timings via the noop sink, guide
  * §1.4). Not a catalog query; safe to delete. */
object ProbeNgram {
  private def time(label: String)(df: => DataFrame): Unit = {
    val d = df
    d.sparkSession.sparkContext.setJobDescription(label)
    // warm
    d.write.format("noop").mode("overwrite").save()
    val runs = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      d.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[probe] $label%-28s median=${runs.sorted.apply(1)}%6.2f s  runs=${runs.map(r => f"$r%.2f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val variant: Set[String] =
      if (args.nonEmpty) args(0).split(",").toSet else Set("1", "2", "3", "4", "5", "6", "x")
    def enabled(v: String) = variant.contains(v)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.read(spark, dir, "documents")
    val parts = spark.sparkContext.defaultParallelism

    val sh = docs.repartition(parts * 2).select(
      F.col("doc_id").as("id"),
      graft.functions.TextHashExpressions.shingleHashes64(F.col("text"), 2).as("__sh"))
    val postings = sh.select(
      F.col("id"), F.size(F.col("__sh")).as("n"), F.explode(F.col("__sh")).as("shingle"))
      .repartition(parts, F.col("shingle"))

    if (enabled("1")) time("1 shingle+explode+exchange")(postings)

    val capped = postings
      .withColumn("__bn", F.count(F.lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
      .filter(F.col("__bn") <= 10000).drop("__bn")
    if (enabled("2")) time("2 + window cap")(capped)

    val a = capped.select(F.col("shingle"), F.col("id").as("id_a"), F.col("n").as("n_a"))
    val b = capped.select(F.col("shingle"), F.col("id").as("id_b"), F.col("n").as("n_b"))
    val joined = a.join(b, Seq("shingle")).filter(F.col("id_a") < F.col("id_b"))
    if (enabled("3")) time("3 + self join")(joined)

    val agg = joined.groupBy("id_a", "id_b")
      .agg(F.count(F.lit(1)).as("common"),
        F.any_value(F.col("n_a")).as("n_a"), F.any_value(F.col("n_b")).as("n_b"))
      .withColumn("jaccard", F.round(F.col("common").cast("double") /
        (F.col("n_a") + F.col("n_b") - F.col("common")), 6))
      .filter(F.col("jaccard") >= 0.12)
      .select("id_a", "id_b", "jaccard")
    if (enabled("4")) time("4 full kernel")(agg)

    // variant A: aggregate-based hot-shingle cap (no window, no per-branch sort)
    val hot = postings.groupBy("shingle").count().filter(F.col("count") > 10000)
      .select("shingle")
    val cappedA = postings.join(F.broadcast(hot), Seq("shingle"), "left_anti")
    val aA = cappedA.select(F.col("shingle"), F.col("id").as("id_a"), F.col("n").as("n_a"))
    val bA = cappedA.select(F.col("shingle"), F.col("id").as("id_b"), F.col("n").as("n_b"))
    val aggA = aA.join(bA, Seq("shingle")).filter(F.col("id_a") < F.col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(F.count(F.lit(1)).as("common"),
        F.any_value(F.col("n_a")).as("n_a"), F.any_value(F.col("n_b")).as("n_b"))
      .withColumn("jaccard", F.round(F.col("common").cast("double") /
        (F.col("n_a") + F.col("n_b") - F.col("common")), 6))
      .filter(F.col("jaccard") >= 0.12)
      .select("id_a", "id_b", "jaccard")
    if (enabled("5")) time("5 variant: agg-cap kernel")(aggA)

    // variant B: skip the spread exchange (shingle straight off the scan)
    val shB = docs.select(
      F.col("doc_id").as("id"),
      graft.functions.TextHashExpressions.shingleHashes64(F.col("text"), 2).as("__sh"))
    val postB = shB.select(
      F.col("id"), F.size(F.col("__sh")).as("n"), F.explode(F.col("__sh")).as("shingle"))
      .repartition(parts, F.col("shingle"))
    val hotB = postB.groupBy("shingle").count().filter(F.col("count") > 10000)
      .select("shingle")
    val capB = postB.join(F.broadcast(hotB), Seq("shingle"), "left_anti")
    val aggB = capB.select(F.col("shingle"), F.col("id").as("id_a"), F.col("n").as("n_a"))
      .join(capB.select(F.col("shingle"), F.col("id").as("id_b"), F.col("n").as("n_b")), Seq("shingle"))
      .filter(F.col("id_a") < F.col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(F.count(F.lit(1)).as("common"),
        F.any_value(F.col("n_a")).as("n_a"), F.any_value(F.col("n_b")).as("n_b"))
      .withColumn("jaccard", F.round(F.col("common").cast("double") /
        (F.col("n_a") + F.col("n_b") - F.col("common")), 6))
      .filter(F.col("jaccard") >= 0.12)
      .select("id_a", "id_b", "jaccard")
    if (enabled("6")) time("6 variant: B no spread")(aggB)

    // variant 7: B + drop n from postings; sizes re-attached by broadcast
    // join AFTER the pair agg (pair rows carry only the two ids)
    val post7 = shB.select(
      F.col("id"), F.explode(F.col("__sh")).as("shingle"))
      .repartition(parts, F.col("shingle"))
    val hot7 = post7.groupBy("shingle").count().filter(F.col("count") > 10000)
      .select("shingle")
    val cap7 = post7.join(F.broadcast(hot7), Seq("shingle"), "left_anti")
    val sizes7 = cap7.groupBy("id").count().withColumnRenamed("count", "n")
    val agg7 = cap7.select(F.col("shingle"), F.col("id").as("id_a"))
      .join(cap7.select(F.col("shingle"), F.col("id").as("id_b")), Seq("shingle"))
      .filter(F.col("id_a") < F.col("id_b"))
      .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).as("common"))
      .join(F.broadcast(sizes7.select(F.col("id").as("id_a"), F.col("n").as("n_a"))), Seq("id_a"))
      .join(F.broadcast(sizes7.select(F.col("id").as("id_b"), F.col("n").as("n_b"))), Seq("id_b"))
      .withColumn("jaccard", F.round(F.col("common").cast("double") /
        (F.col("n_a") + F.col("n_b") - F.col("common")), 6))
      .filter(F.col("jaccard") >= 0.12)
      .select("id_a", "id_b", "jaccard")
    if (enabled("7")) time("7 B+narrow+bcast sizes")(agg7)

    // variant 8: B with a wider shingle exchange (4x parts) so the pair
    // partial agg works on smaller per-task maps
    val post8 = shB.select(
      F.col("id"), F.size(F.col("__sh")).as("n"), F.explode(F.col("__sh")).as("shingle"))
      .repartition(parts * 4, F.col("shingle"))
    val hot8 = post8.groupBy("shingle").count().filter(F.col("count") > 10000)
      .select("shingle")
    val cap8 = post8.join(F.broadcast(hot8), Seq("shingle"), "left_anti")
    val agg8 = cap8.select(F.col("shingle"), F.col("id").as("id_a"), F.col("n").as("n_a"))
      .join(cap8.select(F.col("shingle"), F.col("id").as("id_b"), F.col("n").as("n_b")), Seq("shingle"))
      .filter(F.col("id_a") < F.col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(F.count(F.lit(1)).as("common"),
        F.any_value(F.col("n_a")).as("n_a"), F.any_value(F.col("n_b")).as("n_b"))
      .withColumn("jaccard", F.round(F.col("common").cast("double") /
        (F.col("n_a") + F.col("n_b") - F.col("common")), 6))
      .filter(F.col("jaccard") >= 0.12)
      .select("id_a", "id_b", "jaccard")
    if (enabled("8")) time("8 B+4x partitions")(agg8)

    // variant 9: narrow postings + 4x partitions combined
    val post9 = shB.select(F.col("id"), F.explode(F.col("__sh")).as("shingle"))
      .repartition(parts * 4, F.col("shingle"))
    val hot9 = post9.groupBy("shingle").count().filter(F.col("count") > 10000)
      .select("shingle")
    val cap9 = post9.join(F.broadcast(hot9), Seq("shingle"), "left_anti")
    val sizes9 = cap9.groupBy("id").count().withColumnRenamed("count", "n")
    val agg9 = cap9.select(F.col("shingle"), F.col("id").as("id_a"))
      .join(cap9.select(F.col("shingle"), F.col("id").as("id_b")), Seq("shingle"))
      .filter(F.col("id_a") < F.col("id_b"))
      .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).as("common"))
      .join(F.broadcast(sizes9.select(F.col("id").as("id_a"), F.col("n").as("n_a"))), Seq("id_a"))
      .join(F.broadcast(sizes9.select(F.col("id").as("id_b"), F.col("n").as("n_b"))), Seq("id_b"))
      .withColumn("jaccard", F.round(F.col("common").cast("double") /
        (F.col("n_a") + F.col("n_b") - F.col("common")), 6))
      .filter(F.col("jaccard") >= 0.12)
      .select("id_a", "id_b", "jaccard")
    if (enabled("9")) time("9 narrow+4x")(agg9)

    // variant 10: 8x partitions, n carried
    val post10 = shB.select(
      F.col("id"), F.size(F.col("__sh")).as("n"), F.explode(F.col("__sh")).as("shingle"))
      .repartition(parts * 8, F.col("shingle"))
    val hot10 = post10.groupBy("shingle").count().filter(F.col("count") > 10000)
      .select("shingle")
    val cap10 = post10.join(F.broadcast(hot10), Seq("shingle"), "left_anti")
    val agg10 = cap10.select(F.col("shingle"), F.col("id").as("id_a"), F.col("n").as("n_a"))
      .join(cap10.select(F.col("shingle"), F.col("id").as("id_b"), F.col("n").as("n_b")), Seq("shingle"))
      .filter(F.col("id_a") < F.col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(F.count(F.lit(1)).as("common"),
        F.any_value(F.col("n_a")).as("n_a"), F.any_value(F.col("n_b")).as("n_b"))
      .withColumn("jaccard", F.round(F.col("common").cast("double") /
        (F.col("n_a") + F.col("n_b") - F.col("common")), 6))
      .filter(F.col("jaccard") >= 0.12)
      .select("id_a", "id_b", "jaccard")
    if (enabled("10")) time("10 8x partitions")(agg10)

    if (enabled("y")) {
      val base = agg.orderBy("id_a", "id_b").collect().toSeq
      val v7 = agg7.orderBy("id_a", "id_b").collect().toSeq
      println(s"[probe] variant7 == base: ${base == v7}  (n=${base.size})")
    }
    if (enabled("x")) {
      val base = agg.orderBy("id_a", "id_b").collect().toSeq
      val va = aggA.orderBy("id_a", "id_b").collect().toSeq
      val vb = aggB.orderBy("id_a", "id_b").collect().toSeq
      println(s"[probe] variantA == base: ${base == va}, variantB == base: ${base == vb}  (n=${base.size})")
    }
    spark.stop()
  }
}
