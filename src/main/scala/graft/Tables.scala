package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Resolver for the driver-generated TPC-H-ish testdata directory
  * (TESTDATA.md): `region nation customer supplier part orders lineitem
  * events documents embeddings`, one parquet per table.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** SparkSession configs needed to read the testdata (events.parquet uses
    * nanosecond timestamps, which Spark only reads as long). */
  def sessionConfigs: Map[String, String] = extraConfigs ++ Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    // optimization r18 (guide §3.1): let AQE rewrite a sort-merge join to a
    // shuffled-hash join at runtime when EVERY post-shuffle partition of
    // the build side is under 64 MB — skips both sort passes. Scale-safe by
    // construction: the decision is made per-partition from RUNTIME sizes
    // (default 0 disables the rewrite), so 100 TB partitions above the
    // threshold keep the spill-friendly SMJ. Interleaved A/B over the 10
    // join-heaviest TPC-DS rows: 3/3 paired wins, ~2%.
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "67108864",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.parquet.filterPushdown" -> "true",
    // ANSI double-quoted identifiers in raw SQL ("id" = identifier, not
    // string) — the flow language has its own scanner, this only affects
    // the sql"…" escape hatch and the SQL front-end
    "spark.sql.ansi.doubleQuotedIdentifiers" -> "true"
  )

  /** Experiment hook (optimization rounds): extra session configs from
    * SPARK_GRAFT_EXTRA_CONF ("k=v;k=v"), applied BEFORE the fixed map so
    * the data-compat configs can never be overridden. */
  private def extraConfigs: Map[String, String] =
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .map { kv => val i = kv.indexOf('='); kv.take(i) -> kv.drop(i + 1) }
      .toMap

  /** Read a table from `dir`, normalizing the event-time column's physical
    * flavor. The driver has regenerated testdata with different `ts`
    * encodings across rounds (nanosecond int64 in r1-r7, naive
    * `timestamp[us]` → TIMESTAMP_NTZ in r8); each flip broke analysis
    * until tolerated. All flavors that DuckDB reads as a timestamp are
    * normalized here to the same instants (UTC session tz):
    *   - long (nanos): integral-div to micros — `/` would promote to
    *     double and ns epoch values (~1.7e18) exceed double's 2^53 exact
    *     range, off-by-1µs vs DuckDB
    *   - string (ISO-8601): to_timestamp
    *   - TIMESTAMP_NTZ stays NTZ at read (schema fidelity for SHOW/
    *     DESCRIBE); epoch/watermark call sites coerce via EpochTime,
    *     gated in NtzRobustnessSpec */
  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Memoized per (session, dir, name, dir fingerprint) — optimization r18
    // (guide §1): a fresh spark.read.parquet re-reads the footer and builds
    // a new file index EVERY time (~60-90 ms/table locally), and catalog
    // queries construct 1-4 table reads per bench run — ~0.2 s of pure
    // metadata re-derivation per row. The fingerprint (file count + bytes +
    // newest mtime, the same signal the persisted-index caches trust)
    // invalidates on any rewrite of the dir, so DML/CTAS refreshes are
    // never served a stale file listing. Only the READ PLAN is memoized —
    // every query still scans parquet at execution.
    val memo = readMemo.computeIfAbsent(spark,
      _ => scala.collection.concurrent.TrieMap.empty[(String, String), (String, DataFrame)])
    val fp = directoryFingerprint(spark, dir).getOrElse("__missing__")
    memo.get((dir, name)) match {
      case Some((`fp`, df)) => df
      case _ =>
        val df = readFresh(spark, dir, name)
        memo.put((dir, name), (fp, df))
        df
    }
  }

  // Explicit bounded LRU, NOT a WeakHashMap: the memoized DataFrames hold
  // their SparkSession through queryExecution, so weak keys never become
  // collectable (the value→key strong path defeats the WeakHashMap) and
  // sessions/plans would leak for the JVM lifetime (r18 advice). Access-order
  // LRU capped at MaxMemoSessions keeps the worst case bounded and explicit:
  // the bench/verify JVMs hold 1-2 sessions, the test JVM cycles through
  // many — evicted sessions just fall back to a fresh footer read.
  private val MaxMemoSessions = 32
  private val readMemo =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[SparkSession,
          scala.collection.concurrent.TrieMap[(String, String), (String, DataFrame)]](
          16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[SparkSession,
              scala.collection.concurrent.TrieMap[(String, String), (String, DataFrame)]]): Boolean =
          size() > MaxMemoSessions
      })

  /** Memoized raw parquet read of an arbitrary path (single file or dir),
    * fingerprint-gated exactly like [[read]] — for the persisted-index and
    * reference-corpus read sites that pay a fresh footer+file-index pass
    * per query construction. */
  def readPath(spark: SparkSession, path: String): DataFrame = {
    val memo = readMemo.computeIfAbsent(spark,
      _ => scala.collection.concurrent.TrieMap.empty[(String, String), (String, DataFrame)])
    val fp = pathFingerprint(spark, path)
    memo.get(("__path__", path)) match {
      case Some((`fp`, df)) => df
      case _ =>
        val df = spark.read.parquet(path)
        memo.put(("__path__", path), (fp, df))
        df
    }
  }

  private def pathFingerprint(spark: SparkSession, path: String): String = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) "__missing__"
    else {
      val st = fs.getFileStatus(hPath)
      if (st.isDirectory) directoryFingerprint(spark, path).getOrElse("__empty__")
      else s"${st.getLen}:${st.getModificationTime}"
    }
  }

  private def readFresh(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(_.name == "ts") match {
      case Some(f) if f.dataType.typeName == "long" =>
        df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
      case Some(f) if f.dataType.typeName == "string" =>
        df.withColumn("ts", F.to_timestamp(F.col("ts")))
      case _ => df
    }
  }

  def resolver(spark: SparkSession, dir: String): String => DataFrame =
    name => read(spark, dir, name)

  /** One cheap root listing summarizing a data directory: data-file count +
    * total bytes + newest mtime — changes on any rewrite (a CTAS refresh
    * replaces all three; a no-op batch changes none). None when the path is
    * missing or holds no data files. Shared by the persisted-index caches
    * (streaming Subscribe, Similarity's small-index memo): total-bytes +
    * DIRECTORY mtime alone is too weak — object stores synthesize directory
    * mtimes, so a same-size rewrite could serve a stale cache forever. */
  private[graft] def directoryFingerprint(spark: SparkSession, path: String): Option[String] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) None
    else {
      val files = fs.listStatus(hPath).filterNot(_.getPath.getName.startsWith("_"))
      if (files.isEmpty) None
      else Some(s"${files.length}:${files.map(_.getLen).sum}:${files.map(_.getModificationTime).max}")
    }
  }
}
