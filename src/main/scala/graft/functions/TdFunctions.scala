package graft.functions

import org.apache.spark.sql.SparkSession

/** Treasure-Data time UDFs used by the reference's Hive corpus
  * (spec/sql/hive/td-time-functions.sql; the reference parses them as plain
  * function calls — SqlParser.scala treats TD_* as ordinary identifiers).
  *
  * Semantics follow the public TD docs: times are unix seconds (numeric) or
  * 'yyyy-MM-dd[ HH:mm:ss]' strings; TD_TIME_RANGE is start-inclusive /
  * end-exclusive with null bounds open; TD_TIME_ADD applies a '-1h'/'2d'
  * style offset; TD_TIME_FORMAT renders in a named time zone (short ids
  * like 'JST' resolve via the JDK zone alias table).
  *
  * Registered as session UDFs for the SQL front-end only — these are
  * dialect-compat shims for scripted queries, not hot-path operators (the
  * corpus calls them on WHERE clauses of modest scans; a native Expression
  * would buy nothing measurable here).
  */
object TdFunctions {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** Unix seconds from a TD time value: numeric seconds or a local
    * datetime string (UTC — the session zone these specs pin). */
  private def parseTime(v: String): Long = {
    val s = if (v == null) null else v.trim
    if (s == null || s.isEmpty) throw new IllegalArgumentException("null TD time")
    else if (s.matches("-?\\d+")) s.toLong
    else if (s.matches("-?\\d+\\.\\d+")) s.toDouble.toLong
    else {
      val norm = if (s.matches("\\d{4}-\\d{2}-\\d{2}")) s + " 00:00:00" else s
      java.time.LocalDateTime
        .parse(norm.replace(' ', 'T'))
        .toEpochSecond(java.time.ZoneOffset.UTC)
    }
  }

  /** '-1h' / '2d' / '30m' / '45s' / compound '1d12h' → signed seconds. */
  private def durationSeconds(d: String): Long = {
    val s = d.trim
    val neg = s.startsWith("-")
    val body = s.stripPrefix("-").stripPrefix("+")
    val unit = Map('d' -> 86400L, 'h' -> 3600L, 'm' -> 60L, 's' -> 1L)
    val re = """(\d+)([dhms])""".r
    val parts = re.findAllMatchIn(body).map(m => m.group(1).toLong * unit(m.group(2).head)).toList
    val total =
      if (parts.nonEmpty) parts.sum
      else if (body.matches("\\d+")) body.toLong // bare number = seconds
      else throw new IllegalArgumentException(s"bad TD duration: $d")
    if (neg) -total else total
  }

  private def zone(tz: String): java.time.ZoneId =
    java.time.ZoneId.of(tz, java.time.ZoneId.SHORT_IDS)

  /** Idempotent per-session registration (called by the SQL front-end). */
  def ensureRegistered(spark: SparkSession): Unit = {
    if (!registered.add(System.identityHashCode(spark))) return
    spark.udf.register("td_time_add",
      (t: String, d: String) => parseTime(t) + durationSeconds(d))
    spark.udf.register("td_time_range",
      (t: String, start: String, end: String) => {
        val tv = parseTime(t)
        (start == null || start.trim.isEmpty || tv >= parseTime(start)) &&
          (end == null || end.trim.isEmpty || tv < parseTime(end))
      })
    spark.udf.register("td_time_format",
      (t: String, fmt: String, tz: String) => {
        val zid = if (tz == null || tz.trim.isEmpty) java.time.ZoneOffset.UTC else zone(tz)
        java.time.Instant.ofEpochSecond(parseTime(t)).atZone(zid)
          .format(java.time.format.DateTimeFormatter.ofPattern(fmt))
      })
  }
}
