package graft.flow

import java.time.{Instant, ZoneId, ZonedDateTime}
import java.time.temporal.ChronoUnit
import scala.collection.mutable

/** A parsed five-field cron expression: minute, hour, day-of-month, month,
  * day-of-week, supporting `*`, values, comma lists, ranges `a-b`, and
  * steps (`*` or `a-b` followed by `/n`). Day-of-week accepts 0-7, both 0
  * and 7 meaning Sunday; standard cron either-match semantics apply when
  * BOTH day fields are restricted (reference: runner CronSchedule.scala —
  * same grammar, independent implementation).
  */
final case class CronSchedule(
    expression: String,
    minutes: Set[Int],
    hours: Set[Int],
    daysOfMonth: Set[Int],
    months: Set[Int],
    daysOfWeek: Set[Int],
    domRestricted: Boolean,
    dowRestricted: Boolean
) {
  def matches(t: ZonedDateTime): Boolean =
    minutes(t.getMinute) && hours(t.getHour) && months(t.getMonthValue) && dayMatches(t)

  private def dayMatches(t: ZonedDateTime): Boolean = {
    val dom = daysOfMonth(t.getDayOfMonth)
    val dow = daysOfWeek(t.getDayOfWeek.getValue % 7) // java MONDAY=1…SUNDAY=7; cron SUNDAY=0
    if (domRestricted && dowRestricted) dom || dow
    else if (domRestricted) dom
    else if (dowRestricted) dow
    else true
  }

  /** First matching minute strictly after `t`. */
  def nextAfter(t: ZonedDateTime): ZonedDateTime = {
    var c = t.truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
    val limit = t.plusYears(4)
    while (!matches(c)) {
      c =
        if (!months(c.getMonthValue) || !dayMatches(c))
          c.plusDays(1).truncatedTo(ChronoUnit.DAYS)
        else c.plusMinutes(1)
      if (c.isAfter(limit))
        throw new IllegalArgumentException(s"cron '$expression' never fires")
    }
    c
  }
}

object CronSchedule {
  def parse(expr: String): CronSchedule = {
    val fields = expr.trim.split("\\s+")
    require(fields.length == 5, s"cron '$expr' must have 5 fields, got ${fields.length}")
    def field(f: String, lo: Int, hi: Int, wrap7: Boolean = false): (Set[Int], Boolean) = {
      val out = mutable.Set.empty[Int]
      var restricted = false
      f.split(',').foreach { part0 =>
        val (part, step) = part0.split('/') match {
          case Array(p, s) => (p, s.toInt)
          case Array(p) => (p, 1)
        }
        require(step >= 1, s"cron '$expr': step must be >= 1")
        val (a, b) =
          if (part == "*") (lo, hi)
          else {
            restricted = true
            part.split('-') match {
              case Array(x, y) => (x.toInt, y.toInt)
              case Array(x) => (x.toInt, x.toInt)
            }
          }
        if (part0.contains("/")) restricted = true
        require(a >= lo && b <= (if (wrap7) hi + 1 else hi) && a <= b,
          s"cron '$expr': field '$part0' out of range [$lo, $hi]")
        (a to b by step).foreach(v => out += (if (wrap7 && v == 7) 0 else v))
      }
      (out.toSet, restricted)
    }
    val (mi, _) = field(fields(0), 0, 59)
    val (ho, _) = field(fields(1), 0, 23)
    val (dom, domR) = field(fields(2), 1, 31)
    val (mo, _) = field(fields(3), 1, 12)
    val (dow, dowR) = field(fields(4), 0, 6, wrap7 = true)
    CronSchedule(expr, mi, ho, dom, mo, dow, domR, dowR)
  }
}

/** Evaluates flow cron schedules and triggers due runs. The clock is
  * injectable so ticks are fake-clock testable; `start()` drives ticks from
  * a daemon thread for real deployments. The scheduler decides WHEN — the
  * trigger decides what a run means (reference: runner FlowScheduler.scala
  * separation of schedule evaluation from execution). */
final class FlowScheduler(
    clock: () => Instant = () => Instant.now(),
    zone: ZoneId = ZoneId.of("UTC")
) {
  private final case class Entry(name: String, cron: CronSchedule,
      trigger: () => Unit, zone: ZoneId)
  private val entries = mutable.LinkedHashMap.empty[String, Entry]
  private val nextFire = mutable.Map.empty[String, ZonedDateTime]
  @volatile private var thread: Thread = null
  @volatile private var stopped = false

  /** Register a schedule; `zoneOverride` evaluates THIS flow's cron fields
    * in its own timezone (the flow-level `timezone: '…'` config — a
    * `0 2 * * *` Tokyo schedule fires at 2am Tokyo regardless of the
    * scheduler's default zone). */
  def register(name: String, cronExpr: String, trigger: () => Unit,
      zoneOverride: Option[ZoneId] = None): Unit =
    synchronized {
      entries(name) = Entry(name, CronSchedule.parse(cronExpr), trigger,
        zoneOverride.getOrElse(zone))
      nextFire.remove(name)
    }

  /** Evaluate all schedules against the injected clock; fire due flows.
    * Returns the names fired this tick. A flow fires at most once per tick
    * even if several matching minutes elapsed (missed-window catch-up is
    * the run store's job, not the scheduler's). */
  def tick(): List[String] = synchronized {
    val instant = clock()
    val fired = List.newBuilder[String]
    entries.values.foreach { e =>
      val now = ZonedDateTime.ofInstant(instant, e.zone)
      val due = nextFire.getOrElseUpdate(e.name,
        if (e.cron.matches(now.truncatedTo(ChronoUnit.MINUTES))) now.truncatedTo(ChronoUnit.MINUTES)
        else e.cron.nextAfter(now))
      if (!now.isBefore(due)) {
        try e.trigger()
        catch { case scala.util.control.NonFatal(_) => () } // a failing run must not kill the scheduler
        fired += e.name
        nextFire(e.name) = e.cron.nextAfter(now)
      }
    }
    fired.result()
  }

  def start(periodMs: Long = 15000): Unit = synchronized {
    if (thread != null) return
    stopped = false
    thread = new Thread(() => {
      while (!stopped) {
        tick()
        try Thread.sleep(periodMs)
        catch { case _: InterruptedException => () }
      }
    }, "graft-flow-scheduler")
    thread.setDaemon(true)
    thread.start()
  }

  def stop(): Unit = {
    stopped = true
    val t = thread
    if (t != null) { t.interrupt(); thread = null }
  }
}
