package graft.streaming

import java.time.LocalDateTime

/** Parsed cron schedule — minute, hour, day-of-month, month,
  * day-of-week — the `<cron>` parameter of the reference's scheduled
  * trigger (LD-Reborn/embeddingsearch `src/Indexer/Calls.cs:280-305`,
  * Quartz). Round-3 mapped `schedule:<cron>` to an AvailableNow
  * trigger but never parsed the expression, so a typo surfaced only at
  * the external scheduler; now [[Triggers.forSpec]] validates it up
  * front and [[next]] gives any scheduler (or test) the deterministic
  * next fire time.
  *
  * Two dialects, distinguished by field count:
  *  - **5 fields** — POSIX/Vixie: day-of-week 0-7 with both 0 and 7 as
  *    Sunday.
  *  - **6 or 7 fields** — Quartz (the reference's dialect, so schedule
  *    strings carried over from its worker configs parse unchanged):
  *    a leading SECONDS field (validated, then truncated — it must be a
  *    single fixed value, sub-minute firing isn't representable here),
  *    `?` as "no specific value" in the day fields, day-of-week
  *    numbered 1-7 = SUN-SAT, and an optional trailing YEAR field that
  *    must be `*` (a year-restricted schedule is refused, not
  *    mis-fired).
  *
  * Supported per field: `*`, `a`, `a-b`, each optionally with a
  * `/step` suffix (steps also apply to `*`), comma lists of those, and
  * names (JAN-DEC, SUN-SAT, case-insensitive) in the month/day-of-week
  * fields. Standard POSIX/Vixie semantics for the day fields: when BOTH
  * day-of-month and day-of-week are restricted — i.e. do not BEGIN with
  * a star or `?` (a star with a step suffix counts as UNrestricted) — a
  * date matches if EITHER does; otherwise both must match.
  */
final case class CronSchedule(
    minutes: Set[Int],
    hours: Set[Int],
    daysOfMonth: Set[Int],
    months: Set[Int],
    daysOfWeek: Set[Int],
    domRestricted: Boolean,
    dowRestricted: Boolean) {

  def matches(t: LocalDateTime): Boolean = {
    val dayOk = {
      val domOk = daysOfMonth(t.getDayOfMonth)
      val dowOk = daysOfWeek(t.getDayOfWeek.getValue % 7) // java MON=1..SUN=7 -> SUN=0
      if (domRestricted && dowRestricted) domOk || dowOk else domOk && dowOk
    }
    minutes(t.getMinute) && hours(t.getHour) && months(t.getMonthValue) && dayOk
  }

  /** Next fire time strictly after `after`, truncated to the minute.
    * Bounded scan: any satisfiable 5-field schedule fires within 8 years
    * (the Feb-29 worst case is 8, not 4, across a non-leap century year:
    * 2096 → 2104); beyond that the schedule is impossible (e.g.
    * `0 0 31 2 *`) and this throws.
    */
  def next(after: LocalDateTime): LocalDateTime = {
    var t = after.withSecond(0).withNano(0).plusMinutes(1)
    val limit = after.plusYears(8)
    while (t.isBefore(limit)) {
      // skip in day-sized steps until the date part matches, then scan
      // the day's 1440 minutes via the hour/minute sets
      if (!months(t.getMonthValue)) {
        t = t.plusMonths(1).withDayOfMonth(1).withHour(0).withMinute(0)
      } else {
        val dayOk = {
          val domOk = daysOfMonth(t.getDayOfMonth)
          val dowOk = daysOfWeek(t.getDayOfWeek.getValue % 7)
          if (domRestricted && dowRestricted) domOk || dowOk else domOk && dowOk
        }
        if (!dayOk) t = t.plusDays(1).withHour(0).withMinute(0)
        else if (!hours(t.getHour)) t = t.plusHours(1).withMinute(0)
        else if (!minutes(t.getMinute)) t = t.plusMinutes(1)
        else return t
      }
    }
    throw new IllegalArgumentException(s"cron schedule never fires: $this")
  }
}

object CronSchedule {

  private final case class FieldSpec(
      name: String, min: Int, max: Int, names: Map[String, Int] = Map.empty)

  private val MonthNames = Seq("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
    "JUL", "AUG", "SEP", "OCT", "NOV", "DEC").zipWithIndex
    .map { case (n, i) => n -> (i + 1) }.toMap
  private def dayNames(sunday: Int): Map[String, Int] =
    Seq("SUN", "MON", "TUE", "WED", "THU", "FRI", "SAT").zipWithIndex
      .map { case (n, i) => n -> (sunday + i) }.toMap

  private val MinuteF = FieldSpec("minute", 0, 59)
  private val HourF = FieldSpec("hour", 0, 23)
  private val DomF = FieldSpec("day-of-month", 1, 31)
  private val MonthF = FieldSpec("month", 1, 12, MonthNames)
  // POSIX dow: 0-7, both 0 and 7 Sunday; Quartz dow: 1-7 = SUN-SAT
  private val DowPosixF = FieldSpec("day-of-week", 0, 7, dayNames(0))
  private val DowQuartzF = FieldSpec("day-of-week", 1, 7, dayNames(1))
  private val SecondF = FieldSpec("second", 0, 59)

  /** Parse and validate; throws IllegalArgumentException naming the bad
    * field (the error the round-3 gap deferred to the external scheduler).
    */
  def parse(expr: String): CronSchedule = {
    val parts = expr.trim.split("\\s+").toSeq
    parts.length match {
      case 5 => parseBody(expr, parts, quartz = false)
      case 6 | 7 =>
        // Quartz shape: [seconds] minute hour dom month dow [year]
        val secs = parseField(expr, SecondF, parts.head)
        if (secs.size != 1) throw new IllegalArgumentException(
          s"cron '$expr': second field '${parts.head}' fires more than once a minute — " +
            "sub-minute schedules are not representable here; use a single fixed second (e.g. 0)")
        if (parts.length == 7 && parts(6) != "*") throw new IllegalArgumentException(
          s"cron '$expr': year field '${parts(6)}' is unsupported — use '*' (every year)")
        parseBody(expr, parts.slice(1, 6), quartz = true)
      case n => throw new IllegalArgumentException(
        s"cron '$expr': expected 5 fields (minute hour day-of-month month day-of-week) " +
          s"or a Quartz 6/7-field expression, got $n")
    }
  }

  private def parseBody(expr: String, parts: Seq[String], quartz: Boolean): CronSchedule = {
    // Quartz '?' = "no specific value": same matching as '*', and
    // unrestricted for the dom/dow either-match rule
    def deQ(p: String): String = if (quartz && p == "?") "*" else p
    val (domPart, dowPart) = (deQ(parts(2)), deQ(parts(4)))
    val dowSpec = if (quartz) DowQuartzF else DowPosixF
    val dowRaw = parseField(expr, dowSpec, dowPart)
    val dow0 =
      if (quartz) dowRaw.map(_ - 1) // Quartz 1-7 = SUN-SAT -> 0-6
      else dowRaw.map(d => if (d == 7) 0 else d) // POSIX: 7 == Sunday == 0
    CronSchedule(
      minutes = parseField(expr, MinuteF, parts(0)),
      hours = parseField(expr, HourF, parts(1)),
      daysOfMonth = parseField(expr, DomF, domPart),
      months = parseField(expr, MonthF, parts(3)),
      daysOfWeek = dow0,
      // Vixie-family star flag: a field BEGINNING with '*' (including
      // "*/step") counts as unrestricted for the dom/dow either-match
      // rule — only explicit values/ranges restrict
      domRestricted = !domPart.startsWith("*"),
      dowRestricted = !dowPart.startsWith("*"))
  }

  def isValid(expr: String): Boolean =
    try { parse(expr); true } catch { case _: IllegalArgumentException => false }

  private def parseField(expr: String, f: FieldSpec, part: String): Set[Int] = {
    def fail(why: String): Nothing =
      throw new IllegalArgumentException(s"cron '$expr': ${f.name} $why")
    def num(s: String): Int = {
      val v = f.names.get(s.toUpperCase) match {
        case Some(n) => n
        case None =>
          try s.toInt catch { case _: NumberFormatException => fail(s"has non-numeric '$s'") }
      }
      if (v < f.min || v > f.max) fail(s"value $v outside [${f.min}, ${f.max}]")
      v
    }
    part.split(",", -1).toIndexedSeq.flatMap { term =>
      if (term.isEmpty) fail("has an empty list element")
      val (rangePart, step) = term.split("/", -1) match {
        case Array(r) => (r, 1)
        case Array(r, s) =>
          val st = try s.toInt catch { case _: NumberFormatException => fail(s"has non-numeric step '$s'") }
          if (st < 1) fail(s"step $st must be >= 1")
          (r, st)
        case _ => fail(s"has malformed term '$term'")
      }
      val hasStep = term.contains("/")
      val (lo, hi) = rangePart match {
        case "*" => (f.min, f.max)
        case r if r.contains("-") => r.split("-", -1) match {
          case Array(a, b) =>
            val (x, y) = (num(a), num(b))
            if (x > y) fail(s"range $x-$y is inverted")
            (x, y)
          case _ => fail(s"has malformed range '$r'")
        }
        // a bare value with a step ("0/15") means "from value to max by
        // step" in every cron dialect (Quartz included) — not the value
        // alone
        case n => val v = num(n); (v, if (hasStep) f.max else v)
      }
      (lo to hi by step)
    }.toSet
  }
}
