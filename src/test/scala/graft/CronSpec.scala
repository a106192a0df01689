package graft

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CronSchedule, Triggers}

/** The `schedule:<cron>` parameter engine (reference Quartz trigger,
  * `src/Indexer/Calls.cs:280-305`): parse/validate and deterministic
  * next-fire computation.
  */
class CronSpec extends AnyFunSuite {

  private def at(s: String): LocalDateTime = LocalDateTime.parse(s)

  test("parse accepts *, steps, ranges, lists; expands to the right sets") {
    val c = CronSchedule.parse("*/15 0 1,15 1-6/2 *")
    assert(c.minutes == Set(0, 15, 30, 45))
    assert(c.hours == Set(0))
    assert(c.daysOfMonth == Set(1, 15))
    assert(c.months == Set(1, 3, 5))
    assert(c.daysOfWeek == (0 to 6).toSet)
    // bare-value-with-step means "from value to max by step" (Quartz
    // "0/15"), not the value alone
    assert(CronSchedule.parse("0/15 * * * *").minutes == Set(0, 15, 30, 45))
    assert(CronSchedule.parse("5/20 * * * *").minutes == Set(5, 25, 45))
  }

  test("validation names the offending field") {
    def msg(expr: String): String =
      intercept[IllegalArgumentException](CronSchedule.parse(expr)).getMessage
    assert(msg("60 * * * *").contains("minute"))
    assert(msg("* 24 * * *").contains("hour"))
    assert(msg("* * 0 * *").contains("day-of-month"))
    assert(msg("* * * 13 *").contains("month"))
    assert(msg("* * * * 8").contains("day-of-week"))
    assert(msg("* * * *").contains("5 fields"))
    assert(msg("5-1 * * * *").contains("inverted"))
    assert(msg("*/0 * * * *").contains("step"))
    assert(msg("a * * * *").contains("non-numeric"))
    assert(CronSchedule.isValid("0 0 * * *") && !CronSchedule.isValid("not cron"))
  }

  test("next: minute/hour/day rollover, month boundary, leap year") {
    val daily = CronSchedule.parse("30 2 * * *")
    assert(daily.next(at("2026-03-10T02:29:00")) == at("2026-03-10T02:30"))
    assert(daily.next(at("2026-03-10T02:30:00")) == at("2026-03-11T02:30")) // strictly after
    val monthly = CronSchedule.parse("0 0 1 * *")
    assert(monthly.next(at("2026-01-31T23:59:00")) == at("2026-02-01T00:00"))
    val feb29 = CronSchedule.parse("0 12 29 2 *")
    assert(feb29.next(at("2026-03-01T00:00:00")) == at("2028-02-29T12:00"))
    // across the non-leap century year: 2096 -> 2104 is an 8-year gap
    assert(feb29.next(at("2096-03-01T00:00:00")) == at("2104-02-29T12:00"))
    // impossible date -> refuses instead of spinning
    intercept[IllegalArgumentException](
      CronSchedule.parse("0 0 31 2 *").next(at("2026-01-01T00:00:00")))
  }

  test("POSIX day semantics: dom OR dow when both restricted, AND with *") {
    // 2026-03-13 is a Friday (dow 5), 2026-03-15 a Sunday
    val both = CronSchedule.parse("0 0 15 * 5") // 15th OR any Friday
    assert(both.matches(at("2026-03-13T00:00:00")))
    assert(both.matches(at("2026-03-15T00:00:00")))
    assert(!both.matches(at("2026-03-14T00:00:00")))
    val domOnly = CronSchedule.parse("0 0 15 * *")
    assert(!domOnly.matches(at("2026-03-13T00:00:00")))
    val dowOnly = CronSchedule.parse("0 0 * * 7") // 7 == Sunday == 0
    assert(dowOnly.matches(at("2026-03-15T00:00:00")))
    assert(!dowOnly.matches(at("2026-03-13T00:00:00")))
    // Vixie star flag: "*/2" dom counts as UNrestricted, so dom AND dow
    // must both match (odd-day Mondays only, not odd-days-or-Mondays)
    val starStep = CronSchedule.parse("0 0 */2 * 1")
    assert(!starStep.matches(at("2026-03-13T00:00:00"))) // odd day, Friday
    assert(!starStep.matches(at("2026-03-16T00:00:00"))) // Monday, even day
    assert(starStep.matches(at("2026-03-23T00:00:00")))  // Monday, odd day
  }

  test("forSpec validates the cron before returning the trigger") {
    intercept[IllegalArgumentException](Triggers.forSpec("schedule:61 * * * *"))
  }

  test("Quartz dialect: seconds stripped, '?', SUN-SAT = 1-7, year '*'") {
    // the reference's worker configs are Quartz (Calls.cs
    // WithCronSchedule) — its canonical every-5-minutes string parses
    val q = CronSchedule.parse("0 0/5 * * * ?")
    assert(q.minutes == Set(0, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50, 55))
    assert(!q.dowRestricted && !q.domRestricted)
    // Quartz dow numbering: 1 = Sunday (POSIX 0), 2 = Monday, 7 = Saturday
    val sun = CronSchedule.parse("0 0 12 ? * 1")
    assert(sun.daysOfWeek == Set(0) && sun.dowRestricted)
    assert(sun.matches(at("2026-03-15T12:00:00")))  // a Sunday
    assert(!sun.matches(at("2026-03-16T12:00:00"))) // a Monday
    assert(CronSchedule.parse("0 30 8 ? * 2-6").daysOfWeek == Set(1, 2, 3, 4, 5))
    // 7-field form with an unrestricted year
    assert(CronSchedule.parse("0 15 10 ? * 7 *").daysOfWeek == Set(6))
    // refused, not mis-fired: year restriction and sub-minute seconds
    def msg(e: String) =
      intercept[IllegalArgumentException](CronSchedule.parse(e)).getMessage
    assert(msg("0 0 12 * * ? 2026").contains("year"))
    assert(msg("*/15 0 12 * * ?").contains("sub-minute"))
    assert(msg("0 0 12 * * 0").contains("day-of-week")) // Quartz dow is 1-7
    // POSIX dialect unchanged: '?' is not a POSIX token
    assert(!CronSchedule.isValid("0 12 ? * 1"))
  }

  test("month and day names parse in both dialects") {
    val posix = CronSchedule.parse("0 0 * JAN,jul MON-FRI")
    assert(posix.months == Set(1, 7) && posix.daysOfWeek == Set(1, 2, 3, 4, 5))
    val quartz = CronSchedule.parse("0 0 0 ? MAR SUN")
    assert(quartz.months == Set(3) && quartz.daysOfWeek == Set(0))
    assert(!CronSchedule.isValid("0 0 * BOB *"))
  }

  test("next() agrees with a brute-force minute scan on random schedules") {
    // next()'s skip logic (month jump, day jump, hour jump) must land on
    // EXACTLY the first matching minute — compare against the dumbest
    // possible implementation on frequently-firing random schedules
    val rnd = new scala.util.Random(20260812)
    def pick(min: Int, max: Int, n: Int): String =
      (0 until n).map(_ => min + rnd.nextInt(max - min + 1)).distinct.mkString(",")
    for (_ <- 1 to 40) {
      val expr = Seq(
        pick(0, 59, 2), pick(0, 23, 2),
        if (rnd.nextBoolean()) "*" else pick(1, 28, 3),
        "*",
        if (rnd.nextBoolean()) "*" else pick(0, 6, 3)).mkString(" ")
      val c = CronSchedule.parse(expr)
      val start = at("2026-01-01T00:00:00").plusMinutes(rnd.nextInt(500000))
      val got = c.next(start)
      var t = start.withSecond(0).withNano(0).plusMinutes(1)
      var guard = 0
      while (!c.matches(t) && guard < 120 * 24 * 60) { t = t.plusMinutes(1); guard += 1 }
      assert(guard < 120 * 24 * 60, s"$expr never fired in 120 days from $start")
      assert(got == t, s"$expr from $start: next()=$got brute=$t")
    }
  }
}
