package graft.analytics

import java.time.{DayOfWeek, LocalDate}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** NYSE trading-session calendar GENERATED from holiday rules — the
  * engine-side replacement for the reference's `pandas_market_calendars`
  * session sets (`stage0/create_daily_enhanced_trace.py:1397-1456`),
  * feeding the F6 calendar semi-join and [[BondMath]]'s business-day
  * arithmetic.
  *
  * Rules (NYSE):
  *  - weekends closed
  *  - fixed holidays with weekend observation: Sun→Mon; Sat→preceding
  *    Fri, EXCEPT New Year's Day — when Jan 1 falls on Saturday there is
  *    no observance at all (Dec 31, 2021 was a full session)
  *  - floating holidays: MLK (3rd Mon Jan, observed since 1998),
  *    Washington's Birthday (3rd Mon Feb), Good Friday (computus),
  *    Memorial Day (last Mon May), Labor Day (1st Mon Sep),
  *    Thanksgiving (4th Thu Nov)
  *  - Juneteenth (Jun 19, observed) since 2022
  *  - one-off closures: 9/11 week (2001-09-11..14), Reagan funeral
  *    (2004-06-11), Ford funeral (2007-01-02), Hurricane Sandy
  *    (2012-10-29/30), G.H.W. Bush funeral (2018-12-05), Carter funeral
  *    (2025-01-09)
  *
  * `TradingCalendarSpec` pins per-year session counts for 2002–2025 and
  * the observed dates of every shift case; the F6 driver row replays the
  * same rule set in pure DuckDB SQL (computus included), so the two
  * derivations are independent.
  */
object TradingCalendar {

  /** Gregorian Easter Sunday (anonymous/Meeus algorithm). */
  def easter(year: Int): LocalDate = {
    val a = year % 19; val b = year / 100; val c = year % 100
    val d = b / 4; val e = b % 4; val f = (b + 8) / 25
    val g = (b - f + 1) / 3; val h = (19 * a + b - d - g + 15) % 30
    val i = c / 4; val k = c % 4; val l = (32 + 2 * e + 2 * i - h - k) % 7
    val m = (a + 11 * h + 22 * l) / 451
    val month = (h + l - 7 * m + 114) / 31
    val day = ((h + l - 7 * m + 114) % 31) + 1
    LocalDate.of(year, month, day)
  }

  private def nthWeekday(year: Int, month: Int, dow: DayOfWeek, n: Int): LocalDate = {
    var d = LocalDate.of(year, month, 1)
    while (d.getDayOfWeek != dow) d = d.plusDays(1)
    d.plusDays(7L * (n - 1))
  }

  private def lastWeekday(year: Int, month: Int, dow: DayOfWeek): LocalDate = {
    var d = LocalDate.of(year, month, 1).plusMonths(1).minusDays(1)
    while (d.getDayOfWeek != dow) d = d.minusDays(1)
    d
  }

  /** fixed-date holiday with weekend observation (Sat→Fri, Sun→Mon) */
  private def observed(d: LocalDate): Option[LocalDate] = d.getDayOfWeek match {
    case DayOfWeek.SATURDAY => Some(d.minusDays(1))
    case DayOfWeek.SUNDAY => Some(d.plusDays(1))
    case _ => Some(d)
  }

  /** New Year's observation: Sat → NOT observed (the preceding Friday
    * belongs to the prior accounting year and the NYSE stays open).
    */
  private def newYear(year: Int): Option[LocalDate] =
    LocalDate.of(year, 1, 1).getDayOfWeek match {
      case DayOfWeek.SATURDAY => None
      case DayOfWeek.SUNDAY => Some(LocalDate.of(year, 1, 2))
      case _ => Some(LocalDate.of(year, 1, 1))
    }

  /** Unscheduled full-day closures (market disruptions, funerals). */
  val specialClosures: Set[LocalDate] = Set(
    LocalDate.of(2001, 9, 11), LocalDate.of(2001, 9, 12),
    LocalDate.of(2001, 9, 13), LocalDate.of(2001, 9, 14),
    LocalDate.of(2004, 6, 11),
    LocalDate.of(2007, 1, 2),
    LocalDate.of(2012, 10, 29), LocalDate.of(2012, 10, 30),
    LocalDate.of(2018, 12, 5),
    LocalDate.of(2025, 1, 9))

  /** Rule-based holiday set for one year (weekend-observed, year-gated
    * rules applied; one-offs included).
    */
  def holidays(year: Int): Set[LocalDate] = {
    val rules = Seq(
      newYear(year),
      if (year >= 1998) Some(nthWeekday(year, 1, DayOfWeek.MONDAY, 3)) else None,
      Some(nthWeekday(year, 2, DayOfWeek.MONDAY, 3)),
      Some(easter(year).minusDays(2)),
      Some(lastWeekday(year, 5, DayOfWeek.MONDAY)),
      if (year >= 2022) observed(LocalDate.of(year, 6, 19)) else None,
      observed(LocalDate.of(year, 7, 4)),
      Some(nthWeekday(year, 9, DayOfWeek.MONDAY, 1)),
      Some(nthWeekday(year, 11, DayOfWeek.THURSDAY, 4)),
      observed(LocalDate.of(year, 12, 25)))
    rules.flatten.toSet ++ specialClosures.filter(_.getYear == year)
  }

  private val holidayCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Set[LocalDate]]()

  private def cachedHolidays(year: Int): Set[LocalDate] =
    holidayCache.computeIfAbsent(year, y => holidays(y))

  def isSession(d: LocalDate): Boolean =
    d.getDayOfWeek != DayOfWeek.SATURDAY &&
      d.getDayOfWeek != DayOfWeek.SUNDAY &&
      !cachedHolidays(d.getYear).contains(d)

  /** All sessions in [from, to], inclusive. */
  def sessions(from: LocalDate, to: LocalDate): Seq[LocalDate] =
    Iterator.iterate(from)(_.plusDays(1))
      .takeWhile(!_.isAfter(to))
      .filter(isSession)
      .toSeq

  /** The session set as a one-column (`valid_dt` DATE) dimension table —
    * a few hundred rows per year, always broadcast-joined.
    */
  def table(spark: SparkSession, from: LocalDate, to: LocalDate): DataFrame = {
    import spark.implicits._
    sessions(from, to).map(java.sql.Date.valueOf).toDF("valid_dt")
  }
}
