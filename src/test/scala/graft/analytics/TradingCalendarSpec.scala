package graft.analytics

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite

/** Pins the rule-generated NYSE calendar against externally-known
  * session counts and the dates of every observation-shift case. Counts
  * are the published NYSE trading-day totals (the fixture the VERDICT
  * asked for): 9 scheduled holidays/year through 2021, 10 from 2022
  * (Juneteenth), minus the one-off closures.
  */
class TradingCalendarSpec extends AnyFunSuite {

  private def count(year: Int): Int =
    TradingCalendar.sessions(
      LocalDate.of(year, 1, 1), LocalDate.of(year, 12, 31)).size

  test("per-year session counts 2002-2025 match the NYSE totals") {
    val expected = Map(
      2002 -> 252, 2003 -> 252, 2004 -> 252, // 2004: Reagan funeral Jun 11
      2005 -> 252, 2006 -> 251, 2007 -> 251, // 2007: Ford funeral Jan 2
      2008 -> 253, 2009 -> 252, 2010 -> 252,
      2011 -> 252, 2012 -> 250,              // 2012: Sandy Oct 29-30
      2013 -> 252, 2014 -> 252, 2015 -> 252,
      2016 -> 252, 2017 -> 251, 2018 -> 251, // 2018: Bush funeral Dec 5
      2019 -> 252, 2020 -> 253, 2021 -> 252,
      2022 -> 251, 2023 -> 250, 2024 -> 252,
      2025 -> 250)                           // 2025: Carter funeral Jan 9
    val got = expected.keys.map(y => y -> count(y)).toMap
    assert(got == expected,
      expected.keys.toSeq.sorted
        .filter(y => got(y) != expected(y))
        .map(y => s"$y: got ${got(y)} expected ${expected(y)}").mkString("; "))
  }

  test("observation shifts and year gates") {
    def closed(d: String) = !TradingCalendar.isSession(LocalDate.parse(d))
    // Sat July 4 2020 -> observed Friday
    assert(closed("2020-07-03") && !closed("2020-07-06"))
    // Sat Christmas 2021 -> observed Friday
    assert(closed("2021-12-24"))
    // Sat New Year 2022 -> NOT observed: Dec 31 2021 was a full session
    assert(!closed("2021-12-31"))
    // Sun New Year 2023 -> observed Monday
    assert(closed("2023-01-02"))
    // Juneteenth: observed Mon 2022-06-20 (Jun 19 Sunday), but NOT in 2021
    assert(closed("2022-06-20") && !closed("2021-06-18"))
    // MLK since 1998 only
    assert(closed("1998-01-19") && !closed("1997-01-20"))
    // floating holidays, one instance each
    assert(closed("2024-01-15"))  // MLK
    assert(closed("2024-02-19"))  // Washington
    assert(closed("2024-03-29"))  // Good Friday (Easter 2024-03-31)
    assert(closed("2024-05-27"))  // Memorial
    assert(closed("2024-09-02"))  // Labor
    assert(closed("2023-11-23"))  // Thanksgiving
    // one-off closures
    assert(closed("2001-09-11") && closed("2001-09-14"))
    assert(closed("2012-10-29") && closed("2012-10-30"))
    assert(closed("2025-01-09"))
  }

  test("easter computus spot checks") {
    assert(TradingCalendar.easter(2000) == LocalDate.of(2000, 4, 23))
    assert(TradingCalendar.easter(2008) == LocalDate.of(2008, 3, 23))
    assert(TradingCalendar.easter(2024) == LocalDate.of(2024, 3, 31))
    assert(TradingCalendar.easter(2038) == LocalDate.of(2038, 4, 25))
  }

  test("T+2 settlement steps across holidays, not just weekends") {
    // Wed before Good Friday 2024: T+2 = Thu + (skip GF, weekend) Mon
    assert(BondMath.addBusinessDays(LocalDate.parse("2024-03-27"), 2)
      == LocalDate.parse("2024-04-01"))
    // Wed before observed-Christmas Fri 2021: T+2 lands Monday
    assert(BondMath.addBusinessDays(LocalDate.parse("2021-12-22"), 2)
      == LocalDate.parse("2021-12-27"))
    // plain weekend case unchanged
    assert(BondMath.addBusinessDays(LocalDate.parse("2024-08-08"), 2)
      == LocalDate.parse("2024-08-12"))
  }
}
