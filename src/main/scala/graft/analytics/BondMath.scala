package graft.analytics

import java.time.{DayOfWeek, LocalDate}

/** Native Scala bond analytics — the JVM replacement for the reference's
  * QuantLib per-row compute (X1, `stage1/helper_functions.py:54-250`):
  * NYSE-style business calendar with ModifiedFollowing adjustment and T+2
  * settlement, backward coupon schedule generation, four day-count
  * conventions, Newton YTM solve from the clean price, Macaulay/modified
  * duration, convexity, and accrued/accumulated interest.
  *
  * Semantics follow the reference's QuantLib configuration: compounded
  * discounting at the bond's frequency with day-count year fractions from
  * settlement, accrued from the last accrual start, coupon amounts from
  * per-period accrual fractions. Zero-coupon bonds discount the redemption
  * only, at Annual frequency (the reference's override).
  */
object BondMath {

  // ---- calendar ------------------------------------------------------
  // Holiday rules live in [[TradingCalendar]] (rule-generated sessions,
  // year-gated MLK/Juneteenth, the Saturday-New-Year non-observance, and
  // the one-off closures) so schedules, T+2 settlement and the F6
  // session table all read the SAME calendar.

  /** rule-generated NYSE holiday set for one year */
  def nyseHolidays(year: Int): Set[LocalDate] = TradingCalendar.holidays(year)

  def isBusinessDay(d: LocalDate): Boolean = TradingCalendar.isSession(d)

  /** ModifiedFollowing: next business day unless it crosses a month end,
    * then previous business day.
    */
  def modifiedFollowing(d: LocalDate): LocalDate = {
    var f = d
    while (!isBusinessDay(f)) f = f.plusDays(1)
    if (f.getMonth != d.getMonth) {
      var p = d
      while (!isBusinessDay(p)) p = p.minusDays(1)
      p
    } else f
  }

  /** advance n business days (T+n settlement). */
  def addBusinessDays(d: LocalDate, n: Int): LocalDate = {
    var cur = d; var left = n
    while (left > 0) {
      cur = cur.plusDays(1)
      if (isBusinessDay(cur)) left -= 1
    }
    cur
  }

  // ---- day counts ----------------------------------------------------

  /** year fraction under the named basis (30/360 bond basis, ACT/ACT ISDA,
    * ACT/360, ACT/365F — `stage1/helper_functions.py:83-94`).
    */
  def yearFraction(basis: String, d1: LocalDate, d2: LocalDate): Double = basis match {
    case "30/360" | "" =>
      val dd1 = math.min(d1.getDayOfMonth, 30)
      val dd2 = if (dd1 == 30 && d2.getDayOfMonth == 31) 30 else d2.getDayOfMonth
      (360 * (d2.getYear - d1.getYear) + 30 * (d2.getMonthValue - d1.getMonthValue)
        + (dd2 - dd1)) / 360.0
    case "ACT/360" =>
      java.time.temporal.ChronoUnit.DAYS.between(d1, d2) / 360.0
    case "ACT/365" | "ACT/366" =>
      java.time.temporal.ChronoUnit.DAYS.between(d1, d2) / 365.0
    case "ACT/ACT" =>
      // ISDA: split at year boundaries, actual/actual-year-length
      if (!d2.isAfter(d1)) 0.0
      else {
        var acc = 0.0
        var y = d1.getYear
        var cur = d1
        while (y < d2.getYear) {
          val yEnd = LocalDate.of(y + 1, 1, 1)
          val len = if (LocalDate.of(y, 1, 1).isLeapYear) 366.0 else 365.0
          acc += java.time.temporal.ChronoUnit.DAYS.between(cur, yEnd) / len
          cur = yEnd; y += 1
        }
        val len = if (LocalDate.of(y, 1, 1).isLeapYear) 366.0 else 365.0
        acc + java.time.temporal.ChronoUnit.DAYS.between(cur, d2) / len
      }
    case other => throw new IllegalArgumentException(s"invalid day_count_basis $other")
  }

  // ---- schedule ------------------------------------------------------

  /** one coupon period: unadjusted accrual [start, end), adjusted payment */
  final case class Period(accrualStart: LocalDate, accrualEnd: LocalDate, payDate: LocalDate)

  /** backward generation from maturity (QuantLib DateGeneration.Backward):
    * unadjusted accrual dates stepping -12/freq months from maturity,
    * clipped at the effective date; payment dates ModifiedFollowing.
    */
  def schedule(effective: LocalDate, maturity: LocalDate, freq: Int): Seq[Period] = {
    val stepMonths = 12 / freq
    var dates = List(maturity)
    var d = maturity.minusMonths(stepMonths)
    while (d.isAfter(effective)) {
      dates = d :: dates
      d = d.minusMonths(stepMonths)
    }
    dates = effective :: dates
    dates.sliding(2).map { case List(a, b) =>
      Period(a, b, modifiedFollowing(b))
    }.toSeq
  }

  // ---- analytics -----------------------------------------------------

  final case class Analytics(
      ytm: Double, prclean: Double, prfull: Double,
      acclast: Double, accpmt: Double, accall: Double,
      macDur: Double, modDur: Double, convexity: Double,
      settlement: LocalDate)

  final case class Spec(
      couponPct: Double,        // annual coupon in percent of par
      couponType: String,       // 'F' fixed / 'Z' zero
      frequency: Int,           // 1, 2, 4, 12 (coupon bonds)
      dayCount: String,         // 30/360, ACT/ACT, ACT/360, ACT/365
      datedDate: LocalDate,     // accrual start
      maturity: LocalDate)

  /** full analytics from a clean market price on a trade date; None when
    * settlement ≥ maturity or inputs are non-finite.
    */
  def analyze(spec: Spec, cleanPrice: Double, tradeDate: LocalDate): Option[Analytics] = {
    if (!java.lang.Double.isFinite(cleanPrice)) return None
    val settle = addBusinessDays(tradeDate, 2)
    if (!settle.isBefore(spec.maturity)) return None

    val isZero = spec.couponType == "Z" ||
      (spec.couponType == "F" && (spec.couponPct == 0.0 || spec.couponPct.isNaN)
        && cleanPrice < 100)
    val freq = if (isZero) 1 else spec.frequency
    val c = spec.couponPct / 100.0

    // cashflows after settlement: (yearFraction from settlement, amount)
    val (flows, acclast, accpmt) =
      if (isZero) {
        val t = yearFraction(spec.dayCount, settle, spec.maturity)
        (Seq((t, 100.0)), 0.0, 0.0)
      } else {
        val sched = schedule(spec.datedDate, spec.maturity, freq)
        val amounts = sched.map(p =>
          100.0 * c * yearFraction(spec.dayCount, p.accrualStart, p.accrualEnd))
        val future = sched.zip(amounts).collect {
          case (p, a) if p.payDate.isAfter(settle) =>
            val redemption = if (p.accrualEnd == spec.maturity) 100.0 else 0.0
            (yearFraction(spec.dayCount, settle, p.payDate), a + redemption)
        }
        val past = sched.zip(amounts).collect {
          case (p, a) if !p.payDate.isAfter(settle) => a
        }.sum
        val accrued = sched.find(p =>
            !p.accrualStart.isAfter(settle) && p.accrualEnd.isAfter(settle))
          .map(p => 100.0 * c * yearFraction(spec.dayCount, p.accrualStart, settle))
          .getOrElse(0.0)
        (future, accrued, past)
      }
    if (flows.isEmpty) return None

    val m = freq.toDouble
    def pv(y: Double): Double =
      flows.map { case (t, a) => a * math.pow(1.0 + y / m, -m * t) }.sum
    def dPv(y: Double): Double =
      flows.map { case (t, a) => -t * a * math.pow(1.0 + y / m, -m * t - 1) }.sum

    val target = cleanPrice + acclast
    var y = 0.05
    var iter = 0
    var done = false
    while (iter < 100 && !done) {
      val f = pv(y) - target
      val fp = dPv(y)
      if (math.abs(f) < 1e-10 || fp == 0.0) done = true
      else {
        var next = y - f / fp
        if (next <= -m + 1e-6) next = (y - m + 1e-6) / 2
        if (math.abs(next - y) < 1e-14) done = true
        y = next
      }
      iter += 1
    }
    if (!java.lang.Double.isFinite(y)) return None

    val price = pv(y)
    val weighted = flows.map { case (t, a) => t * a * math.pow(1.0 + y / m, -m * t) }.sum
    val mac = weighted / price
    val mod = mac / (1.0 + y / m)
    val conv = flows.map { case (t, a) =>
      a * t * (t + 1.0 / m) * math.pow(1.0 + y / m, -m * t)
    }.sum / (price * math.pow(1.0 + y / m, 2))

    Some(Analytics(y, price - acclast, price, acclast, accpmt, acclast + accpmt,
      mac, mod, conv, settle))
  }
}
