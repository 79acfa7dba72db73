package graft.analytics

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite

/** Analytic golden cases for the native bond math (X1). */
class BondMathSpec extends AnyFunSuite {

  test("zero-coupon: YTM matches the closed form (100/P)^(1/t) - 1") {
    val trade = LocalDate.of(2024, 3, 4) // Monday → settle Wed 2024-03-06
    val spec = BondMath.Spec(
      couponPct = 0.0, couponType = "Z", frequency = 2,
      dayCount = "ACT/365",
      datedDate = LocalDate.of(2020, 3, 6),
      maturity = LocalDate.of(2029, 3, 6))
    val price = 78.35
    val a = BondMath.analyze(spec, price, trade).get
    val t = BondMath.yearFraction("ACT/365", a.settlement, spec.maturity)
    val expected = math.pow(100.0 / price, 1.0 / t) - 1.0
    assert(math.abs(a.ytm - expected) < 1e-9)
    assert(math.abs(a.prclean - price) < 1e-8)
    assert(a.acclast == 0.0)
    // zero-coupon modified duration = t / (1 + y)
    assert(math.abs(a.modDur - t / (1 + a.ytm)) < 1e-8)
  }

  test("par bond: semiannual 30/360 priced at 100 yields ~ the coupon") {
    // dated date = settlement → zero accrued, regular 0.5 periods
    val trade = LocalDate.of(2024, 3, 13) // Wed → settle Fri 2024-03-15
    val spec = BondMath.Spec(
      couponPct = 6.0, couponType = "F", frequency = 2,
      dayCount = "30/360",
      datedDate = LocalDate.of(2024, 3, 15),
      maturity = LocalDate.of(2029, 3, 15))
    val a = BondMath.analyze(spec, 100.0, trade).get
    assert(a.acclast == 0.0)
    assert(math.abs(a.ytm - 0.06) < 5e-3) // payment-date adjustment wiggle
    assert(math.abs(a.prclean - 100.0) < 1e-8) // solver round-trip is exact
    assert(math.abs(a.modDur - a.macDur / (1 + a.ytm / 2)) < 1e-12)
    assert(a.convexity > 0)
  }

  test("price/yield monotonicity and accrued interest accumulation") {
    val trade = LocalDate.of(2024, 6, 17)
    val spec = BondMath.Spec(
      couponPct = 5.0, couponType = "F", frequency = 2,
      dayCount = "ACT/ACT",
      datedDate = LocalDate.of(2022, 1, 15),
      maturity = LocalDate.of(2030, 1, 15))
    val lo = BondMath.analyze(spec, 90.0, trade).get
    val hi = BondMath.analyze(spec, 105.0, trade).get
    assert(lo.ytm > hi.ytm)
    assert(lo.acclast > 0) // mid-period settlement accrues
    assert(lo.acclast == hi.acclast) // accrual is price-independent
    assert(lo.accpmt > 0) // coupons paid since dated date
    assert(math.abs(lo.accall - (lo.acclast + lo.accpmt)) < 1e-12)
  }

  test("settlement at/after maturity yields no analytics") {
    val spec = BondMath.Spec(5.0, "F", 2, "30/360",
      LocalDate.of(2020, 1, 15), LocalDate.of(2024, 1, 15))
    assert(BondMath.analyze(spec, 100.0, LocalDate.of(2024, 1, 14)).isEmpty)
  }

  test("calendar: ModifiedFollowing and T+2 over a holiday weekend") {
    // 2024-07-04 (Thu) is Independence Day
    assert(!BondMath.isBusinessDay(LocalDate.of(2024, 7, 4)))
    assert(BondMath.addBusinessDays(LocalDate.of(2024, 7, 2), 2) ==
      LocalDate.of(2024, 7, 5))
    // month-end roll-back: 2024-06-30 is Sunday → following is July → back to Fri 06-28
    assert(BondMath.modifiedFollowing(LocalDate.of(2024, 6, 30)) ==
      LocalDate.of(2024, 6, 28))
  }

  test("day counts: 30/360 exact halves; ACT/ACT ISDA leap split") {
    assert(BondMath.yearFraction("30/360",
      LocalDate.of(2024, 3, 15), LocalDate.of(2024, 9, 15)) == 0.5)
    val f = BondMath.yearFraction("ACT/ACT",
      LocalDate.of(2023, 12, 1), LocalDate.of(2024, 2, 1))
    assert(math.abs(f - (31 / 365.0 + 31 / 366.0)) < 1e-12)
  }
}
