package graft.analytics

import java.time.LocalDate
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DataFrame surface for [[BondMath]]: a struct-returning Scala UDF — the
  * one place the engine uses a UDF, per SURVEY.md §2.11 X1: bond math is
  * an irreducibly scalar per-row computation (schedule + root solve), and
  * a JVM UDF beats any expression encoding while staying fully
  * distributed (no driver-side loops, no process boundary like the
  * reference's joblib pool).
  */
object BondAnalytics {

  private val analyzeUdf = udf(
    (pr: java.lang.Double,
     couponPct: java.lang.Double,
     couponType: String,
     frequency: java.lang.Integer,
     dayCount: String,
     datedDate: LocalDate,
     maturity: LocalDate,
     tradeDate: LocalDate) => {
      if (pr == null || maturity == null || tradeDate == null) None
      else BondMath.analyze(
        BondMath.Spec(
          couponPct = if (couponPct == null) Double.NaN else couponPct.doubleValue(),
          couponType = if (couponType == null) "F" else couponType,
          frequency = if (frequency == null) 2 else frequency.intValue(),
          dayCount = if (dayCount == null) "30/360" else dayCount,
          datedDate = if (datedDate == null) tradeDate else datedDate,
          maturity = maturity),
        pr.doubleValue(), tradeDate
      ).map(a => (a.ytm, a.prclean, a.prfull, a.acclast, a.accpmt, a.accall,
        a.macDur, a.modDur, a.convexity))
    })

  /** Adds `ytm, prclean, prfull, acclast, accpmt, accall, mac_dur, mod_dur,
    * convexity` computed from the named columns.
    */
  def withAnalytics(
      df: DataFrame,
      pr: Column, couponPct: Column, couponType: Column, frequency: Column,
      dayCount: Column, datedDate: Column, maturity: Column,
      tradeDate: Column): DataFrame = {
    val a = analyzeUdf(pr, couponPct, couponType, frequency, dayCount,
      datedDate, maturity, tradeDate)
    df.withColumn("__ba", a)
      .withColumn("ytm", col("__ba._1"))
      .withColumn("prclean", col("__ba._2"))
      .withColumn("prfull", col("__ba._3"))
      .withColumn("acclast", col("__ba._4"))
      .withColumn("accpmt", col("__ba._5"))
      .withColumn("accall", col("__ba._6"))
      .withColumn("mac_dur", col("__ba._7"))
      .withColumn("mod_dur", col("__ba._8"))
      .withColumn("convexity", col("__ba._9"))
      .drop("__ba")
  }
}
