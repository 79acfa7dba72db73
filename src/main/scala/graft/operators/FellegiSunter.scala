package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969;
  * the Splink/fastLink model): each field comparison contributes a
  * log-likelihood-ratio weight — log2(m/u) on agreement, log2((1-m)/
  * (1-u)) on disagreement, a reduced weight on partial agreement — and
  * the pair's match score is the SUM. j26 answers "which candidate is
  * closest"; this answers the question a linkage pipeline actually
  * ships: "is the best candidate a MATCH, a clerical-review POSSIBLE,
  * or a non-match", with per-field evidence weights instead of a single
  * edit distance.
  *
  * Weights are integer MILLI-log2 units pinned as library constants
  * (the m/u priors of the model); callers' oracles interpolate the same
  * constants, so the classification is hash-exact cross-engine. Scoring
  * is a pure codegen'd projection over the blocked candidate pairs —
  * the expensive part stays the blocking (ErBlocking's capped gram
  * index + an exact-key block), which bounds candidates linearly.
  */
object FellegiSunter {

  // milli-log2(m/u)-style evidence weights — the model's parameters
  val NameAgree = 9900
  val NamePartial = 5200 // levenshtein <= 2
  val NameDis = -4300
  val PhoneAgree = 8700
  val PhoneLast4 = 3100 // last four digits agree
  val PhoneDis = -5200
  val NationAgree = 1400
  val NationDis = -2600

  /** total-score threshold for 'match'; [0, MatchThresh) is
    * 'possible' (clerical review), below 0 'nonmatch'. */
  val MatchThresh = 12000

  /** the summed field-comparison score in milli-units, as a codegen'd
    * column over a candidate-pair frame. */
  def score(dname: Column, ename: Column, dphone: Column, ephone: Column,
      dnation: Column, enation: Column): Column = {
    val name = when(dname === ename, lit(NameAgree))
      .when(levenshtein(dname, ename) <= 2, lit(NamePartial))
      .otherwise(lit(NameDis))
    val phone = when(dphone === ephone, lit(PhoneAgree))
      .when(substring(dphone, 4, 4) === substring(ephone, 4, 4),
        lit(PhoneLast4))
      .otherwise(lit(PhoneDis))
    val nation = when(dnation === enation, lit(NationAgree))
      .otherwise(lit(NationDis))
    name + phone + nation
  }

  /** the same arithmetic as oracle SQL text (DuckDB), over columns with
    * the standard names. */
  def scoreSql: String =
    s"""(CASE WHEN d.dname = c.ename THEN $NameAgree
              WHEN levenshtein(d.dname, c.ename) <= 2 THEN $NamePartial
              ELSE $NameDis END
       + CASE WHEN d.dphone = c.ephone THEN $PhoneAgree
              WHEN substr(d.dphone, 4, 4) = substr(c.ephone, 4, 4)
                THEN $PhoneLast4
              ELSE $PhoneDis END
       + CASE WHEN d.dnation = c.enation THEN $NationAgree
              ELSE $NationDis END)"""
}
