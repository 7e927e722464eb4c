package graft.license

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** KBART embargo_info parsing (field 12 of the KBART row,
  * ref: sources/jstor.py:546-580; the reference ships period strings to
  * span-tag, which interprets them as a moving wall).
  *
  * Syntax (NISO KBART): `[RP]<n><D|M|Y>`, case-insensitive.
  *  - `R` — rolling embargo: the most recent n units are NOT yet
  *    licensed; a record clears the wall when rdate ≤ asOf − n.
  *  - `P` — rolling availability window: ONLY the most recent n units
  *    are licensed; a record clears when rdate ≥ asOf − n.
  * Day conversion is the fixed 1/30/365 convention (documented — the
  * wall is a coarse cutoff, not calendar arithmetic).
  *
  * Everything is codegen'd Column algebra; on literal inputs the parse
  * constant-folds to nothing at optimization time. */
object Kbart {

  /** 1-4 digits: a 5+-digit unit count is not a plausible embargo and,
    * under ANSI mode, an unbounded digit run could overflow the int
    * cast into a job-killing exception instead of the documented
    * null-on-unparseable. 9999Y × 365 still fits an int comfortably. */
  private val Pattern = "^([RP])([0-9]{1,4})([DMY])$"

  /** embargo_info string → struct(method: string, days: int).
    * Blank/null → (R, 0) (no embargo); unparseable → null struct, so
    * dirty feeds surface as nulls instead of silent entitlement. */
  def parseEmbargo(c: Column): Column = {
    val t = upper(trim(coalesce(c, lit(""))))
    val method = regexp_extract(t, Pattern, 1)
    val n = regexp_extract(t, Pattern, 2)
    val unit = regexp_extract(t, Pattern, 3)
    val days = n.cast("int") *
      when(unit === "D", 1).when(unit === "M", 30).otherwise(365)
    when(t === "", struct(lit("R").as("method"), lit(0).as("days")))
      .when(method =!= "", struct(method.as("method"), days.as("days")))
      .otherwise(lit(null).cast("struct<method:string,days:int>"))
  }

  /** Convenience: just the wall width in days (null on unparseable). */
  def embargoDays(c: Column): Column = parseEmbargo(c)("days")

  /** Convenience: the wall direction (null on unparseable). */
  def embargoMethod(c: Column): Column = parseEmbargo(c)("method")

  /** Does `rdate` clear the embargo wall at `asOf`?
    *
    * Null handling is fail-closed where it matters: method AND days
    * both null is the [[parseEmbargo]] unparseable signature → NOT
    * entitled (silently treating a broken "R2Y "-style wall as no
    * embargo would drop a paywall). A null days alongside a concrete
    * method (holdings tables that carry a plain int column with blanks)
    * still means no embargo, and a null method alone defaults to R. */
  def clearsWall(rdate: Column, asOf: Column,
                 method: Column, days: Column): Column = {
    val wall = date_sub(asOf, coalesce(days, lit(0)).cast("int"))
    when(method.isNull && days.isNull, lit(false))
      .when(upper(coalesce(method, lit("R"))) === "P", rdate >= wall)
      .otherwise(rdate <= wall)
  }
}
