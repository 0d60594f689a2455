package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine repr-robust decimal snapping.
  *
  * `round(x, d)` is a DIFFERENT function in Spark and in ANSI SQL
  * engines: Spark rounds the shortest decimal REPR of the double
  * (`BigDecimal.valueOf(x).setScale(d, HALF_UP)`), DuckDB/Postgres
  * round the double VALUE. The two disagree exactly when the true
  * result sits on a decimal half-point at `d` digits (e.g. the
  * quarter-interpolated quantile of 2-dp money), and a hash-exact
  * oracle compare sees the one-ulp flip as a red row.
  *
  * `floor(x·10ᵈ + 0.5) / 10ᵈ` is the SAME correctly-rounded IEEE op
  * sequence everywhere — multiply, add, floor, divide are each
  * IEEE-754 correctly rounded, so identical input doubles produce
  * bit-identical output doubles in every engine. Use this on every
  * float that feeds a cross-engine hash compare, and write the same
  * `floor(x * 1e4 + 0.5) / 1e4` form in the oracle SQL.
  *
  * (Half-up toward +∞ for negatives — differs from HALF_UP's
  * away-from-zero only AT a half-point, where `round` was already
  * engine-dependent; consistency across engines is the contract.)
  *
  * NaN is NOT part of the contract: Spark's `floor` returns BIGINT and
  * maps NaN to 0 while SQL engines' DOUBLE floor keeps NaN — a NaN
  * reaching this snap dumps a plausible-looking 0.0 from the engine
  * and NaN from the oracle. Guard every 0/0-capable expression with
  * `when(denom > 0, ...)` BEFORE snapping (the CLAUDE.md NaN rule —
  * null propagates through floor identically in both engines).
  */
object Rounding {
  /** `floor(x·10ᵈ + 0.5)/10ᵈ` — see object doc. `digits` ∈ [1, 15]. */
  def reprRound(c: Column, digits: Int): Column = {
    require(digits >= 1 && digits <= 15, s"digits must be in [1,15]: $digits")
    val scale = math.pow(10.0, digits)
    floor(c * lit(scale) + lit(0.5)) / lit(scale)
  }

  /** The 4-dp form used by the profile quantile family. */
  def reprRound4(c: Column): Column = reprRound(c, 4)

  /** The 6-dp form used by the dedup ratio family. */
  def reprRound6(c: Column): Column = reprRound(c, 6)
}
