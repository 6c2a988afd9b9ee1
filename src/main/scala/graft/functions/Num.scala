package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric output-normalization helpers shared by every query that
  * emits a rounded double.
  *
  * The signed-zero rule (DESIGN.md §5, x119 postmortem): a rounded
  * float output whose true value sits near zero can land on `-0.0`
  * in one engine and `+0.0` in another — the ~1e-12 cross-engine
  * drift that rounding-margin analysis absorbs everywhere else flips
  * the SIGN at zero, and bit-hashing comparators (the driver) see
  * different IEEE bit patterns for numerically equal values. IEEE 754
  * addition normalizes it: `-0.0 + 0.0 = +0.0`, and `x + 0.0 = x`
  * bit-exactly for every other x (NaN stays NaN, null stays null).
  * Every rounded double output goes through [[roundz]] here, and
  * every DuckDB oracle appends the same `+ 0.0` to its matching
  * `round(...)` expression.
  */
object Num {

  /** `round(c, scale)` with the result's signed zero normalized to
    * `+0.0` — the only safe way to emit a rounded double that can go
    * tiny-negative into a bit-hashed comparison. */
  def roundz(c: Column, scale: Int): Column = round(c, scale) + lit(0.0)

  /** Signed-zero normalization alone, for already-rounded or
    * closed-form double columns that must hash bit-stably. */
  def zNorm(c: Column): Column = c + lit(0.0)
}
