package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic-aggregate helpers for oracle parity (SURVEY §7.5.1).
  *
  * `sum(double)` is order-dependent (parallel reduction order differs run to
  * run and engine to engine), so a hash-compare against DuckDB would flap.
  * Recipe: keep per-row arithmetic in IEEE double (bit-identical in any
  * engine), cast each row's value to an exact decimal, sum the decimals
  * (associative & exact → order-independent), cast the final sum back to
  * double. Both engines then produce the identical 64-bit value.
  *
  * This is also the right call at scale: a 1000-executor sum has a
  * nondeterministic combine order, so any double-sum pipeline that feeds a
  * comparison or an idempotency check needs the same trick.
  *
  * LIMIT of the recipe: the per-row double→decimal cast itself is only
  * engine-portable when the doubles are "decimal-shaped" (prices,
  * quantities — values a 6-digit decimal represents exactly). For
  * arbitrary quotients the engines disagree in rare last-ulp cases
  * (DuckDB rounds through a float multiply, Spark expands the double
  * exactly — observed as a 1.7e-6 drift in 5-round PageRank at sf0.1).
  * Iterative numeric recurrences should run in fixed-point integer
  * units instead (GraphOps.pageRank): 64-bit integer arithmetic has
  * exactly one answer everywhere.
  */
object Det {
  val Dec = "decimal(38,6)"

  /** Order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Order-independent average (decimal-sum ÷ count), returned as double. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Oracle-SQL fragment equivalents (DuckDB syntax).
    *
    * The final decimal→double hop goes through VARCHAR: DuckDB's direct
    * DECIMAL→DOUBLE cast divides two separately-rounded doubles
    * (int128 unscaled, then /1e6) and is off by 1 ulp once the unscaled
    * value exceeds 2^53 (~9e9 in the sum), while Spark's Decimal.toDouble
    * is correctly rounded. VARCHAR→DOUBLE (strtod) is correctly rounded
    * in DuckDB, so both engines land on the identical 64-bit value at any
    * magnitude. */
  def sqlSum(expr: String): String =
    s"CAST(CAST(SUM(CAST(($expr) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"(${sqlSum(expr)} / COUNT(*))"
}
