package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine determinism helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running
  * the oracle SQL. Double-typed aggregates are NOT associativity-stable
  * across engines, so every money/metric aggregate follows one recipe:
  * cast the (2-decimal-valued) input to an exact decimal, aggregate in
  * decimal (exact), and cast the final scalar back to double (a single
  * deterministic conversion). Derived per-row products are computed in
  * double (IEEE-deterministic for identical operand trees) and snapped
  * to the decimal grid they mathematically live on (<= 4 or 6 dp), so
  * no rounding ambiguity can arise at .5 boundaries.
  */
object Util {
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))
  def dec6(c: Column): Column = c.cast(DecimalType(18, 6))
  def dbl(c: Column): Column = c.cast(DoubleType)

  /** Exact sum of a 2-dp double column, returned as double. */
  def sum2(c: Column): Column = dbl(sum(dec2(c)))
  /** Exact sum of a derived expr that lives on the 1e-4 grid. */
  def sum4(c: Column): Column = dbl(sum(dec4(c)))
  def sum6(c: Column): Column = dbl(sum(dec6(c)))
  /** avg as exact-sum / count — reproducible double division. */
  def avg2(c: Column): Column = sum2(c) / count(lit(1))
}
