package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic numeric helpers.
  *
  * Floating-point SUM is order-dependent: two runs of the same Spark job can
  * differ in the last ulp (partial-aggregation order is nondeterministic),
  * and a DuckDB oracle differs further. Every verified aggregate therefore
  * routes doubles through a fixed-scale DECIMAL: the cast rounds each input
  * once (deterministically — a binary double is never exactly on a decimal
  * half-way point), the decimal sum is exact and order-independent, and the
  * final cast back to double is a single deterministic conversion. This also
  * holds on a 1000-executor cluster where partial-agg merge order is
  * genuinely arbitrary — important at 100 TB, not just for the oracle.
  */
object Exact {
  /** Order-independent sum of a double column, exact at `scale` decimals. */
  def dsum(c: Column, precision: Int = 24, scale: Int = 6): Column =
    sum(c.cast(DecimalType(precision, scale))).cast("double")

  /** Deterministic mean: exact decimal sum / exact count (one IEEE divide). */
  def davg(c: Column, precision: Int = 24, scale: Int = 6): Column =
    (sum(c.cast(DecimalType(precision, scale))).cast("double") / count(lit(1)))

  /** SQL fragment mirroring [[dsum]] for the DuckDB oracle. */
  def sqlSum(e: String, precision: Int = 24, scale: Int = 6): String =
    s"CAST(sum(CAST(($e) AS DECIMAL($precision,$scale))) AS DOUBLE)"

  def sqlAvg(e: String, precision: Int = 24, scale: Int = 6): String =
    s"(CAST(sum(CAST(($e) AS DECIMAL($precision,$scale))) AS DOUBLE) / count(*))"
}
