package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exactness helpers for oracle-comparable aggregation.
  *
  * Double summation is order-dependent, and Spark's partial/final
  * aggregation order differs from DuckDB's sequential scan. Every money /
  * quantity aggregate therefore casts to a fixed-scale decimal first
  * (exact, associative, order-independent), aggregates, and casts the
  * exact decimal result back to double at the very end. Two engines
  * summing identical decimals produce identical decimals; casting the
  * same decimal to double is correctly rounded in both — so result hashes
  * match bit-for-bit.
  *
  * This is also the right call at 100 TB: decimal sums are codegen'd,
  * stay inside whole-stage codegen, and remove any dependence on
  * partition count / merge order — a plan property that must hold when
  * partitions go from 32 to 200k.
  */
object Exact {
  /** money-ish column (2 decimal digits in the data) → exact decimal. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** small ratio column (discount/tax, 2-4 digits) → exact decimal. */
  def dec4(c: Column): Column = c.cast(DecimalType(9, 4))

  /** exact sum of a 2-decimal column, surfaced as double. */
  def sumd2(c: Column): Column = sum(dec2(c)).cast("double")

  /** exact sum of an arbitrary-scale decimal expression → double.
    * Rounded back to scale 2 BEFORE the double cast: casting a
    * high-scale wide decimal to double is not correctly rounded in every
    * engine (the scaled integer exceeds 2^53), while a scale-2 decimal of
    * money magnitude always converts exactly the same way. Both engines
    * round decimal half-up for positives, so the rounding itself is
    * deterministic too. */
  def sumd(c: Column): Column = round(sum(c), 2).cast("double")

  /** avg as exact-sum / count, evaluated in double (deterministic:
    * both engines divide the same two exact values). */
  def avgd2(c: Column): Column =
    (sum(dec2(c)).cast("double") / count(c)).cast("double")
}
