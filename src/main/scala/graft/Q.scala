package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when the semantics are
  * ANSI-SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * tables. Column names/aliases MUST match between the two — the driver's
  * compare sorts columns by name before hashing values.
  *
  * Determinism rules applied throughout the library (both sides):
  *   - money/quantity sums go through DECIMAL so the result is exact and
  *     independent of summation order (double sums are order-dependent);
  *   - averages are emitted as exact-decimal-sum / count (one IEEE divide);
  *   - inherently order-dependent doubles (stddev, corr, libm fns) are
  *     rounded to a safe number of digits;
  *   - every result carries a total ORDER BY (ties broken by keys).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
