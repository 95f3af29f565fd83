package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A driver-contract query: the Spark implementation plus (when
  * SQL-expressible) its DuckDB oracle twin. SparkEntry aggregates the
  * per-module maps. */
final case class QueryDef(fn: (SparkSession, String) => DataFrame,
                          oracle: Option[String] = None)

object QueryDef {
  /** Exact deterministic sum of a double column: per-row cast to exact
    * decimal, exact decimal sum, final cast to double — bit-identical
    * across engines regardless of partitioning/summation order. The
    * oracle twin is `CAST(sum(CAST(x AS DECIMAL(25,6))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(c.cast("decimal(25,6)")).cast("double")

  /** Oracle-side SQL for [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(sum(CAST($expr AS DECIMAL(25,6))) AS DOUBLE)"
}
