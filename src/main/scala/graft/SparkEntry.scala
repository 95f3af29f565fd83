package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Every implemented operator from SURVEY.md §2 gets an entry in
  * [[queries]]; each is paired with an equivalent ANSI-SQL twin in
  * [[oracleSql]] (run by the driver in DuckDB over the same parquet
  * tables) unless the op is not SQL-expressible.
  *
  * Determinism rules (driver hash-compares values after sorting
  * columns by name):
  *   - aggregates over doubles are computed in exact DECIMAL then cast
  *     to DOUBLE at the end, so Spark and DuckDB produce bit-identical
  *     doubles regardless of partitioning / summation order;
  *   - every result is totally ordered by an explicit ORDER BY with a
  *     full tiebreak on both sides;
  *   - column names are aliased identically on both sides.
  */
object SparkEntry {

  /** Exact deterministic sum of a double column: decimal-sum → double. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(25,6)")).cast("double")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped pricing summary over lineitem — exercises scan,
    * projection pushdown, partial+final hash aggregation, ordering.
    */
  def entry(spark: SparkSession): DataFrame =
    q1Agg(spark, "/root/testdata/sf0.001")

  private def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, d) => q1Agg(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
