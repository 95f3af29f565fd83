package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Every implemented operator from SURVEY.md §2 gets an entry in
  * [[queries]]; each is paired with an equivalent ANSI-SQL twin in
  * [[oracleSql]] (run by the driver in DuckDB over the same parquet
  * tables) unless the op is not SQL-expressible.
  *
  * Determinism rules (driver hash-compares values after sorting
  * columns by name):
  *   - double aggregates use the exact-decimal discipline
  *     ([[graft.queries.QueryDef.dsum]]) → bit-identical doubles;
  *   - every result is totally ordered via explicit ORDER BY with a
  *     full tiebreak on both sides;
  *   - column names aliased identically on both sides; DATE/TIME
  *     values emitted as strings (SURVEY §7.4).
  */
object SparkEntry {

  private val modules: Seq[Map[String, QueryDef]] = Seq(
    AnalyticQueries.defs,
    RelationalQueries.defs,
    ScalarQueries.defs,
    EventQueries.defs,
    Event2Queries.defs,
    TextQueries.defs,
    Text2Queries.defs,
    Text3Queries.defs,
    SearchQueries.defs,
    VectorQueries.defs,
    MultimodalQueries.defs,
    Analytic2Queries.defs,
    Analytic3Queries.defs,
    SurfaceQueries.defs,
    Surface2Queries.defs,
    Surface3Queries.defs,
    Surface4Queries.defs,
    FunctionQueries.defs,
    CurationQueries.defs)

  private lazy val all: Map[String, QueryDef] =
    modules.reduce(_ ++ _)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q1_agg").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
