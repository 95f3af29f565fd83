package graft.etl

import org.apache.spark.sql.SparkSession
import graft.io.Staging
import graft.schema.Schemas

/** The DAG shell (SURVEY.md §3 entry-point A). The reference's Airflow
  * DAG (`dags/tourism_finance_etl_dag.py:12-27`) is orchestration, not
  * engine capability: a linear chain
  * `create schemas → operational load → mart build`. Here it is a
  * sequential driver program; each stage's Spark job is already
  * distributed internally. (The extract stage S1-S4 is external API
  * I/O represented by fixture CSVs in the staging dir — SURVEY §7.1.)
  */
object Pipeline {

  final case class Result(loaded: Map[String, Long],
                          mart: Map[String, Long])

  def run(spark: SparkSession, stagingDir: String, storeDir: String,
          martDir: String): Result = {
    // Stage 1 — DDL (reference create_operational_db_schema +
    // create_bigquery_tables_for_data_mart).
    Schemas.operational.foreach { case (t, s) =>
      Staging.ensureTable(spark, storeDir, t, s)
    }
    // Stage 2 — incremental operational load (idempotent).
    val loaded = OperationalLoad.run(spark, stagingDir, storeDir)
    // Stage 3 — full mart rebuild (truncate-load, deliberately
    // asymmetric with stage 2 — SURVEY §4 idempotency model).
    val mart = MartBuild.run(spark, storeDir, martDir)
    Result(loaded, mart)
  }
}
