package graft.io

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC-backed operational store — the reference's operational layer
  * is genuinely a SQL database (SQLite locally, Cloud SQL in prod:
  * `data/config.py:21-26`), accessed with `pd.read_sql_table` /
  * `to_sql(if_exists='append')` (`transformation_db.py:109-116`,
  * `transformation_dw.py:130-133`). The parquet-backed
  * [[Staging]] path keeps the engine's default store columnar; this
  * module is the fidelity path for deployments where the operational
  * store stays relational.
  *
  * Scale notes (100 TB discipline):
  *  - [[read]] accepts optional partitioning (`partitionColumn` +
  *    bounds + `numPartitions`) so a large table is range-split into
  *    parallel executor reads instead of one serialized cursor.
  *  - [[keyScan]] (F3, reference `SELECT {id_column} FROM {table}`,
  *    transformation_db.py:109-110) selects only the key column;
  *    Spark's JDBC relation pushes the projection into the generated
  *    server-side SELECT, so only keys cross the wire — and unlike
  *    the reference they land distributed, never as a driver-side
  *    Python set.
  *  - [[append]] (F5) writes per-partition batched INSERTs
  *    (`batchsize`); idempotency comes from the caller's anti-join,
  *    same contract as the parquet path.
  */
object JdbcStore {

  /** Embedded Derby URL under `dir` (created on first touch) — the
    * test/local stand-in for the reference's SQLite
    * (`config.py:22-26`); swap the URL for Cloud SQL/Postgres in
    * prod, nothing else changes. */
  def derbyUrl(dir: String): String = s"jdbc:derby:$dir;create=true"

  private def connProps(user: Option[String] = None,
                        password: Option[String] = None): Properties = {
    val p = new Properties()
    user.foreach(p.setProperty("user", _))
    password.foreach(p.setProperty("password", _))
    p
  }

  /** F4 — full-table scan (reference `pd.read_sql_table`,
    * transformation_dw.py:130-133). Optional range partitioning for
    * parallel reads of large tables. */
  def read(spark: SparkSession, url: String, table: String,
           partitionColumn: Option[String] = None,
           lowerBound: Long = 0L, upperBound: Long = 0L,
           numPartitions: Int = 1): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    val withPart = partitionColumn match {
      case Some(c) => base
        .option("partitionColumn", c)
        .option("lowerBound", lowerBound)
        .option("upperBound", upperBound)
        .option("numPartitions", numPartitions)
      case None => base
    }
    withPart.load()
  }

  /** F3 — key-scan (reference `SELECT {id_column} FROM {table}`,
    * transformation_db.py:109-110). The `.select` is pushed into the
    * JDBC source's generated SQL (column pruning over JDBC), so the
    * database only ships the key column. */
  def keyScan(spark: SparkSession, url: String, table: String,
              idColumn: String): DataFrame =
    read(spark, url, table).select(idColumn)

  /** F5 — append sink (reference `to_sql(if_exists='append')`,
    * transformation_db.py:116). Creates the table on first write,
    * appends thereafter — same observable semantics. */
  def append(df: DataFrame, url: String, table: String,
             batchSize: Int = 1000): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .mode(SaveMode.Append)
      .save()

  /** F6 — truncate-load sink over JDBC (reference BigQuery
    * WRITE_TRUNCATE, transformation_dw.py:154-156): full rebuild of a
    * mart table in the relational store. `truncate = true` keeps the
    * existing table's DDL (indexes, grants) and empties it instead of
    * drop+recreate, when the database supports it. */
  def overwrite(df: DataFrame, url: String, table: String,
                batchSize: Int = 1000): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .option("truncate", "true")
      .mode(SaveMode.Overwrite)
      .save()

  /** Driver-side metadata probe — one cheap catalog query, never a
    * table scan.
    *
    * `DatabaseMetaData.getTables` treats its table-name argument as a
    * LIKE pattern: '_' and '%' are wildcards, so an unescaped probe
    * for `band_index` would also match `bandXindex` — sending
    * `loadIfNewJdbc` down the existing-table path against a table
    * that doesn't exist. The name is escaped with the driver's own
    * search-string escape and each returned TABLE_NAME is compared
    * for exact (case-insensitive) equality. */
  def tableExists(url: String, table: String): Boolean = {
    val conn = DriverManager.getConnection(url, connProps())
    try {
      val md = conn.getMetaData
      val escChar = Option(md.getSearchStringEscape).getOrElse("\\")
      val pattern = table.flatMap {
        case c @ ('_' | '%') => escChar + c
        case c if escChar.length == 1 && c == escChar.head => escChar + c
        case c => c.toString
      }
      def probe(pat: String): Boolean = {
        val rs = md.getTables(null, null, pat, null)
        try {
          var found = false
          while (!found && rs.next())
            found = table.equalsIgnoreCase(rs.getString("TABLE_NAME"))
          found
        } finally rs.close()
      }
      // Spark's JDBC writer quotes identifiers, so a lowercase Spark
      // table name is stored case-exact; probe both it and the
      // dialect-uppercased form to stay portable across databases.
      probe(pattern) || probe(pattern.toUpperCase)
    } finally conn.close()
  }
}
