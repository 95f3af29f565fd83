package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver-generated testdata
  * (TESTDATA.md: `region nation customer supplier part orders lineitem
  * events documents embeddings`, one parquet file per table under an
  * `sf{N}` directory).
  *
  * At cluster scale these would be partitioned-directory datasets; the
  * access path (`spark.read.parquet`) is identical — Spark globs,
  * prunes partitions, and pushes filters/projections into the scan
  * either way.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table carries a nanosecond-precision timestamp, which
    * Spark's parquet reader rejects by default (PARQUET_TYPE_ILLEGAL).
    * Read it as raw Long nanos (`nanosAsLong`) and surface `ts` as a
    * µs-truncated TimestampType — the same truncation DuckDB applies,
    * so oracle comparisons agree (SURVEY §7.4 precision note). */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  def region(spark: SparkSession, d: String): DataFrame = apply(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = apply(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = apply(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = apply(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = apply(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = apply(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = apply(spark, d, "lineitem")
  def events(spark: SparkSession, d: String): DataFrame = {
    val raw = eventsRaw(spark, d)
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw // already a (µs or coarser) timestamp
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = apply(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = apply(spark, d, "embeddings")
}
