package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Staging

/** Incrementally-maintained rollup: a persisted PARTIAL-aggregate
  * table (per group: count + per-measure sum, the classic mergeable
  * state) updated batch-by-batch, so the standing aggregate over a
  * growing 100 TB fact table costs O(batch + affected groups) per
  * load instead of a full rescan. `readFinal` derives the
  * user-facing aggregate (sum/count/avg) from the partials at read
  * time — exactly the partial/final split Spark's own HashAggregate
  * uses across the shuffle, lifted to cross-batch persistence.
  *
  * Only DISTRIBUTIVE/ALGEBRAIC aggregates (sum, count, min, max, avg
  * via sum+count) maintain this way; holistic ones (exact percentile,
  * count-distinct) need sketches instead — that scope is stated, not
  * hidden.
  *
  * The partials table is group-cardinality-sized — typically orders
  * of magnitude smaller than the fact table — so the read-merge-write
  * of the update is a small-table operation even when the fact table
  * is not; it stages through a temp directory before touching the
  * store (its lineage reads the store, same discipline as
  * [[graft.io.Staging.mergeUpsert]]).
  *
  * Invariant (RollupSpec): after any batch sequence, `readFinal` ==
  * the direct aggregate over the concatenation of all batches; the
  * `incremental_rollup` registry query proves the same equality
  * against the DuckDB oracle.
  */
object RollupMaintain {

  /** Fold one batch into the partial-aggregate store: per group key,
    * add the batch's (sum, count) into the stored partials. Returns
    * the number of groups in the store after the update. */
  def updateRollup(spark: SparkSession, storeDir: String, table: String,
                   batch: DataFrame, groupCols: Seq[String],
                   measureCol: String): Long = {
    val bp = batch.groupBy(groupCols.map(col): _*)
      .agg(sum(col(measureCol).cast("decimal(25,6)")).as("psum"),
        count(col(measureCol)).as("pcnt"))
    val path = s"$storeDir/$table"
    val tmpCheck = new org.apache.hadoop.fs.Path(
      s"$storeDir/__rollup_tmp_$table")
    val fsCheck = tmpCheck.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // a leftover temp dir means a previous update crashed between the
    // store delete and the rename — the temp dir IS the current full
    // state; refusing (instead of silently restarting from just this
    // batch) preserves it for operator recovery
    require(!fsCheck.exists(tmpCheck),
      s"$tmpCheck exists — a previous rollup update crashed mid-swap. " +
        s"It holds the COMPLETE post-update partials: rename it to " +
        s"$path to finish that update (do not re-apply that batch)")
    val merged =
      if (!Staging.tableExists(spark, storeDir, table)) bp
      else {
        val existing = Staging.readTable(spark, storeDir, table)
        // full outer: a group may exist only in the store (untouched
        // by this batch) or only in the batch (new group)
        existing.select((groupCols.map(col) :+
            col("psum").as("__es") :+ col("pcnt").as("__ec")): _*)
          .join(bp, groupCols, "full_outer")
          .select((groupCols.map(col) :+
            (coalesce(col("__es"), lit(0).cast("decimal(25,6)")) +
              coalesce(col("psum"), lit(0).cast("decimal(25,6)")))
              .as("psum") :+
            (coalesce(col("__ec"), lit(0L)) + coalesce(col("pcnt"),
              lit(0L))).as("pcnt")): _*)
      }
    // stage-then-swap: `merged` reads the store it replaces
    val tmp = s"$storeDir/__rollup_tmp_$table"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(path)))
      throw new java.io.IOException(
        s"rename $tmp -> $path failed; partials intact in $tmp")
    Staging.readTable(spark, storeDir, table).count()
  }

  /** The user-facing aggregate derived from the partials: exact
    * decimal total (cast to double at the edge, the engine's
    * bit-determinism discipline), row count, and mean. */
  def readFinal(spark: SparkSession, storeDir: String,
                table: String): DataFrame =
    Staging.readTable(spark, storeDir, table)
      .select(col("*"),
        col("psum").cast("double").as("total"),
        // divide as double: decimal division would round the mean to
        // the partial's scale (6 dp) before the cast
        (col("psum").cast("double") / col("pcnt")).as("mean"))
      .drop("psum")
      .withColumnRenamed("pcnt", "n_rows")
}
