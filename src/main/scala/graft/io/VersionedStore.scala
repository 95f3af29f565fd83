package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Object-store-atomic table commits: the manifest/version answer to
  * the one asterisk in [[Staging]]'s swap protocol. `stageAndSwap` /
  * `swapTouchedPartitions` get their atomicity from directory RENAME —
  * true on HDFS/POSIX, false on S3-style object stores where a rename
  * is a non-atomic copy+delete. This store never renames anything a
  * reader can see:
  *
  * Layout: `<storeDir>/<table>/_v_<000000N>/data/part-*.parquet`
  * (immutable once committed) + `_v_<N>/_COMMIT` (a one-line JSON
  * marker) + an advisory `<table>/_MANIFEST` pointer.
  *
  * THE COMMIT POINT is the completed write of `_COMMIT` — a single
  * small object. On S3 that write is one atomic PUT; on HDFS/POSIX
  * `create()` exposes an empty file before its bytes land, so readers
  * treat a marker that is empty or unparsable as NOT committed (see
  * [[markerCommitted]]) — the commit point is then the close() that
  * makes the bytes durable, and a crash mid-write reads as
  * uncommitted on every store. Readers resolve the current version by
  * listing version dirs and taking the highest with a VALID `_COMMIT`
  * marker; a version directory without one is invisible, whatever
  * half-written state its `data/` holds. The Spark committer's own
  * internal task-file renames all happen INSIDE the uncommitted
  * `data/` dir, so their non-atomicity on an object store costs
  * time, never correctness (StoreOpsSpec drills the protocol on a
  * filesystem whose rename is literally copy+delete).
  *
  * Crash windows (single writer per table, as for all Staging ops):
  *   - dies during the data write → no `_COMMIT`, readers unaffected;
  *     the dead dir is cleared by the next commit;
  *   - dies after `_COMMIT`, before manifest/prune → the commit IS
  *     durable (readers list), the manifest is advisory and refreshed
  *     by the next commit, stale versions prune then too;
  *   - the batch is REPLAYED after any of the above → `batchId`
  *     dedup: a commit whose batchId matches ANY retained version's
  *     is acknowledged as already applied, no new version (detection
  *     window = `keepVersions`, see [[appliedBatchIds]]). This replaces
  *     stageAndSwap's refuse-and-ask `_SUCCESS` window with
  *     exactly-once semantics the operator never has to hand-repair.
  *
  * Old versions are kept `keepVersions` deep (cheap time-travel /
  * debugging, bounded storage); pruning happens strictly AFTER the
  * new marker lands, so a crash mid-prune leaves extra read-only
  * garbage, never a corrupt table.
  *
  * Reference tie-in: the reference's truncate-load gets this same
  * atomicity from BigQuery's committed-job semantics
  * (transformation_dw.py:154-156); this is the engine-side analog for
  * raw parquet on an object store.
  */
object VersionedStore {
  private val VerPrefix = "_v_"
  private val Marker = "_COMMIT"

  private def fsFor(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A version counts as committed only if its marker EXISTS, is
    * non-empty, AND parses. On S3 a PUT is all-or-nothing, but on
    * HDFS/POSIX `create()` makes an empty file visible before its
    * bytes land — a crash inside that window must read as "not
    * committed" (the dead dir is cleared by the next commit's corpse
    * sweep and the retried batch then commits cleanly), never as a
    * committed version whose batch_id is unrecoverable, which would
    * punch a hole in [[appliedBatchIds]]'s replay-dedup window. */
  private def markerCommitted(fs: org.apache.hadoop.fs.FileSystem,
                              vdir: org.apache.hadoop.fs.Path): Boolean = {
    val m = new org.apache.hadoop.fs.Path(vdir, Marker)
    try {
      if (fs.getFileStatus(m).getLen == 0L) return false
      val in = fs.open(m)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
      "\"version\":\\d+".r.findFirstIn(txt).nonEmpty
    } catch { case _: java.io.IOException => false }
  }

  /** (version, path, committed) for every version dir present. */
  private def versions(spark: SparkSession, storeDir: String,
                       table: String)
      : Seq[(Long, org.apache.hadoop.fs.Path, Boolean)] = {
    val root = new org.apache.hadoop.fs.Path(s"$storeDir/$table")
    val fs = fsFor(spark, root.toString)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(VerPrefix))
      .flatMap { s =>
        val n = s.getPath.getName.stripPrefix(VerPrefix)
        n.toLongOption.map { v =>
          (v, s.getPath, markerCommitted(fs, s.getPath))
        }
      }
      .sortBy(_._1)
  }

  private def currentVersion(spark: SparkSession, storeDir: String,
                             table: String)
      : Option[(Long, org.apache.hadoop.fs.Path)] =
    versions(spark, storeDir, table).filter(_._3).lastOption
      .map { case (v, p, _) => (v, p) }

  def tableExists(spark: SparkSession, storeDir: String,
                  table: String): Boolean =
    currentVersion(spark, storeDir, table).nonEmpty

  /** Read the current committed version (one LIST round trip — the
    * version count is bounded by `keepVersions`, so resolution never
    * scans history). */
  def readTable(spark: SparkSession, storeDir: String,
                table: String): DataFrame = {
    val (_, p) = currentVersion(spark, storeDir, table).getOrElse(
      throw new java.util.NoSuchElementException(
        s"no committed version of $storeDir/$table"))
    spark.read.parquet(s"$p/data")
  }

  private def markerBatchId(spark: SparkSession,
                            p: org.apache.hadoop.fs.Path): Option[String] = {
    val fs = fsFor(spark, p.toString)
    val in = fs.open(new org.apache.hadoop.fs.Path(p, Marker))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
    "\"batch_id\":\"([^\"]*)\"".r.findFirstMatchIn(txt).map(_.group(1))
      .filter(_.nonEmpty)
  }

  /** The current version's batchId, if any. */
  def lastBatchId(spark: SparkSession, storeDir: String,
                  table: String): Option[String] =
    currentVersion(spark, storeDir, table)
      .flatMap { case (_, p) => markerBatchId(spark, p) }

  /** Batch ids of every RETAINED committed version — the replay-
    * detection window. A batch re-delivered while its version is
    * still within `keepVersions` is recognized and acknowledged; a
    * pipeline whose at-least-once redelivery can lag further behind
    * sizes `keepVersions` to its redelivery horizon (the same
    * contract checkpoint-retention gives a streaming sink). */
  def appliedBatchIds(spark: SparkSession, storeDir: String,
                      table: String): Set[String] =
    versions(spark, storeDir, table).filter(_._3)
      .flatMap { case (_, p, _) => markerBatchId(spark, p) }.toSet

  /** Commit `df` as the table's next version. Returns the committed
    * row count. If `batchId` matches the current version's, the batch
    * already applied — acknowledged without writing (replay-idempotent
    * across every crash window above). */
  def commit(spark: SparkSession, df: DataFrame, storeDir: String,
             table: String, batchId: Option[String] = None,
             keepVersions: Int = 2): Long = {
    if (batchId.exists(appliedBatchIds(spark, storeDir, table)))
      return readTable(spark, storeDir, table).count()
    val root = s"$storeDir/$table"
    val fs = fsFor(spark, root)
    val vs = versions(spark, storeDir, table)
    val next = vs.lastOption.map(_._1 + 1).getOrElse(1L)
    // clear dead uncommitted dirs (crashed writers — single-writer
    // contract); readers never saw them
    vs.filterNot(_._3).foreach { case (_, p, _) => fs.delete(p, true) }
    val vdir = new org.apache.hadoop.fs.Path(root, f"$VerPrefix$next%07d")
    df.write.mode(SaveMode.Overwrite).parquet(s"$vdir/data")
    // ---- the commit point: one small object PUT ----
    val marker =
      s"""{"version":$next,"batch_id":"${batchId.getOrElse("")}"}"""
    val out = fs.create(new org.apache.hadoop.fs.Path(vdir, Marker), false)
    try out.write((marker + "\n").getBytes("UTF-8")) finally out.close()
    // post-commit housekeeping — crash-safe to skip or die inside:
    // advisory manifest pointer, then prune beyond the keep window
    val mTmp = new org.apache.hadoop.fs.Path(root, "_MANIFEST")
    val mo = fs.create(mTmp, true)
    try mo.write((marker + "\n").getBytes("UTF-8")) finally mo.close()
    versions(spark, storeDir, table)
      .filter { case (v, _, committed) => committed && v <= next - keepVersions }
      .foreach { case (_, p, _) => fs.delete(p, true) }
    readTable(spark, storeDir, table).count()
  }

  /** Read-modify-write commit: `f(current)` becomes the next version.
    * The old version dir is immutable while the new one writes, so —
    * unlike [[Staging.stageAndSwap]] — a lineage that reads the store
    * needs no checkpoint staging and there is no delete-before-rename
    * window at all. */
  def commitTransform(spark: SparkSession, storeDir: String,
                      table: String, batchId: Option[String] = None,
                      keepVersions: Int = 2)
                     (f: DataFrame => DataFrame): Long =
    commit(spark, f(readTable(spark, storeDir, table)), storeDir, table,
      batchId, keepVersions)

  /** Upsert by key, versioned: replaced rows drop out, new rows land,
    * everything else carries forward — one new immutable version. */
  def mergeUpsert(spark: SparkSession, updates: DataFrame,
                  storeDir: String, table: String, key: String,
                  batchId: Option[String] = None): Long =
    if (!tableExists(spark, storeDir, table))
      commit(spark, updates, storeDir, table, batchId)
    else commitTransform(spark, storeDir, table, batchId) { store =>
      store.join(updates.select(key), Seq(key), "left_anti")
        .unionByName(updates)
    }

  /** Targeted key deletion, versioned. Missing table = nothing to
    * delete. */
  def deleteKeys(spark: SparkSession, keys: DataFrame, storeDir: String,
                 table: String, key: String,
                 batchId: Option[String] = None): Long = {
    if (!tableExists(spark, storeDir, table)) return 0L
    val doomed = keys.select(org.apache.spark.sql.functions
      .col(keys.columns.head).as(key)).distinct()
    commitTransform(spark, storeDir, table, batchId) { store =>
      store.join(doomed, Seq(key), "left_anti")
    }
  }
}
