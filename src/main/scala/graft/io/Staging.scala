package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, floor, greatest,
  least, lit, max, min, shiftleft, shiftright}
import org.apache.spark.sql.types.StructType

/** Sources and sinks F1-F6 (SURVEY.md §2.1).
  *
  * The reference stages everything as timestamped CSVs under an object
  * -store prefix (`data/utils.py`), appends new rows into an
  * operational store (`transformation_db.py:116`), and truncate-loads
  * a derived mart (`transformation_dw.py:154-156` et al.). Here the
  * staging layer is a CSV directory glob and the stores are parquet
  * directories — same topology, engine-native formats. On a cluster
  * the paths are object-store URIs; nothing else changes.
  */
object Staging {

  /** TEST-ONLY failpoint (StoreOpsSpec crash-window drills): when
    * non-null, a partition-swap rename whose DESTINATION path matches
    * the predicate behaves as a filesystem rename failure — Hadoop
    * reports most real ones as `false`, not an exception, which is
    * exactly the window the swap protocol's result-checking guards.
    * Production code never sets this. */
  @volatile private[graft] var renameFailpoint: String => Boolean = null

  /** Scheme-agnostic probe: does `prefix` contain any `*.csv`?
    * Resolved through Hadoop's [[org.apache.hadoop.fs.FileSystem]] so
    * the same code answers correctly for `file:`, `hdfs:`, `s3a:`,
    * `gs:` — the reference's staging layer IS an object store
    * (`data/utils.py:28-34` lists GCS blobs), and a `java.io.File`
    * probe there would silently report "no files" and turn the
    * operational load into a no-op. */
  private def hasCsvFiles(spark: SparkSession, prefix: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(s"$prefix/*.csv")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hits = fs.globStatus(path)
    hits != null && hits.nonEmpty
  }

  /** F1 — multi-file CSV scan: read every `*.csv` under a prefix and
    * union (reference `load_csv_from_gcs_to_df`, utils.py:28-45).
    * Spark globs + unions natively and splits large files; the schema
    * is explicit instead of per-file inferred. Missing/empty prefix →
    * empty frame (reference utils.py:43-45 fallback). */
  def readCsvPrefix(spark: SparkSession, prefix: String,
                    schema: StructType): DataFrame = {
    if (!hasCsvFiles(spark, prefix)) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.option("header", "true").schema(schema)
      .csv(s"$prefix/*.csv")
  }

  /** F1 with row-level error isolation: the reference catches
    * exceptions per record and skips them (extraction.py:160-165).
    * The Spark form is PERMISSIVE parsing with a corrupt-record
    * column: malformed rows are captured, well-formed rows load.
    * Returns (clean rows, corrupt raw lines).
    *
    * SCALE NOTE: `cache = true` (the default) caches the parsed input
    * so the clean/corrupt split is one parse; Spark requires a
    * materialization boundary before filtering `_corrupt_record`
    * anyway. At 100 TB staging batches a full-input cache is the
    * wrong trade — pass `cache = false` to parse the prefix twice
    * instead (two streaming scans, zero memory footprint; the
    * `spark.read.json/csv`-equivalent of a `badRecordsPath` sink). */
  def readCsvPrefixIsolated(spark: SparkSession, prefix: String,
                            schema: StructType,
                            cache: Boolean = true): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType))
    def parse() =
      if (!hasCsvFiles(spark, prefix)) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], withCorrupt)
      else {
        val df = spark.read
          .option("header", "true")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .schema(withCorrupt)
          .csv(s"$prefix/*.csv")
        // corrupt-record access requires a materialization boundary
        // when the query touches ONLY the corrupt column (Spark
        // disallows that on the streaming parse path)
        if (cache) df.cache() else df
      }
    val raw = parse()
    val raw2 = if (cache) raw else parse()
    val clean = raw.filter(raw("_corrupt_record").isNull)
      .drop("_corrupt_record")
    // keep a real column referenced on the uncached path so the scan
    // is never corrupt-column-only (the restriction above), then drop
    val corrupt = raw2.filter(raw2("_corrupt_record").isNotNull)
      .select("_corrupt_record", schema.fieldNames.head)
      .select("_corrupt_record")
    (clean, corrupt)
  }

  /** F2 — timestamped CSV sink: `{base}_{yyyyMMdd_HHmmss}.csv`
    * (reference `save_df_to_gcs`, utils.py:6-26). The reference writes
    * one blob; we keep that contract for small staging batches via
    * coalesce(1) — large frames should use [[appendParquet]] instead. */
  def writeCsvStamped(df: DataFrame, prefix: String,
                      baseName: String): String = {
    val stamp = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd_HHmmss").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    val path = s"$prefix/${baseName}_$stamp.csv"
    df.coalesce(1).write.option("header", "true")
      .mode(SaveMode.Overwrite).csv(path)
    path
  }

  /** F4 — full-table scan of an operational store table. */
  def readTable(spark: SparkSession, storeDir: String,
                table: String): DataFrame =
    spark.read.parquet(s"$storeDir/$table")

  /** Scheme-agnostic existence probe (see [[hasCsvFiles]]): a
    * `java.io.File` check here would make [[ensureTable]] re-truncate
    * and `loadIfNew` skip its anti-join (double-append) the moment the
    * store lives on an object store. */
  def tableExists(spark: SparkSession, storeDir: String,
                  table: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(s"$storeDir/$table")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path)
  }

  /** F5 — append sink (reference `to_sql(if_exists='append')`,
    * transformation_db.py:116). */
  def appendParquet(df: DataFrame, storeDir: String, table: String): Unit =
    df.write.mode(SaveMode.Append).parquet(s"$storeDir/$table")

  /** Partitioned append: new files land inside the partition dirs,
    * existing files are never touched (the layout the incremental IVF
    * postings store uses so probes read only their partitions). */
  def appendPartitioned(df: DataFrame, storeDir: String, table: String,
                        partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Append)
      .partitionBy(partitionCols: _*)
      .parquet(s"$storeDir/$table")

  /** F6 — truncate-load sink (reference BigQuery WRITE_TRUNCATE,
    * transformation_dw.py:154-156). */
  def overwriteParquet(df: DataFrame, storeDir: String,
                       table: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$storeDir/$table")

  /** Store-format marker: a tiny `_graft_<name>` file beside an
    * index/store's tables holding a format-version string. Readers
    * probe it to decide whether a persisted layout predates an
    * on-disk-format change (e.g. the sorted `__tokset` arrays the
    * incremental-minhash verify kernel requires since r13) and fall
    * back to a defensive normalization instead of silently
    * mis-reading legacy data. Hadoop-FS (scheme-agnostic), same
    * reasoning as [[tableExists]]; overwrite is atomic-enough for a
    * single small file written once at store creation. */
  def writeMarker(spark: SparkSession, storeDir: String, name: String,
                  value: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(s"$storeDir/_graft_$name")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(value.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a [[writeMarker]] stamp; None when the marker is absent
    * (legacy store or fresh dir). */
  def readMarker(spark: SparkSession, storeDir: String,
                 name: String): Option[String] = {
    val path = new org.apache.hadoop.fs.Path(s"$storeDir/_graft_$name")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      try {
        val bytes = new Array[Byte](256)
        val n = math.max(0, in.read(bytes))
        Some(new String(bytes, 0, n,
          java.nio.charset.StandardCharsets.UTF_8).trim)
      } finally in.close()
    }
  }

  /** F6 at the 100 TB form — partition-scoped truncate-load: the
    * frame is written `partitionBy(partitionCols)` with DYNAMIC
    * partition overwrite, so only the partitions the frame actually
    * emits are replaced; every other partition's files are untouched.
    * Rebuilding one day of a date-partitioned fact table is then a
    * one-day write, not a full-table rewrite (SCALING.md names this
    * as the replaceWhere-style scale path for the mart). The option
    * is set per-write, not session-wide, so plain [[overwriteParquet]]
    * keeps its whole-table truncate semantics. */
  def overwritePartitionsDynamic(df: DataFrame, storeDir: String,
                                 table: String,
                                 partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(s"$storeDir/$table")

  /** Bucketed store write: co-locates future joins/aggregations on
    * `bucketCols` — a table bucketed and sorted on its join key joins
    * another table with the same bucketing WITHOUT a shuffle on
    * either side (asserted in BucketingSpec). At 100 TB this is the
    * difference between re-shuffling every fact join and reading
    * pre-shuffled data (SCALING.md, joins). Requires a catalog table
    * (bucket metadata lives in the catalog, not the files). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Clustered (sorted) write: range-partition the frame on
    * `clusterCols` and sort within each partition before writing, so
    * every output file covers a NARROW, near-disjoint key range. The
    * payoff is file/row-group SKIPPING: parquet footers carry per-
    * column min/max stats, and a pushed-down predicate on the cluster
    * key then eliminates the files/row groups whose range can't match
    * — on a 100 TB table a point or range query reads a handful of
    * files instead of all of them. Unclustered writes spread every
    * key across every file (each file's [min,max] ≈ the full domain),
    * making the same stats useless. The physical property (disjoint
    * per-file ranges) is asserted from the actual parquet footers in
    * ClusteringSpec, not assumed. `repartitionByRange` samples the
    * data to pick balanced boundaries — one extra pass, the standard
    * price of clustering at write time, amortized over every
    * subsequent pruned read. */
  def writeClusteredBy(df: DataFrame, storeDir: String, table: String,
                       clusterCols: Seq[String], files: Int): Unit =
    df.repartitionByRange(files, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(s"$storeDir/$table")

  /** Z-order (Morton-curve) clustered write over TWO numeric
    * dimensions: each row's dimensions are bucketed to `2^bits` cells
    * and the cell ids bit-interleaved into one z-value; range
    * partitioning + in-partition sort on z makes every file cover a
    * compact RECTANGLE of the 2-D key space, so footer min/max stats
    * prune files on predicates over EITHER dimension (or both) — the
    * property single-key clustering ([[writeClusteredBy]]) only gives
    * the leading key. Asserted from actual footers in ClusteringSpec.
    *
    * Bucketing is linear over each dimension's observed [min, max]
    * (one tiny agg, broadcast back — no driver-side pass over data).
    * Heavily skewed dimensions would want quantile boundaries instead
    * (same z-map, different bucket function); linear keeps the map a
    * pure codegen'd expression. The interleave itself unrolls to
    * `2*bits` constant shift/or terms inside whole-stage codegen. */
  def writeZOrdered(df: DataFrame, storeDir: String, table: String,
                    colA: String, colB: String, files: Int,
                    bits: Int = 12): Unit = {
    val stats = df.agg(
      min(col(colA)).cast("double").as("__alo"),
      max(col(colA)).cast("double").as("__ahi"),
      min(col(colB)).cast("double").as("__blo"),
      max(col(colB)).cast("double").as("__bhi"))
    val cells = (1L << bits) - 1
    def bucket(c: String, lo: Column, hi: Column): Column =
      least(lit(cells), greatest(lit(0L),
        floor((col(c).cast("double") - lo) /
          ((hi - lo) / lit(cells.toDouble) + lit(Double.MinPositiveValue)))
          .cast("bigint")))
    def interleave(a: Column, b: Column): Column =
      (0 until bits).foldLeft(lit(0L)) { (z, i) =>
        z.bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)),
            2 * i + 1))
          .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)),
            2 * i))
      }
    df.crossJoin(broadcast(stats))
      .withColumn("__z", interleave(
        bucket(colA, col("__alo"), col("__ahi")),
        bucket(colB, col("__blo"), col("__bhi"))))
      .drop("__alo", "__ahi", "__blo", "__bhi")
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(s"$storeDir/$table")
  }

  /** Schema-evolving append: like [[appendParquet]], but a read
    * through [[readTableEvolved]] merges the schemas of every file,
    * so a batch that ADDS columns doesn't require rewriting history —
    * old rows surface the new columns as NULL. The scale form of
    * "ALTER TABLE ADD COLUMN" on a file store: zero data movement. */
  def appendParquetEvolving(df: DataFrame, storeDir: String,
                            table: String): Unit =
    df.write.mode(SaveMode.Append)
      .option("mergeSchema", "true")
      .parquet(s"$storeDir/$table")

  /** Read with per-file schema merging (pairs with
    * [[appendParquetEvolving]]). Schema merge reads footers only, not
    * data; reserve it for evolving tables — fixed-schema reads keep
    * the cheaper [[readTable]]. */
  def readTableEvolved(spark: SparkSession, storeDir: String,
                       table: String): DataFrame =
    spark.read.option("mergeSchema", "true")
      .parquet(s"$storeDir/$table")

  /** Upsert (merge) into a parquet store table: rows in `updates`
    * replace same-key rows in the store; new keys append. Parquet has
    * no transactional MERGE, so this is the read-join-rewrite form:
    * keep = store ⟕anti updates, result = keep ∪ updates, full
    * overwrite. At 100 TB the rewrite must be scoped — pass
    * `partitionCols` to rewrite with dynamic partition overwrite so
    * only partitions containing updated keys (plus those the updates
    * introduce) are rewritten, not the whole table. Updates must then
    * carry the partition columns. Returns the new total row count. */
  def mergeUpsert(spark: SparkSession, updates: DataFrame,
                  storeDir: String, table: String, key: String,
                  partitionCols: Seq[String] = Nil): Long = {
    val path = s"$storeDir/$table"
    if (!tableExists(spark, storeDir, table)) {
      if (partitionCols.isEmpty) overwriteParquet(updates, storeDir, table)
      else overwritePartitionsDynamic(updates, storeDir, table, partitionCols)
      // count from the WRITTEN footers — a `updates.count()` here
      // re-executed the whole updates lineage a second time
      return ParquetFooters.rowCount(spark, Seq(path))
    }
    val store = readTable(spark, storeDir, table)
    if (partitionCols.isEmpty) {
      val merged = store.join(updates.select(key), Seq(key), "left_anti")
        .unionByName(updates)
      // the overwrite reads its own input: stage through a checkpoint
      // dir, then swap — the shared protocol checks the rename result
      // and diagnoses leftover-temp crash windows ("mergefull" marker,
      // distinct from the partition branch's "__merge_tmp_" staging
      // which is cleared unconditionally at its start)
      return stageAndSwap(spark, merged, storeDir, table, "mergefull")
    } else {
      // partition-scoped: rewrite every partition the merge AFFECTS —
      // the partitions the updates write INTO (their surviving rows
      // must be re-emitted or they are lost) plus the partitions
      // updated keys currently live in (covers a key MOVING between
      // partitions)
      val touched = store.join(updates.select(key), Seq(key), "left_semi")
        .select(partitionCols.map(col): _*)
        .unionByName(updates.select(partitionCols.map(col): _*))
        .distinct()
      val keep = semiJoinNullSafe(store, touched, partitionCols)
        .join(updates.select(key), Seq(key), "left_anti")
      val merged = keep.unionByName(updates)
      swapTouchedPartitions(spark, merged, storeDir, table,
        partitionCols, touched)
    }
    // post-commit acknowledgement count from footers (ParquetFooters
    // scaladoc) — not a Spark count job over the table
    ParquetFooters.rowCount(spark, Seq(path))
  }

  /** Partition-scoped stage-and-swap shared by [[mergeUpsert]] and
    * [[deleteKeys]]: stage `merged` — whose lineage READS the store —
    * through a temp directory, fully materialized on durable storage
    * BEFORE any store file is touched, then swap partition
    * directories into place via backup-then-rename. The swap never
    * deletes the only copy of a partition: the old directory is MOVED
    * to a per-run backup first, the new one renamed in (result
    * CHECKED — Hadoop rename reports most failures as `false`, not an
    * exception), and the backup dropped only after every partition
    * swapped. A crash mid-swap leaves each partition's data in
    * exactly one of store/backup/temp — recoverable by an operator,
    * never silently gone. (Atomic MULTI-partition commit is beyond
    * what raw parquet directories can express; a transactional table
    * format is the production answer, and the scope here is
    * documented, not hidden.)
    *
    * `merged` must emit ONLY rows belonging to `touched` partitions
    * (plus any brand-new partitions); untouched partitions' files are
    * never listed, read, or moved. A touched partition `merged` emits
    * NO rows for is displaced to the backup (i.e. logically deleted). */
  private def swapTouchedPartitions(spark: SparkSession,
                                    merged: DataFrame, storeDir: String,
                                    table: String,
                                    partitionCols: Seq[String],
                                    touched: DataFrame): Unit = {
      val path = s"$storeDir/$table"
      val tmp = s"$storeDir/__merge_tmp_$table"
      val bak = s"$storeDir/__merge_bak_$table"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmpPath = new org.apache.hadoop.fs.Path(tmp)
      val bakPath = new org.apache.hadoop.fs.Path(bak)
      require(!fs.exists(bakPath),
        s"$bak exists — a previous merge crashed mid-swap; restore or " +
          "remove it before re-running (it holds pre-merge partitions)")
      fs.delete(tmpPath, true)
      merged.write.mode(SaveMode.Overwrite)
        .partitionBy(partitionCols: _*).parquet(tmp)
      // `partitionBy` renders directory names with Spark's own value
      // escaping (':' → '%3A', NULL → __HIVE_DEFAULT_PARTITION__) —
      // listing the temp dir therefore yields the authoritative
      // relative paths, identical to what a dynamic overwrite of the
      // store would have produced. Walk partitionCols.size levels to
      // collect "c1=v1/c2=v2"-style relative paths.
      def listPartDirs(base: org.apache.hadoop.fs.Path, depth: Int,
                       prefix: String): Seq[String] =
        if (depth == 0) Seq(prefix)
        else fs.listStatus(base).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.contains("="))
          .flatMap { s =>
            val rel = if (prefix.isEmpty) s.getPath.getName
                      else s"$prefix/${s.getPath.getName}"
            listPartDirs(s.getPath, depth - 1, rel)
          }
      val emitted = listPartDirs(tmpPath, partitionCols.size, "")
      // a touched partition whose every row was an updated key that
      // moved elsewhere emits nothing — its stale store files are
      // cleared explicitly. The collect is bounded by the update
      // batch's partition count (maintenance-op constant, not a data
      // scan) and runs BEFORE the store is mutated. Values go through
      // Spark's string cast so non-string partition types render as
      // the directory names do (e.g. timestamps without a JVM
      // toString trailing '.0').
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      val touchedSubs = touched.select(
        partitionCols.map(c => col(c).cast("string").as(c)): _*)
        .collect()
        .map { row =>
          partitionCols.zipWithIndex.map { case (c, i) =>
            val v =
              if (row.isNullAt(i)) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
              else ExternalCatalogUtils.escapePathName(row.getString(i))
            s"$c=$v"
          }.mkString("/")
        }.toSet
      // swap staged partitions into the store (replace-or-add):
      // old → backup, new → store, both renames result-checked; a
      // failure aborts with store+backup+temp all intact. Untouched
      // partitions' files are never listed, read, or moved.
      def renameChecked(src: org.apache.hadoop.fs.Path,
                        dst: org.apache.hadoop.fs.Path): Unit = {
        val fp = renameFailpoint
        if ((fp != null && fp(dst.toString)) || !fs.rename(src, dst))
          throw new java.io.IOException(
            s"rename $src -> $dst failed; merge aborted with data " +
              s"intact (new data in $tmp, displaced partitions in $bak)")
      }
      def moveToBackup(rel: String): Unit = {
        val dst = new org.apache.hadoop.fs.Path(s"$path/$rel")
        if (fs.exists(dst)) {
          val b = new org.apache.hadoop.fs.Path(s"$bak/$rel")
          fs.mkdirs(b.getParent)
          renameChecked(dst, b)
        }
      }
      emitted.foreach { rel =>
        moveToBackup(rel)
        val dst = new org.apache.hadoop.fs.Path(s"$path/$rel")
        fs.mkdirs(dst.getParent)
        renameChecked(new org.apache.hadoop.fs.Path(s"$tmp/$rel"), dst)
      }
      // touched-but-empty partitions (every surviving row was removed
      // or moved elsewhere): displaced to backup, not deleted
      (touchedSubs -- emitted).foreach(moveToBackup)
      // all partitions swapped — drop the backup and temp scaffolding
      fs.delete(bakPath, true)
      fs.delete(tmpPath, true)
      // a swap can empty the table entirely (every partition touched,
      // none re-emitted — e.g. deleteKeys of the last rows): a dir
      // with zero data files is UNREADABLE (no schema to infer), so
      // materialize an explicit empty table with the full schema
      // (partition cols as ordinary columns — Spark writes one empty
      // file for an empty frame precisely to preserve schema). A later
      // REPOPULATION of the emptied table must go through a full
      // overwrite (overwriteParquet / mergeUpsert whole-table), not a
      // dynamic-partition write, which would leave this root file
      // beside new partition dirs (conflicting layouts).
      val anyLeft = fs.listStatus(new org.apache.hadoop.fs.Path(path))
        .exists(s => s.isDirectory && s.getPath.getName.contains("="))
      if (!anyLeft)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          merged.schema)
          .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Null-safe partition-membership semi-join: `Seq(cols)` join keys
    * use null-UNSAFE equality, so rows of a NULL-valued partition
    * (`__HIVE_DEFAULT_PARTITION__`) would never match `touched` — the
    * swap would then displace the whole null partition while its
    * surviving rows were never re-emitted: silent data loss. `<=>`
    * treats NULL = NULL as true. */
  private def semiJoinNullSafe(store: DataFrame, touched: DataFrame,
                               partitionCols: Seq[String]): DataFrame = {
    val t = touched.toDF(partitionCols.map("__t_" + _): _*)
    store.join(t, partitionCols.map(c => store(c) <=> t(s"__t_$c"))
      .reduce(_ && _), "left_semi")
  }

  /** Targeted key deletion ("forget these ids") — the
    * right-to-be-forgotten operation a production store needs. The
    * whole-table form anti-joins and swaps; the partition-scoped form
    * rewrites ONLY partitions that actually hold a doomed key (same
    * backup-then-rename protocol as [[mergeUpsert]]), so deleting a
    * handful of users from a date-partitioned 100 TB store rewrites a
    * handful of partitions, not the table. `keys` is a one-column
    * frame of ids to remove. A missing table is "nothing to delete"
    * (returns 0), not an error. Returns the new total row count. */
  def deleteKeys(spark: SparkSession, keys: DataFrame,
                 storeDir: String, table: String, key: String,
                 partitionCols: Seq[String] = Nil): Long = {
    if (!tableExists(spark, storeDir, table)) return 0L
    val store = readTable(spark, storeDir, table)
    val doomed = keys.select(col(keys.columns.head).as(key)).distinct()
    if (partitionCols.isEmpty) {
      val kept = store.join(doomed, Seq(key), "left_anti")
      return stageAndSwap(spark, kept, storeDir, table, "delete")
    }
    // only partitions holding a doomed key are rewritten
    val touched = store.join(doomed, Seq(key), "left_semi")
      .select(partitionCols.map(col): _*)
      .distinct()
    val kept = semiJoinNullSafe(store, touched, partitionCols)
      .join(doomed, Seq(key), "left_anti")
    swapTouchedPartitions(spark, kept, storeDir, table,
      partitionCols, touched)
    ParquetFooters.rowCount(spark, Seq(s"$storeDir/$table"))
  }

  /** Whole-table stage-and-swap for operators whose OUTPUT LINEAGE
    * READS THE STORE THEY REPLACE (rollup maintenance, SCD history —
    * anything read-modify-write): materialize `df` fully to a temp
    * directory, then delete-and-rename into place with the rename
    * result CHECKED. One shared implementation of the swap-safety
    * discipline (SCALING.md) so the crash-window handling cannot
    * drift between operators.
    *
    * Leftover temp handling distinguishes the two crash windows by
    * the parquet `_SUCCESS` marker:
    *   - no `_SUCCESS`: the previous run died DURING its temp write
    *     (by far the widest window) — the temp is partial garbage and
    *     the store is intact; it is deleted and this run proceeds;
    *   - `_SUCCESS` present: the previous run died in the
    *     milliseconds between its store delete and rename — the temp
    *     is the COMPLETE post-update state (the store may or may not
    *     still exist); this run REFUSES so the operator can rename it
    *     into place, because proceeding would re-fold a batch this
    *     run cannot identify. */
  def stageAndSwap(spark: SparkSession, df: DataFrame, storeDir: String,
                   table: String, markerPrefix: String): Long = {
    val path = s"$storeDir/$table"
    val tmp = new org.apache.hadoop.fs.Path(
      s"$storeDir/__${markerPrefix}_tmp_$table")
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tmp)) {
      val complete = fs.exists(
        new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"))
      if (complete)
        throw new IllegalStateException(
          s"$tmp exists with _SUCCESS — a previous $markerPrefix update " +
            s"crashed between its store delete and rename. It holds the " +
            s"COMPLETE post-update state: rename it to $path to finish " +
            "that update, and do NOT re-apply that run's batch")
      // partial write from a crashed run; the store was never touched
      fs.delete(tmp, true)
    }
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(path)))
      throw new java.io.IOException(
        s"rename $tmp -> $path failed; new state intact in $tmp")
    ParquetFooters.rowCount(spark, Seq(path))
  }

  /** Small-file compaction: rewrite a table directory into
    * ~`targetFileMB`-sized files. Streaming appends and incremental
    * loads accrete small files; at scale the file count (driver
    * listing, task scheduling, parquet footer reads) becomes the
    * bottleneck before data size does. Reads its own input → staged
    * through a temp dir and swapped, like [[mergeUpsert]]. */
  def compactTable(spark: SparkSession, storeDir: String, table: String,
                   targetFileMB: Int = 128): Long = {
    val path = s"$storeDir/$table"
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hp).getLength
    val nFiles = math.max(1L,
      bytes / (targetFileMB.toLong * 1024 * 1024)).toInt
    val df = readTable(spark, storeDir, table).repartition(nFiles)
    val tmp = s"$storeDir/__compact_tmp_$table"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    fs.delete(hp, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), hp)
    nFiles.toLong
  }

  /** Retention / TTL: drop whole partitions of a partitioned table by
    * predicate on the partition VALUE (e.g. `_ < "2024-01-01"` on a
    * date partition). Deleting a partition is a metadata-speed
    * directory removal — no scan, no rewrite — which is why retention
    * policy belongs in the partition scheme: row-level deletes at
    * 100 TB are rewrites. Returns the dropped partition values. */
  def dropPartitions(spark: SparkSession, storeDir: String, table: String,
                     partitionCol: String,
                     drop: String => Boolean): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(s"$storeDir/$table")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = s"$partitionCol="
    val dropped = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map(s => s.getPath)
      .filter(p => drop(p.getName.stripPrefix(prefix)))
    dropped.foreach(p => fs.delete(p, true))
    dropped.map(_.getName.stripPrefix(prefix))
  }

  /** D1/D2 — ensure a store table exists with its declared schema
    * (reference CREATE TABLE IF NOT EXISTS, transformation_db.py:11-89,
    * transformation_dw.py:6-120). Parquet stores are schema-on-write,
    * so "create if not exists" = write an empty frame once. */
  def ensureTable(spark: SparkSession, storeDir: String, table: String,
                  schema: StructType): Unit =
    if (!tableExists(spark, storeDir, table)) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode(SaveMode.Overwrite).parquet(s"$storeDir/$table")
    }
}
