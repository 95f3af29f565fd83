package graft.io

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Exact row counts from parquet FOOTER metadata — the commit-path
  * replacement for `spark.read.parquet(dir).count()`.
  *
  * Every store commit in this repo returns the post-commit row count
  * (the operator's acknowledgement surface). Computing it as a Spark
  * `count()` pays, per commit: a driver file listing, a schema
  * inference footer pass, a job submission, and a full task wave —
  * pure fixed cost that the guide's "remove work you throw away"
  * rule (§1.2) says to delete, since parquet footers already record
  * exact per-block row counts. Summing them is metadata-only I/O:
  * no task launch, no row decode, no schema inference. The value is
  * bit-identical to the count job's by construction (the parquet
  * spec requires exact counts; Spark's own metadata-only count
  * optimization relies on the same invariant).
  *
  * Scale posture: footer reads are one small ranged read per file,
  * parallelized across a bounded pool. Files-per-commit is bounded
  * by the commit's write parallelism (not by table size — the
  * VersionedStore partitioned path only writes TOUCHED partitions),
  * so the driver-side cost stays proportional to the batch, never
  * the store. A table format with manifest row counts (Iceberg,
  * Delta) makes this a pure metadata lookup; this is the raw-parquet
  * analog.
  */
object ParquetFooters {

  /** Recursively list data files under `dir`, skipping hidden
    * files/dirs (`_` / `.` prefixes) exactly as Spark's file index
    * does. A missing dir contributes no files (matches the explicit-
    * schema read of an all-empty dynamic-partition write). */
  private def dataFiles(fs: FileSystem, dir: Path): Seq[FileStatus] = {
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq.flatMap { st =>
      val name = st.getPath.getName
      if (name.startsWith("_") || name.startsWith(".")) Nil
      else if (st.isDirectory) dataFiles(fs, st.getPath)
      else Seq(st)
    }
  }

  /** Sum of footer row counts over every data file under `dirs`.
    * Footer reads run on the JVM common pool when the file count
    * makes it worthwhile. */
  def rowCount(spark: SparkSession, dirs: Seq[String]): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val files: Array[FileStatus] = dirs.iterator.flatMap { d =>
      val p = new Path(d)
      dataFiles(p.getFileSystem(conf), p)
    }.toArray
    def countOf(st: FileStatus): Long = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromStatus(st, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }
    if (files.length <= 4) files.iterator.map(countOf).sum
    else java.util.Arrays.stream(files).parallel()
      .mapToLong(st => countOf(st)).sum()
  }
}
