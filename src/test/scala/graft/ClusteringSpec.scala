package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Staging
import scala.jdk.CollectionConverters._

/** Physical-layout evidence for [[Staging.writeClusteredBy]]: the
  * point of a clustered write is that parquet footer min/max stats
  * become selective, so this spec asserts the property from the
  * ACTUAL footers, not from plan shape. */
class ClusteringSpec extends SparkSpec {

  /** (min, max) of the int64 column `c` from each parquet file's
    * footer row-group stats. */
  private def fileRanges(dir: String, c: String): Seq[(Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f.getPath), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val stats = r.getFooter.getBlocks.asScala.flatMap { b =>
            b.getColumns.asScala
              .find(_.getPath.toDotString == c).map(_.getStatistics)
          }
          (stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].toLong).min,
            stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].toLong).max)
        } finally r.close()
      }
  }
  test("writeClusteredBy yields near-disjoint per-file key ranges; " +
    "unclustered files all span the full domain") {
    val dir = Files.createTempDirectory("graft-cluster").toString
    val n = 100000L
    // write in key-scrambled order (hash order ≈ worst case layout)
    val df = spark.range(n).toDF("k")
      .withColumn("payload", expr("k * 7"))
      .orderBy(xxhash64(col("k")))
    Staging.overwriteParquet(df.repartition(8), dir, "plain")
    Staging.writeClusteredBy(df, dir, "clustered", Seq("k"), files = 8)

    val plain = fileRanges(s"$dir/plain", "k")
    val clustered = fileRanges(s"$dir/clustered", "k")
    assert(plain.size == 8 && clustered.size == 8)
    // unclustered: every file's range covers ~the whole domain → a
    // point predicate can prune (almost) nothing
    assert(plain.forall { case (lo, hi) => hi - lo > n * 8 / 10 })
    // clustered: ranges are narrow (≈ n/files) and near-disjoint — a
    // point predicate matches exactly one file's range
    assert(clustered.forall { case (lo, hi) => hi - lo < n / 4 })
    val probe = 12345L
    assert(clustered.count { case (lo, hi) => lo <= probe && probe <= hi }
      == 1)
    // ranges tile the domain (sorted by min, each max < next min)
    val sorted = clustered.sortBy(_._1)
    assert(sorted.sliding(2).forall {
      case Seq((_, hi), (lo2, _)) => hi < lo2
      case _ => true
    })
    // and the data round-trips identically
    assert(Staging.readTable(spark, dir, "clustered").count() == n)
  }

  test("writeZOrdered files tile BOTH dimensions; single-key " +
    "clustering leaves the trailing dimension full-width") {
    val dir = Files.createTempDirectory("graft-zorder").toString
    // full 256x256 grid, written in scrambled order
    val n = 65536L
    val df = spark.range(n).toDF("id")
      .withColumn("k1", expr("id % 256"))
      .withColumn("k2", expr("id div 256"))
      .orderBy(xxhash64(col("id")))
    Staging.writeClusteredBy(df, dir, "bykey1", Seq("k1"), files = 16)
    Staging.writeZOrdered(df, dir, "zordered", "k1", "k2",
      files = 16, bits = 8)

    // single-key clustering: k1 ranges narrow, but every file spans
    // ~the whole k2 domain — a k2 predicate prunes nothing
    val byKey1K2 = fileRanges(s"$dir/bykey1", "k2")
    assert(byKey1K2.forall { case (lo, hi) => hi - lo > 256 * 8 / 10 })

    // z-order: files are compact rectangles of the plane. Sampled
    // range boundaries that straddle a MAJOR Morton quadrant
    // boundary legitimately widen ONE dimension for that file (~3-4
    // of 15 boundaries are major), so the tiling property is: the
    // typical file is narrow in BOTH dims, and a point predicate on
    // EITHER dim prunes most files — vs single-key clustering where
    // every k2 probe hits every file
    val zK1 = fileRanges(s"$dir/zordered", "k1")
    val zK2 = fileRanges(s"$dir/zordered", "k2")
    assert(zK1.size == 16 && zK2.size == 16)
    assert(zK1.count { case (lo, hi) => hi - lo <= 256 * 5 / 8 } >= 12,
      zK1.toString)
    assert(zK2.count { case (lo, hi) => hi - lo <= 256 * 5 / 8 } >= 12,
      zK2.toString)
    // pruning evidence on BOTH dimensions: a point predicate
    // overlaps only a minority of z-ordered files
    val probe = 40L
    assert(zK1.count { case (lo, hi) => lo <= probe && probe <= hi }
      <= 8, zK1.toString)
    assert(zK2.count { case (lo, hi) => lo <= probe && probe <= hi }
      <= 8, zK2.toString)
    // and the data round-trips identically
    assert(Staging.readTable(spark, dir, "zordered").count() == n)
  }
}
