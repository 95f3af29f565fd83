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
}
