package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for the single-row-group scan bottleneck: the bench
  * corpora are one parquet file with ONE row group per table, so a
  * scan is one task and every kernel-dense narrow stage (md5 feature
  * hashing, tokenization, regex) runs on one core of local[32].
  * Measures representative kernels with and without a post-scan
  * widen. Guide §2.5: "input skew — one huge unsplittable file …
  * repartition immediately after the read". */
object ScanWidthProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println("SCANPROBE scan partitions = " + docs.rdd.getNumPartitions)
    def time(label: String)(f: => Any): Unit = {
      f; f
      val t0 = System.nanoTime(); f
      println(f"SCANPROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def gramCount(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), explode(
        graft.functions.native.char_ngram_md5_buckets(
          lower(trim(col("text"))), 3, 4096)).as("__b"))
      .groupBy("doc_id", "__b").count()
      .queryExecution.toRdd.count()
    time("md5 trigrams, narrow scan")(gramCount(docs))
    time("md5 trigrams, repartition(32)")(gramCount(docs.repartition(32)))
    def tokCount(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(graft.ext.TextOps.tokens(col("text"))).as("t"))
      .groupBy("t").count().queryExecution.toRdd.count()
    time("tokenize+explode, narrow scan")(tokCount(docs))
    time("tokenize+explode, repartition(32)")(tokCount(docs.repartition(32)))
    def dupShare(df: org.apache.spark.sql.DataFrame) =
      graft.ext.DedupOps.corpusDupNgramShare(df, "doc_id", "text", 5)
        .queryExecution.toRdd.count()
    time("corpusDupNgramShare, narrow")(dupShare(docs))
    time("corpusDupNgramShare, widened")(dupShare(docs.repartition(32)))
    def strip(df: org.apache.spark.sql.DataFrame) =
      graft.ext.DedupOps.stripDupSpans(df, "doc_id", "text", 5)
        .queryExecution.toRdd.count()
    time("stripDupSpans, narrow")(strip(docs))
    time("stripDupSpans, widened")(strip(docs.repartition(32)))
    def topng(df: org.apache.spark.sql.DataFrame) =
      graft.ext.TextOps.topNgrams(df, Seq("lang"), col("text"), 3, 5)
        .queryExecution.toRdd.count()
    time("topNgrams, narrow")(topng(docs))
    time("topNgrams, widened")(topng(docs.repartition(32)))
    spark.stop()
  }
}
