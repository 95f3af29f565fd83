package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{DedupOps, TextOps}

/** Stage-by-stage profiling of the minhash pipeline. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, sfDir)
    val toks = TextOps.tokens(col("text"))
    val sigs = docs.select(col("doc_id").as("doc_id"),
      DedupOps.minhashSignature(DedupOps.shingles(toks, 3), 64)
        .as("__sig"))
    time("signatures")(sigs.count())
    sigs.cache(); sigs.count()
    val banded = sigs.select(col("doc_id"),
      explode(DedupOps.lshBandKeys(col("__sig"), 16, 4)).as("__band"))
    val hist = time("bucket histogram")(
      banded.groupBy("__band").count()
        .select(max("count"), count(lit(1)),
          sum(when(col("count") > 50, col("count") * col("count"))),
          sum(col("count") * col("count"))).head())
    println(s"PROFILE maxBucket=${hist.get(0)} nBuckets=${hist.get(1)} " +
      s"hotPairWeight=${hist.get(2)} totalPairWeight=${hist.get(3)}")
    val cand = time("candidates")(
      DedupOps.minhashCandidates(sigs, 16, 4).count())
    println(s"PROFILE nCandidates=$cand")
    sigs.unpersist()
    val full = DedupOps.minhashNearDupPairs(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.0,
      maxCandidates = 1000)
    time("full pairs uncached")(println("rows=" + full.count()))
    spark.stop()
  }
}
