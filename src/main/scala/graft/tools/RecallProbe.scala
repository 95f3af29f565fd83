package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{DedupOps, VectorOps}

/** Builder-side diagnostic: print the realized recall of the
  * production LSH paths against their exact ground truths at a given
  * SF — the measurement behind the invariant floors in the
  * `ann_lsh_topk` / `dedup_minhash_lsh` oracle queries.
  *
  * Usage: sbt "runMain graft.tools.RecallProbe <sfDir>"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ANN LSH per-query recall vs brute force, by (bits, tables)
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
    val exact = VectorOps.bruteForceTopK(emb, queries,
      "vec_id", "embedding", 10)
    // top-1 structure: does each query have a near-dup partner, and
    // does the production LSH find the top-1?
    val top1 = exact.groupBy("query_id")
      .agg(max(col("cosine_sim")).as("s1")).orderBy("query_id").collect()
    println("top1 sims: " + top1.map(r =>
      f"q${r.getLong(0)}=${r.getDouble(1)}%.3f").mkString(" "))
    for ((bits, tables) <- Seq((8, 4), (8, 8), (6, 8), (6, 12))) {
      val hits = VectorOps.lshTopK(emb, queries, "vec_id", "embedding",
          10, bits = bits, tables = tables)
        .join(exact.select(col("query_id"), col("neighbor_id"),
          lit(true).as("__hit")), Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(sum(when(col("__hit"), 1).otherwise(0)).as("n_hit"),
          count(lit(1)).as("n_ret"))
        .orderBy("query_id").collect()
      println(s"ann bits=$bits tables=$tables: " + hits.map(r =>
        s"q${r.getLong(0)}=${r.getLong(1)}/${r.getLong(2)}").mkString(" "))
    }

    // minhash production recall vs %5-subset exact truth, by
    // (shingleSize, maxBucketSize)
    val docs = Tables.documents(spark, sfDir).repartition(32)
    val truth = DedupOps.minhashNearDupPairs(
        docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", shingleSize = 1, numHashes = 64, bands = 16,
        threshold = 0.9, maxBucketSize = Int.MaxValue)
      .select(col("id_a"), col("id_b"), lit(true).as("__t"))
    // identical-token-set truth (full corpus): these pairs share ALL
    // band buckets, so only the cap can lose them
    val keyed = docs.select(col("doc_id"),
      md5(array_join(array_sort(array_distinct(
        graft.ext.TextOps.tokens(col("text")))), "\u001E")).as("__k"))
    val idTruth = keyed.toDF("id_a", "__k")
      .join(keyed.toDF("id_b", "__k"), Seq("__k"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(true).as("__t"))
    for ((sh, cap) <- Seq((1, 50), (1, 200), (1, 500), (1, 1000))) {
      val t0 = System.nanoTime()
      val found = DedupOps.minhashNearDupPairs(docs, "doc_id", "text",
          shingleSize = sh, numHashes = 64, bands = 16,
          threshold = 0.9, maxBucketSize = cap)
        .select(col("id_a"), col("id_b"), lit(true).as("__f"))
      val r = idTruth.join(found, Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("n_truth"),
          sum(when(col("__f"), 1).otherwise(0)).as("n_hit")).head()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"ident-minhash shingle=$sh cap=$cap: " +
        f"hit=${r.getLong(1)}/${r.getLong(0)} ${secs}%.1f s")
    }
    for ((sh, cap) <- Seq((3, 50), (3, 200), (3, 500), (1, 50), (1, 200))) {
      val t0 = System.nanoTime()
      val found = DedupOps.minhashNearDupPairs(docs, "doc_id", "text",
          shingleSize = sh, numHashes = 64, bands = 16,
          threshold = 0.9, maxBucketSize = cap)
        .filter(col("id_a") % 5 === 0 && col("id_b") % 5 === 0)
        .select(col("id_a"), col("id_b"), lit(true).as("__f"))
      val r = truth.join(found, Seq("id_a", "id_b"), "full_outer")
        .agg(sum(when(col("__t"), 1).otherwise(0)).as("n_truth"),
          sum(when(col("__t") && col("__f"), 1).otherwise(0)).as("n_hit"),
          sum(when(col("__t").isNull, 1).otherwise(0)).as("n_phantom"))
        .head()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"minhash shingle=$sh cap=$cap: hit=${r.getLong(1)}/" +
        f"${r.getLong(0)} phantom=${r.getLong(2)} ${secs}%.1f s")
    }
    spark.stop()
  }
}
