package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ext.{VectorIndexOps, VectorOps}
import graft.io.Staging

/** Persisted incremental IVF index: batch-incremental build ≡
  * one-shot assignment (frozen centroids), exhaustive probe ≡ brute
  * force, sub-exhaustive recall floor, and replay idempotence of
  * search results under at-least-once appends. */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("3-batch incremental build: every vector indexed exactly once, " +
    "assignments identical to one-shot under the frozen centroids") {
    val dir = Files.createTempDirectory("graft-ivfidx").toString
    val emb = Tables.embeddings(spark, d)
    (0 until 3).foreach { i =>
      VectorIndexOps.updateIndex(spark,
        emb.filter(pmod(col("vec_id"), lit(3)) === i),
        "vec_id", "embedding", dir, nCentroids = 8)
    }
    val postings = Staging.readTable(spark, dir, "postings")
    assert(postings.count() == emb.count())
    assert(postings.select("doc_id").distinct().count() == emb.count())
    // frozen geometry: incremental assignment == one-shot assignment
    val cents = Staging.readTable(spark, dir, "centroids")
    val oneShot = VectorOps.assignToCentroids(emb, "vec_id", "embedding",
        cents)
      .select(col("vec_id").cast("long"), col("centroid_id").cast("long"))
      .as[(Long, Long)].collect().toMap
    val incremental = postings
      .select(col("doc_id").cast("long"), col("centroid_id").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(incremental == oneShot)
  }

  test("exhaustive probe equals brute force; sub-exhaustive probe " +
    "keeps a recall floor; replayed batch changes nothing") {
    val dir = Files.createTempDirectory("graft-ivfidx2").toString
    val emb = Tables.embeddings(spark, d)
    (0 until 3).foreach { i =>
      VectorIndexOps.updateIndex(spark,
        emb.filter(pmod(col("vec_id"), lit(3)) === i),
        "vec_id", "embedding", dir, nCentroids = 8)
    }
    val queries = emb.filter(col("vec_id") < 5)
    def results(nProbe: Int): Set[(Long, Long)] =
      VectorIndexOps.searchIndex(spark, queries, "vec_id", "embedding",
          dir, 10, nProbe)
        .select(col("query_id").cast("long"),
          col("neighbor_id").cast("long"))
        .as[(Long, Long)].collect().toSet
    val exact = VectorOps.bruteForceTopK(emb, queries, "vec_id",
        "embedding", 10)
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .as[(Long, Long)].collect().toSet
    val exhaustive = results(8)
    assert(exhaustive == exact)
    // probing a quarter of the lists keeps most true neighbors
    val partial = results(2)
    val recall = partial.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
    // at-least-once replay: re-appending batch 0 duplicates postings
    // but search results must not change
    VectorIndexOps.updateIndex(spark,
      emb.filter(pmod(col("vec_id"), lit(3)) === 0),
      "vec_id", "embedding", dir, nCentroids = 8)
    assert(results(8) == exact)
    assert(results(2) == partial)
  }

  test("SQ8 index: frozen quantization geometry, replay idempotence, " +
    "sub-exhaustive recall vs exact brute force") {
    val dir = Files.createTempDirectory("graft-sq8idx").toString
    val emb = Tables.embeddings(spark, d)
    val batches = (0 until 3).map(i =>
      emb.filter(pmod(col("vec_id"), lit(3)) === i))
    batches.foreach(b => VectorIndexOps.updateIndexSq8(spark, b,
      "vec_id", "embedding", dir, nCentroids = 8))
    // frozen geometry: ranges and centroids trained on batch 0 only —
    // later appends must not have touched either table
    val ranges = Staging.readTable(spark, dir, "ranges")
      .select("__lo", "__hi").as[(Seq[Double], Seq[Double])].head()
    val expected = graft.ext.VectorOps.sq8Ranges(batches(0), "embedding")
      .select("__lo", "__hi").as[(Seq[Double], Seq[Double])].head()
    assert(ranges == expected)
    // every vector coded exactly once; no raw vectors in postings
    val postings = Staging.readTable(spark, dir, "postings")
    assert(postings.count() == emb.count())
    assert(!postings.columns.contains("vec"))
    val queries = emb.filter($"vec_id" < 5)
    def results(nProbe: Int): Seq[(Long, Long, Double)] =
      VectorIndexOps.searchIndexSq8(spark, queries, "vec_id",
          "embedding", dir, k = 10, nProbe = nProbe)
        .select($"query_id", $"neighbor_id", round($"sq8_sim", 6))
        .as[(Long, Long, Double)].collect().toSeq.sorted
    val exhaustive = results(8)
    // replay: re-append batch 2; duplicate postings must not change
    // any search result (at-least-once maintenance)
    VectorIndexOps.updateIndexSq8(spark, batches(2), "vec_id",
      "embedding", dir, nCentroids = 8)
    assert(results(8) == exhaustive)
    // sub-exhaustive probe keeps sane recall vs EXACT brute force
    // (quantization + bucket pruning combined)
    val exact = VectorOps.bruteForceTopK(emb, queries, "vec_id",
        "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val probed = results(4).map(r => (r._1, r._2)).toSet
    val recall = (exact & probed).size.toDouble / exact.size
    assert(recall > 0.3, s"SQ8 index recall $recall suspiciously low")
  }

  test("probe scans are partition-pruned to the probed centroids — " +
    "the literal IN lands in PartitionFilters and the scan's " +
    "partition-count metric stays at nProbe, not nCentroids") {
    val dir = Files.createTempDirectory("graft-ivfprune").toString
    val emb = Tables.embeddings(spark, d)
    VectorIndexOps.updateIndex(spark, emb, "vec_id", "embedding", dir,
      nCentroids = 8)
    val oneQuery = emb.filter(col("vec_id") === 0)
    val res = VectorIndexOps.searchIndex(spark, oneQuery, "vec_id",
      "embedding", dir, k = 5, nProbe = 2)
    // collect() drives THIS frame's queryExecution, so the scan
    // metrics below belong to the executed plan
    assert(res.collect().length === 5)
    // the postings scan carries a partition filter on centroid_id
    val planStr = res.queryExecution.executedPlan.toString
    assert(
      "PartitionFilters: \\[[^\\]]*centroid_id".r.findFirstIn(planStr)
        .isDefined, planStr.take(2000))
    // and the partitions-read metric says 2 of 8 (one query, nProbe=2)
    val postingScans = fileScans(res.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(
        _.toString.contains("postings")))
    assert(postingScans.nonEmpty, planStr.take(2000))
    val partsRead = postingScans.map(
      _.metrics("numPartitions").value).max
    assert(partsRead == 2L, s"read $partsRead of 8 partitions")
    // exhaustive probe still reads everything and equals brute force
    // (pruning is a restriction of the read, never of the semantics)
    val all = VectorIndexOps.searchIndex(spark, oneQuery, "vec_id",
      "embedding", dir, k = 5, nProbe = 8)
    val exact = VectorOps.bruteForceTopK(emb, oneQuery, "vec_id",
        "embedding", 5)
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(all.select(col("query_id").cast("long"),
        col("neighbor_id").cast("long"))
      .as[(Long, Long)].collect().toSet === exact)
  }

  private def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive
          .QueryStageExec => fileScans(q.plan)
    }.flatten

  test("SQ8 clamp-share drift meter: the training batch reports zero, " +
    "an out-of-range batch surfaces its boundary-clamped share") {
    val dir = Files.createTempDirectory("graft-sq8drift").toString
    val emb = Tables.embeddings(spark, d)
    val s0 = VectorIndexOps.updateIndexSq8(spark,
      emb.filter(pmod(col("vec_id"), lit(2)) === 0),
      "vec_id", "embedding", dir, nCentroids = 4)
    // ranges trained on this batch cover it: nothing clamps
    assert(s0.clampShare === 0.0, s0)
    assert(s0.nPostings > 0 && s0.nComponents > 0)
    // a drifted batch (components scaled 10x out of the frozen range)
    // must surface a large clamped share — the rebuild signal
    val drifted = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
      .withColumn("embedding",
        transform(col("embedding"), x => x * lit(10.0f)))
    val s1 = VectorIndexOps.updateIndexSq8(spark, drifted,
      "vec_id", "embedding", dir, nCentroids = 4)
    assert(s1.clampShare > 0.5,
      s"drifted batch clamp share ${s1.clampShare}")
    assert(s1.nClamped > 0 && s1.nClamped <= s1.nComponents)
  }

  test("chooseNumCentroids follows the √n rule with [4, 65536] " +
    "clamps and is monotone in the corpus size") {
    import graft.ext.VectorOps.chooseNumCentroids
    assert(chooseNumCentroids(0L) == 4)
    assert(chooseNumCentroids(10L) == 4)
    assert(chooseNumCentroids(10000L) == 100)
    assert(chooseNumCentroids(1000000L) == 1000)
    assert(chooseNumCentroids(Long.MaxValue) == 65536)
    val ns = Seq(1L, 100L, 10000L, 1000000L, 100000000L,
      10000000000L, Long.MaxValue)
    val cs = ns.map(chooseNumCentroids)
    assert(cs == cs.sorted, s"not monotone: $cs")
  }
}
