package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ext.{ClassifierOps, DriftOps, TextOps}
import graft.io.CountLog

/** The shared count-delta-log substrate (r15, VERDICT r14 #1): one
  * append/serve/compact protocol for the bigram, DSIR, drift, and
  * classifier stores, with compaction committed through the
  * VersionedStore single-PUT marker — drilled here on the
  * `objsim://` copy+delete-rename filesystem, where the pre-r15
  * rename-swapped bigram compactor had a reader-visible window. */
class CountLogSpec extends SparkSpec {
  import spark.implicits._

  private def objsimDir(tag: String): String = {
    spark.sparkContext.hadoopConfiguration.set("fs.objsim.impl",
      classOf[ObjectStoreSimFs].getName)
    s"objsim://${Files.createTempDirectory(s"graft-$tag").toString}"
  }

  private val docs = Seq(
    (1L, "a b c a b"), (2L, "a c b"), (3L, "b c a b c"),
    (4L, "a b"), (5L, "c a"), (6L, "b c"), (7L, "c b a"),
    (8L, "a c")).toDF("doc_id", "text")

  private def bigramScores(dir: String) = TextOps
    .bigramLmScoresFromStore(docs, "doc_id", "text", dir)
    .orderBy("doc_id").select("doc_id", "n_bigrams", "lm_logprob")
    .as[(Long, Long, Double)].collect().toSeq

  test("bigram compaction on objsim: marker-committed snapshot, " +
    "bit-identical scores at every crash window, reader never " +
    "without a table") {
    val dir = objsimDir("clog-bg")
    (0 until 4).foreach { i =>
      TextOps.updateBigramCounts(docs.filter(col("doc_id") % 4 === i),
        "doc_id", "text", dir, batchId = i)
    }
    val before = bigramScores(dir)
    ObjectStoreSimFs.renames.set(0)
    // FIRST compaction: watermark lands at 1; prevFt was None, so
    // nothing is pruned — this IS the crash-between-commit-and-prune
    // window state (snapshot committed, folded tail dirs still
    // present) and the serve view must already be bit-identical
    TextOps.compactBigramCounts(spark, dir, keepBatches = 2)
    assert(CountLog.foldedThrough(spark, dir, "bigram_counts")
      === Some(1L))
    assert(bigramScores(dir) === before)
    // the un-pruned folded dirs are physically still there (they are
    // covered by the watermark filter, not by deletion)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def tailDirs = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/bigram_counts__d")
      fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith("__batch=")).toSet
    }
    assert(tailDirs === Set("__batch=0", "__batch=1", "__batch=2",
      "__batch=3"))
    // SECOND round: new batch, compact again — the previous
    // watermark's dirs prune, scores still exact, snapshot advances
    TextOps.updateBigramCounts(
      docs.filter(col("doc_id") % 4 === 0), "doc_id", "text", dir,
      batchId = 4)
    TextOps.compactBigramCounts(spark, dir, keepBatches = 2)
    assert(CountLog.foldedThrough(spark, dir, "bigram_counts")
      === Some(2L))
    assert(!tailDirs.contains("__batch=0") &&
      !tailDirs.contains("__batch=1"), tailDirs)
    // batches 0..3 counted once, batch 4 = batch-0 docs again
    val twice = TextOps
      .bigramLmScoresFromStore(docs, "doc_id", "text", dir).count()
    assert(twice === before.size.toLong)
    // out-of-window replay (batch 0, long folded) is DROPPED by the
    // watermark filter — stronger than the dedupe it used to rely on
    TextOps.updateBigramCounts(docs.filter(col("doc_id") % 4 === 0),
      "doc_id", "text", dir, batchId = 0)
    assert(TextOps.bigramLmScoresFromStore(docs, "doc_id", "text",
      dir).count() === before.size.toLong)
    // re-running compaction with unchanged batches is acknowledged
    // by the VersionedStore batch-id dedup (idempotent maintenance)
    TextOps.compactBigramCounts(spark, dir, keepBatches = 2)
    assert(CountLog.foldedThrough(spark, dir, "bigram_counts")
      === Some(2L))
    assert(ObjectStoreSimFs.renames.get() > 0,
      "no renames observed — the objsim scheme was not exercised")
  }

  test("dsir compaction: scores bit-identical to the one-shot fit " +
    "across fold + replay") {
    val dir = objsimDir("clog-dsir")
    val labeled = docs.withColumn("tgt", col("doc_id") % 2 === 0)
    (0 until 3).foreach { i =>
      TextOps.updateDsirCounts(
        labeled.filter(col("doc_id") % 3 === i),
        "doc_id", "text", col("tgt"), dir, batchId = i)
    }
    def served = TextOps.dsirWeightsFromStore(labeled, "doc_id",
        "text", col("tgt"), dir)
      .orderBy("doc_id").select("doc_id", "n_feats", "dsir_logw")
      .as[(Long, Long, Double)].collect().toSeq
    val oneShot = TextOps.dsirWeights(labeled, "doc_id", "text",
        col("tgt"))
      .orderBy("doc_id").select("doc_id", "n_feats", "dsir_logw")
      .as[(Long, Long, Double)].collect().toSeq
    assert(served === oneShot)
    TextOps.compactDsirCounts(spark, dir, keepBatches = 1)
    assert(served === oneShot)
    // in-window replay still collapses over the snapshot + tail view
    TextOps.updateDsirCounts(labeled.filter(col("doc_id") % 3 === 2),
      "doc_id", "text", col("tgt"), dir, batchId = 2)
    assert(served === oneShot)
  }

  test("drift value-histogram compaction preserves the PSI report " +
    "and the cut-set tag") {
    val base = objsimDir("clog-psib")
    val cur = objsimDir("clog-psic")
    val cuts = Seq(10.0, 20.0)
    val vals = (1 to 60).map(i => (i.toLong, (i % 30).toDouble))
      .toDF("id", "v")
    (0 until 3).foreach { i =>
      DriftOps.updateValueHistogram(vals.filter(col("id") % 3 === i),
        col("v"), cuts, base, batchId = i)
      DriftOps.updateValueHistogram(
        vals.filter(col("id") % 3 === i).withColumn("v", col("v") + 5),
        col("v") , cuts, cur, batchId = i)
    }
    def report = DriftOps.psiReportFromStores(spark, base, cur, cuts)
      .orderBy("bucket")
      .select("bucket", "n_base", "n_cur", "psi_total")
      .as[(Int, Long, Long, Double)].collect().toSeq
    val before = report
    DriftOps.compactValueHistogram(spark, base, keepBatches = 1)
    assert(report === before)
    // a mixed-cut-set read still fails loudly after compaction (the
    // tag rides the snapshot as a key column)
    val e = intercept[IllegalArgumentException] {
      DriftOps.histogramFromStore(spark, base, Seq(99.0)).collect()
    }
    assert(e.getMessage.contains("not comparable"), e.getMessage)
  }

  test("keyed-histogram compaction: rolling gate unchanged; a " +
    "freeze point at or before the watermark fails loudly") {
    val dir = objsimDir("clog-keyed")
    val daily = (1 to 40).map(i =>
      (i.toLong, s"k${i % 2}", (i % 7).toDouble)).toDF("id", "k", "v")
    (0 until 4).foreach { i =>
      DriftOps.updateKeyedValueHistogram(
        daily.filter(col("id") % 4 === i), Seq("k"), col("v"), dir,
        batchId = i)
    }
    def gate = DriftOps.rollingMadGate(
        daily.filter(col("id") % 4 === 3), Seq("k"), col("v"),
        k = 3.0, dir, batchId = 4, maxStaleness = 10)
      .orderBy("id").select("id", "is_outlier")
      .as[(Long, Option[Boolean])].collect().toSeq
    val before = gate
    DriftOps.compactKeyedValueHistogram(spark, dir, Seq("k"),
      keepBatches = 2)
    assert(gate === before)
    // watermark is 1; slicing at/before it can no longer be served
    val e = intercept[IllegalArgumentException] {
      DriftOps.keyedHistogramFromStore(spark, dir, Seq("k"),
        beforeBatch = 1L).collect()
    }
    assert(e.getMessage.contains("watermark"), e.getMessage)
  }

  test("classifier single-frame sentinel: scores identical across " +
    "compaction; half-written batch and numBuckets mismatch fail " +
    "loudly") {
    val dir = objsimDir("clog-clf")
    val labeled = docs.withColumn("pos", col("doc_id") % 2 === 0)
    (0 until 3).foreach { i =>
      ClassifierOps.updateClassifierCounts(
        labeled.filter(col("doc_id") % 3 === i), "doc_id", "text",
        col("pos"), dir, batchId = i, numBuckets = 64)
    }
    def served = ClassifierOps.scoreQuality(labeled, "doc_id", "text",
        ClassifierOps.classifierFromStore(spark, dir, numBuckets = 64),
        numBuckets = 64)
      .orderBy("doc_id")
      .select("doc_id", "n_feats", "quality_score")
      .as[(Long, Long, Double)].collect().toSeq
    val oneShot = ClassifierOps.scoreQuality(labeled, "doc_id",
        "text",
        ClassifierOps.trainQualityClassifier(labeled, "doc_id",
          "text", col("pos"), numBuckets = 64), numBuckets = 64)
      .orderBy("doc_id")
      .select("doc_id", "n_feats", "quality_score")
      .as[(Long, Long, Double)].collect().toSeq
    assert(served === oneShot)
    ClassifierOps.compactClassifierCounts(spark, dir, keepBatches = 1)
    assert(served === oneShot)
    // numBuckets mismatch: append and serve both refuse (ADVICE r14)
    val eU = intercept[IllegalArgumentException] {
      ClassifierOps.updateClassifierCounts(labeled, "doc_id", "text",
        col("pos"), dir, batchId = 9, numBuckets = 128)
    }
    assert(eU.getMessage.contains("numBuckets"), eU.getMessage)
    val eS = intercept[IllegalArgumentException] {
      ClassifierOps.classifierFromStore(spark, dir, numBuckets = 4096)
    }
    assert(eS.getMessage.contains("numBuckets"), eS.getMessage)
    // half-written batch: bucket rows land, sentinel never does (the
    // simulated crash) — the serve-time consistency check refuses
    // instead of silently skewing the bias (ADVICE r14)
    val orphan = Seq((5L, 77L, 0L, 99L))
      .toDF("__b", "__cp", "__cn", "__batch")
    CountLog.append(orphan, dir, "clf_counts")
    val eH = intercept[IllegalArgumentException] {
      ClassifierOps.classifierFromStore(spark, dir, numBuckets = 64)
    }
    assert(eH.getMessage.contains("sentinel"), eH.getMessage)
  }

  test("legacy flat-append log reads transparently and retires " +
    "through compaction") {
    val dir = objsimDir("clog-legacy")
    // a pre-r15 store: flat parquet files directly under the table,
    // with the dsir delta schema
    val flat = Seq(
      (10L, 20L, 3L, 5L, 0L), (11L, 21L, 1L, 2L, 0L),
      (10L, 20L, 2L, 2L, 1L))
      .toDF("__f1", "__f2", "__mt", "__m", "__batch")
    graft.io.Staging.appendParquet(flat, dir, "dsir_counts")
    def model = TextOps.dsirModelFromStore(spark, dir)
      .orderBy("__f1", "__f2")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val before = model
    assert(before === Seq((10L, 20L, 5L, 7L), (11L, 21L, 1L, 2L)))
    // new-format appends coexist with the legacy flat log
    CountLog.append(
      Seq((12L, 22L, 1L, 1L, 2L))
        .toDF("__f1", "__f2", "__mt", "__m", "__batch"),
      dir, "dsir_counts")
    assert(model.size === 3)
    // two compactions: the first folds (prevFt None → no prune), the
    // second retires the fully-covered legacy dir
    TextOps.compactDsirCounts(spark, dir, keepBatches = 1)
    assert(model.size === 3)
    CountLog.append(
      Seq((13L, 23L, 0L, 1L, 3L))
        .toDF("__f1", "__f2", "__mt", "__m", "__batch"),
      dir, "dsir_counts")
    TextOps.compactDsirCounts(spark, dir, keepBatches = 1)
    assert(model.size === 4)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(s"$dir/dsir_counts")),
      "legacy flat log should be retired once the watermark covers it")
    assert(model === before ++ Seq((12L, 22L, 1L, 1L),
      (13L, 23L, 0L, 1L)))
  }
}
