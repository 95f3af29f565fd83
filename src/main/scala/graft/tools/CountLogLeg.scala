package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 leg (VERDICT r15 next-round #7): the unified
  * [[graft.io.CountLog]] substrate at LOG-DEPTH scale — a 30+-batch
  * delta log for every count store family on the zipf1 corpus, with
  * the serve-time fold cost measured BEFORE and AFTER compaction.
  *
  * Why this leg exists: the r15 CountLog unification claimed its
  * value at batch DEPTH ("serve-time folds previously grew unbounded
  * in batch count") but was only ever drilled at 3–4 batches.  The
  * production posture is a daily/hourly append cadence: after a
  * month the log holds dozens of partition dirs and the serve view
  * folds all of them on every model read.  Compaction's contract is
  * that serve cost returns to ~snapshot + keepBatches tails, scores
  * bit-identical (the `*_incremental` oracles pin identity at the
  * gate; this leg prices the fold).
  *
  * For each store family (bigram LM, DSIR, drift value-histogram,
  * quality classifier, lang-ID): append the corpus as `nBatches`
  * disjoint delta batches, time a full store-served model read +
  * probe scoring pass at log depth `nBatches`, compact
  * (keepBatches = 2), re-time the same serve, and assert the served
  * results row-identical pre/post (the leg's own correctness guard —
  * the oracle gate pins the arithmetic at sf0.01, this pins it at
  * depth).
  *
  * Usage: runMain graft.tools.CountLogLeg <sfDir> [nBatches=32]
  * (sfDir: a GenSf zipf corpus — the leg batches on `doc_id % n`).
  */
object CountLogLeg {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.{ClassifierOps, DriftOps, TextOps}

    val docs = graft.Tables.documents(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // probe = a fixed 1/16 slice: serve cost is dominated by the
    // MODEL fold, so the probe just has to force it end to end
    val probe = docs.filter(col("doc_id") % 16 === 0)
    val root = java.nio.file.Files
      .createTempDirectory("graft-countlogleg").toString

    def timed(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[countlogleg] $sfDir $label rows=$n secs=$s%.1f")
      s
    }

    /** Build an nBatches log via `append`, time `serve` at full log
      * depth, `compact`, re-time, and assert identical results. */
    def drill(store: String)(append: (Long, org.apache.spark.sql
                 .DataFrame) => Unit)
             (serve: String => org.apache.spark.sql.DataFrame)
             (compact: String => Unit): Unit = {
      val dir = s"$root/$store"
      val tApp = timed(s"$store append_x$nBatches") {
        (0 until nBatches).foreach { i =>
          append(i.toLong, docs.filter(
            pmod(col("doc_id"), lit(nBatches.toLong)) === i))
        }
        nBatches.toLong
      }
      val pre = serve(dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tPre = timed(s"$store serve_depth$nBatches")(pre.count())
      val tCmp = timed(s"$store compact")({ compact(dir); 1L })
      val post = serve(dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tPost = timed(s"$store serve_compacted")(post.count())
      val diff = pre.exceptAll(post).count() + post.exceptAll(pre).count()
      require(diff == 0,
        s"$store served results differ pre/post compaction ($diff rows)")
      println(f"[countlogleg] TABLE $store append=$tApp%.1f " +
        f"pre=$tPre%.1f compact=$tCmp%.1f post=$tPost%.1f identical=yes")
      pre.unpersist(); post.unpersist()
    }

    drill("bigram")(
      (i, b) => { TextOps.updateBigramCounts(b, "doc_id", "text",
        s"$root/bigram", i); () })(
      dir => TextOps.bigramLmScoresFromStore(probe, "doc_id", "text",
        dir))(
      dir => TextOps.compactBigramCounts(spark, dir))

    drill("dsir")(
      (i, b) => { TextOps.updateDsirCounts(b, "doc_id", "text",
        col("lang") === "en", s"$root/dsir", i); () })(
      dir => TextOps.dsirWeightsFromStore(probe, "doc_id", "text",
        col("lang") === "en", dir))(
      dir => TextOps.compactDsirCounts(spark, dir))

    val cuts = Seq(200.0, 400.0, 800.0, 1600.0)
    drill("drift")(
      (i, b) => { DriftOps.updateValueHistogram(
        b.select(length(col("text")).cast("double").as("v")),
        col("v"), cuts, s"$root/drift", i); () })(
      dir => DriftOps.histogramFromStore(spark, dir, cuts))(
      dir => DriftOps.compactValueHistogram(spark, dir))

    drill("classifier")(
      (i, b) => { ClassifierOps.updateClassifierCounts(b, "doc_id",
        "text", col("lang") === "en", s"$root/classifier", i); () })(
      dir => ClassifierOps.scoreQuality(probe, "doc_id", "text",
        ClassifierOps.classifierFromStore(spark, dir)))(
      dir => ClassifierOps.compactClassifierCounts(spark, dir))

    drill("langid")(
      (i, b) => { ClassifierOps.updateLangIdCounts(b, "doc_id",
        "text", "lang", s"$root/langid", i); () })(
      dir => ClassifierOps.classifyLang(probe, "doc_id", "text",
        ClassifierOps.langIdFromStore(spark, dir)))(
      dir => ClassifierOps.compactLangIdCounts(spark, dir))

    spark.stop()
  }
}
