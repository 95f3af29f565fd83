package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.etl.OperationalLoad
import graft.ops.Relational

/** Skew hardening of the incremental-load path: a deliberately hot
  * key (50% of the batch) must neither break correctness nor
  * serialize into one straggler task. Two defenses are asserted:
  * the dedupe stage is a partial+final hash aggregate (map-side
  * combine absorbs the hot key before the shuffle), and AQE's skew
  * join splits an oversized anti-join partition at runtime. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("loadIfNew absorbs a 50%-hot-key batch; dedupe is partial+final " +
    "hash agg, not a window") {
    val store = Files.createTempDirectory("graft-skew").toString
    val hot = (1 to 5000).map(_ => ("hot", "payload"))
    val uniq = (1 to 5000).map(i => (s"u$i", "payload"))
    val batch = (hot ++ uniq).toDF("id_review", "review_text")
    // hot key collapses to one surviving row; all keys are new
    assert(OperationalLoad.loadIfNew(spark, batch, store, "reviews",
      "id_review") == 5001L)
    // idempotent under skew too
    assert(OperationalLoad.loadIfNew(spark, batch, store, "reviews",
      "id_review") == 0L)
    // the skew defense: dropDuplicates plans as a partial+final
    // aggregate (map-side partial_first absorbs the hot key before
    // the shuffle), never a per-key window (which would serialize the
    // hot key into one task)
    val plan = Relational.dedupeByKey(batch, "id_review")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_first"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("keyedRanks on a 90%-one-language corpus: exact per-key ranks " +
    "from parallel (key, bucket) windows, ties intact — never a " +
    "whole-key sort partition") {
    val n = 20000
    // deterministic scores with heavy duplication (ties must not
    // straddle bucket cuts), one key holding 90% of the rows, and a
    // NULL key group — grouping/windows rank null-lang docs as a
    // group, so the offset join must be null-safe or they vanish
    val df = spark.range(n).select(
      when($"id" % 10 =!= 0, lit("en"))
        .when($"id" % 20 === 0, lit("de"))
        .otherwise(lit(null).cast("string")).as("lang"),
      ($"id" % 997).cast("double").as("score"),
      $"id".as("doc"))
    val ranked = Relational.keyedRanks(df, Seq("lang"), col("score"),
      Seq(col("score"), col("doc")), "rnk")
    val got = ranked.select("lang", "doc", "rnk")
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val truth = df.select("lang", "score", "doc")
      .as[(String, Double, Long)].collect()
      .groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
        rows.sortBy(r => (r._2, r._3)).zipWithIndex
          .map { case (r, i) => (lang, r._3) -> (i + 1L) }.toSeq
      }.toMap
    assert(got === truth)
    // the rank window's partition spec carries the value bucket next
    // to the key; a bare per-key rank window must not appear
    val p = ranked.queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(lang#\\d+, __b#\\d+, score#"
      .r.findFirstIn(p).isDefined, p.take(1500))
    assert("windowspecdefinition\\(lang#\\d+, score#"
      .r.findFirstIn(p).isEmpty, p.take(1500))
  }

  test("AQE splits the skewed partition of a sort-merge anti-join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force a shuffled SMJ (no broadcast) and lower the skew
      // thresholds to test scale: hot partition ≈ several MB vs ~KB
      // median must be detected and split by the advisory size
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "262144")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "131072")
      // shuffle sizes are COMPRESSED bytes: the padding must be
      // incompressible (per-row hash chains) or the hot partition
      // never crosses the skew threshold
      val pad = concat(sha2(concat(lit("a"), $"id"), 256),
        sha2(concat(lit("b"), $"id"), 256),
        sha2(concat(lit("c"), $"id"), 256),
        sha2(concat(lit("d"), $"id"), 256))
      val left = spark.range(100000).select(
        when($"id" < 50000, lit("hot"))
          .otherwise(concat(lit("u"), $"id")).as("k"), pad.as("v"))
      val existing = spark.range(50000, 75000)
        .select(concat(lit("u"), $"id").as("k"))
      val out = Relational.antiJoinNewKeys(left, existing, "k")
      // collect() drives THIS DataFrame's query execution (count()
      // would build a separate one and leave the adaptive plan
      // unfinalized); hot rows all survive (key absent from
      // existing), u50000-74999 are filtered
      assert(out.collect().length == 75000)
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
