package graft

import graft.ext.CorpusPipeline
import graft.ext.CorpusPipeline.Config

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " +
    "near the river bank while birds sing in the morning light"

  private val docs = Seq(
    (1L, base),                       // keeper
    (2L, base),                       // exact dup of 1 → dropped
    (3L, "  " + base.toUpperCase),    // fingerprint dup of 1 → dropped
    (4L, base.replace("morning", "evening")), // near-dup of 1
    (5L, "short doc"),                // fails min-token gate
    (6L, "spark catalyst optimizer plans distributed shuffles across " +
      "many executors with adaptive query execution and whole stage " +
      "codegen for vectorized throughput"), // distinct keeper
    (7L, "a,b.c!d?e;f:g,h.i!j?k;l:m,n.o!p?q;r:s,t")  // punct noise
  ).toDF("doc_id", "text")

  test("stage accounting: each gate drops what it should") {
    val st = CorpusPipeline.stats(docs, "doc_id", "text",
      Config(nearDupJaccard = 0.8))
    assert(st("input") == 7)
    assert(st("after_quality") == 5) // 5 (short) and 7 (punct) dropped
    assert(st("after_exact_dedup") == 3) // 2 and 3 fold into 1
    assert(st("after_near_dup") == 2) // 4 folds into 1
  }

  test("curate keeps deterministic min-id survivors") {
    val ids = CorpusPipeline.curate(docs, "doc_id", "text",
        Config(nearDupJaccard = 0.8))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 6L))
  }

  test("idempotent: curating a curated corpus is a no-op") {
    val once = CorpusPipeline.curate(docs, "doc_id", "text")
    val twice = CorpusPipeline.curate(once, "doc_id", "text")
    assert(once.select("doc_id").as[Long].collect().sorted.toSeq ==
      twice.select("doc_id").as[Long].collect().sorted.toSeq)
  }
}
