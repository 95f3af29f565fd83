package graft

import org.apache.spark.sql.functions._

import graft.ext.{BpeOps, SamplingOps}

/** Bounded-merge BPE trainer + frozen-merge-list token counter
  * (the tokenizer-honest pricing layer for packing/mixtures). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges derives the hand-computed merge sequence with " +
    "the (count desc, pair asc) tiebreak") {
    // vocab: aaab ×2, ab ×1 → pair counts (a,a)=4 (a,b)=3 → merge 1
    // = (a,a); then (a,b)=3 (aa,a)=2 → merge 2 = (a,b); then
    // (aa,ab)=2 → merge 3
    val corpus = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val merges = BpeOps.trainMerges(corpus, "text", nMerges = 3)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("merge application is leftmost-nonoverlapping; inference " +
    "covers unseen words; empty docs price 0/0") {
    val merges = Seq(("a", "a"), ("a", "b"))
    val docs = Seq(
      (1L, "aaa"),        // (a,a) leftmost: [aa, a] → 2 subwords
      (2L, "aaab ab"),    // [aa, ab] + [ab] → 2 + 1
      (3L, "xyz"),        // unseen word: chars only → 3
      (4L, "ab aaa ab"),  // 1 + 2 + 1
      (5L, " ")           // empty after trim → 0 tokens
    ).toDF("doc_id", "text")
    val out = BpeOps.tokenCounts(docs, "doc_id", "text", merges)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 2L), (2L, 2L, 3L), (3L, 1L, 3L), (4L, 3L, 4L),
      (5L, 0L, 0L)))
  }

  test("rank-order application: a later merge consumes an earlier " +
    "merge's output symbol") {
    val docs = Seq((1L, "aaab")).toDF("doc_id", "text")
    val three = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val out = BpeOps.tokenCounts(docs, "doc_id", "text", three)
      .select("n_bpe_tokens").as[Long].head()
    assert(out == 1L) // a a a b → aa a b → aa ab → aaab
  }

  test("training fails loudly when pairs exhaust before nMerges") {
    val corpus = Seq((1L, "a b")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      BpeOps.trainMerges(corpus, "text", nMerges = 2)
    }
    assert(e.getMessage.contains("exhausted"), e.getMessage)
  }

  test("packing composition: packSequences pricing under BPE counts " +
    "bins by the tokenizer-honest totals") {
    val merges = Seq(("a", "a"), ("a", "b"))
    val docs = Seq(
      (1L, "aaab aaab"), // bpe 4
      (2L, "aaa aaa"),   // bpe 4
      (3L, "ab"),        // bpe 1
      (4L, "xy xy")      // bpe 4
    ).toDF("doc_id", "text").withColumn("shard", lit("s"))
    val priced = docs.join(
      BpeOps.tokenCounts(docs, "doc_id", "text", merges),
      Seq("doc_id"))
    val packed = SamplingOps.packSequences(priced, "shard", "doc_id",
        col("n_bpe_tokens"), capacity = 8)
      .select("doc_id", "first_window")
      .as[(Long, Long)].collect().toMap
    // running bpe prefix: 4, 8, 9, 13 → starts 0, 4, 8, 9 →
    // windows 0, 0, 1, 1 at capacity 8
    assert(packed == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
    // the whitespace heuristic would have started doc 2 at 2 tokens —
    // the honest count shifts the layout, which is the point
    val wsPacked = SamplingOps.packSequences(priced, "shard", "doc_id",
        col("n_ws_tokens"), capacity = 8)
      .select("doc_id", "first_window")
      .as[(Long, Long)].collect().toMap
    assert(wsPacked != packed)
  }
}
