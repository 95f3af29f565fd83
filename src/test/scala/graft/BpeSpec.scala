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

  /** The sequential rank-ordered fold, driver-side — the reference
    * law the native greedy encode must match (one
    * leftmost-nonoverlapping pass per merge, rank 1..N). */
  private def foldEncode(word: String,
                         merges: Seq[(String, String)]): Seq[String] = {
    var syms = word.map(_.toString).toArray
    merges.foreach { case (a, b) =>
      val acc = scala.collection.mutable.ArrayBuffer.empty[String]
      syms.foreach { x =>
        if (x == b && acc.nonEmpty && acc.last == a)
          acc(acc.length - 1) = a + b
        else acc += x
      }
      syms = acc.toArray
    }
    syms.toSeq
  }

  /** Deterministic synthetic vocabulary rich enough to train ≥ 1024
    * merges: length-7 words over a 5-letter alphabet (Σ(len−1) =
    * 6 × nWords pair-sites). */
  private def synthWords(n: Int): Seq[String] =
    (0 until n).map { i =>
      val sb = new StringBuilder
      var v = i
      (0 until 7).foreach { _ =>
        sb += ('a' + v % 5).toChar; v /= 5
      }
      sb.toString
    }

  test("1024-merge training: the native encode segments every word " +
    "exactly as the sequential rank-ordered fold, and the plan depth " +
    "is FLAT in the merge count") {
    val words = synthWords(2000)
    val corpus = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = BpeOps.trainMerges(corpus, "text", nMerges = 1024)
    assert(merges.size == 1024)
    // native ≡ fold on every distinct word INCLUDING unseen shapes
    val probe = (words.take(200) ++ Seq("zzzzz", "a", "ab", "",
      "ääöü", "aaaaaaaaaaaaaa")).toDF("w")
    val got = probe.select(col("w"),
        graft.functions.native.bpe_encode(col("w"), merges).as("e"))
      .as[(String, Seq[String])].collect()
    got.foreach { case (w, e) =>
      assert(e == foldEncode(w, merges), s"word '$w'")
    }
    // flat plan: the executed-plan tree is the SAME SIZE at 16 and
    // at 1024 merges — the pre-r16 per-merge HOF chain grew the tree
    // (and the per-word cost) linearly in nMerges
    def planLines(ms: Seq[(String, String)]) =
      BpeOps.tokenCounts(corpus, "doc_id", "text", ms)
        .queryExecution.executedPlan.toString.linesIterator.size
    assert(planLines(merges) == planLines(merges.take(16)))
  }

  test("trainMergesMax stops at pair exhaustion and returns the " +
    "trained prefix; trainMerges still fails loudly at the same " +
    "point") {
    val corpus = Seq((1L, "aaab ab")).toDF("doc_id", "text")
    val all = BpeOps.trainMergesMax(corpus, "text", nMerges = 1024)
    // vocab {aaab, ab} exhausts when both words are single symbols
    assert(all.nonEmpty && all.size < 1024)
    val ex = intercept[IllegalArgumentException] {
      BpeOps.trainMerges(corpus, "text", nMerges = all.size + 1)
    }
    assert(ex.getMessage.contains("exhausted"), ex.getMessage)
    // the loud form agrees with the prefix where both succeed
    assert(BpeOps.trainMerges(corpus, "text", all.size) == all)
  }

  test("ill-formed merge lists are rejected: an operand no earlier " +
    "merge produced is where greedy and sequential order diverge") {
    val e = intercept[IllegalArgumentException] {
      graft.functions.native.bpe_encode(lit("xab"),
        Seq(("x", "ab"), ("a", "b")))
    }
    assert(e.getMessage.contains("well-formed"), e.getMessage)
    // the same pairs in trained (well-formed) order are fine
    graft.functions.native.bpe_encode(lit("xab"),
      Seq(("a", "b"), ("x", "ab")))
  }

  test("saveMerges/loadMerges round-trips rank order; a gapped rank " +
    "table fails loudly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bpemerges").toString
    val corpus = synthWords(500).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = BpeOps.trainMerges(corpus, "text", nMerges = 64)
    BpeOps.saveMerges(spark, merges, dir)
    assert(BpeOps.loadMerges(spark, dir) == merges)
    // corrupt: rewrite the table without rank 3 — the frozen chain
    // must refuse, not silently skip a merge
    merges.zipWithIndex
      .collect { case ((a, b), i) if i != 2 => (i + 1L, a, b) }
      .toDF("rank", "a", "b")
      .write.mode("overwrite").parquet(s"$dir/merges")
    val e = intercept[IllegalArgumentException] {
      BpeOps.loadMerges(spark, dir)
    }
    assert(e.getMessage.contains("rank"), e.getMessage)
  }
}
