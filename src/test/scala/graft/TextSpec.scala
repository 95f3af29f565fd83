package graft

import org.apache.spark.sql.functions._
import graft.ext.TextOps

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).head().getAs[T](0)

  test("tokens handles blank and multi-space text") {
    val toks = spark.range(1)
      .select(TextOps.tokens(lit("  a  b   c  ")).as("t"))
      .head().getSeq[String](0)
    assert(toks == Seq("a", "b", "c"))
    assert(one[Int](TextOps.tokenCount(lit("   "))) == 0)
    assert(one[Int](TextOps.tokenCount(lit(""))) == 0)
  }

  test("langId picks the marker-heavy language") {
    assert(one[String](TextOps.langId(
      lit("the cat and the dog is in the house"))) == "en")
    assert(one[String](TextOps.langId(
      lit("der hund und die katze ist nicht hier"))) == "de")
    assert(one[String](TextOps.langId(
      lit("le chat et le chien est pour les amis"))) == "fr")
    assert(one[String](TextOps.langId(lit("xyzzy qwerty"))) == "und")
  }

  test("qualityScore rewards clean prose, penalizes noise") {
    val clean = one[Double](TextOps.qualityScore(lit(
      "the quick brown fox jumps over the lazy dog and runs to the river")))
    val noisy = one[Double](TextOps.qualityScore(lit(
      "x,,,.!!??;;;:..,y!!!")))
    assert(clean > 0.8)
    assert(noisy < 0.4)
    assert(clean <= 1.0 && noisy >= 0.0)
  }

  test("fingerprint is whitespace/case-insensitive, content-sensitive") {
    val a = one[String](TextOps.fingerprint(lit("Hello   World")))
    val b = one[String](TextOps.fingerprint(lit("hello world")))
    val c = one[String](TextOps.fingerprint(lit("hello worlds")))
    assert(a == b)
    assert(a != c)
  }

  test("rollingHash is order-sensitive where set-jaccard is blind") {
    val ab = one[Long](TextOps.rollingHash(lit("alpha beta")))
    val ba = one[Long](TextOps.rollingHash(lit("beta alpha")))
    assert(ab != ba)
  }

  test("subwordCount counts punctuation-split pieces") {
    assert(one[Int](TextOps.subwordCount(lit("don't stop, now"))) == 6)
    // don + ' + t + stop + , + now
  }

  test("chunkDocs: sizes, overlap, and empty-doc row") {
    val docs = Seq(
      (1L, (1 to 50).map(i => s"t$i").mkString(" ")), // 50 tokens
      (2L, "a b c"),                                  // under one chunk
      (3L, "")                                        // empty
    ).toDF("doc_id", "text")
    val out = TextOps.chunkDocs(docs, "doc_id", "text",
      chunkSize = 32, overlap = 8)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, String, Int)].collect()
    // doc 1: starts at 1, 25 (start 49 is suppressed — its 2 tokens
    // are already covered by chunk 1) -> 2 chunks of 32, 26 tokens
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L))
    assert(d1.map(_._4).toSeq == Seq(32, 26))
    // overlap: chunk 1 starts at token 25, so tokens 25..32 are shared
    assert(d1(0)._3.split(" ").drop(24).take(8).toSeq ==
      d1(1)._3.split(" ").take(8).toSeq)
    // doc 2: one short chunk
    assert(out.filter(_._1 == 2L).toSeq ==
      Seq((2L, 0L, "a b c", 3)))
    // doc 3: survives as one empty chunk
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0L, "", 0)))
  }

  test("wordNgrams: sliding windows, short-doc empty array") {
    val g = spark.range(1)
      .select(TextOps.wordNgrams(lit("a b c d"), 3).as("g"))
      .head().getSeq[String](0)
    assert(g == Seq("a b c", "b c d"))
    assert(spark.range(1)
      .select(TextOps.wordNgrams(lit("a b"), 3).as("g"))
      .head().getSeq[String](0).isEmpty)
  }

  test("redactPii scrubs emails, phones, IPs; counts match") {
    val txt = "mail bob.smith+x@sub.example.org or eve@ex.io, " +
      "call 555-123-4567, host 192.168.0.1 end"
    val red = one[String](TextOps.redactPii(lit(txt)))
    assert(red == "mail <EMAIL> or <EMAIL>, call <PHONE>, " +
      "host <IP> end")
    assert(one[Int](TextOps.piiCount(lit(txt), "email")) == 2)
    assert(one[Int](TextOps.piiCount(lit(txt), "phone")) == 1)
    assert(one[Int](TextOps.piiCount(lit(txt), "ip")) == 1)
    // non-PII digits survive: dates, versions, plain numbers
    val clean = "version 1.2 of 2024 shipped 10000 units"
    assert(one[String](TextOps.redactPii(lit(clean))) == clean)
  }

  test("repetition metrics: unique text scores 0, loops score high") {
    val unique = "alpha beta gamma delta epsilon zeta"
    assert(one[Double](TextOps.dupTokenFrac(lit(unique))) == 0.0)
    assert(one[Double](TextOps.dupNgramFrac(lit(unique), 3)) == 0.0)
    // "spam ham " * n: every bigram is one of two values
    val loop = Seq.fill(10)("spam ham").mkString(" ")
    assert(one[Double](TextOps.dupTokenFrac(lit(loop))) == 0.9)
    assert(one[Double](TextOps.topNgramFrac(lit(loop), 2)) > 0.5)
    assert(one[Double](TextOps.dupNgramFrac(lit(loop), 3)) > 0.8)
    // empty text: all zero, no division error
    assert(one[Double](TextOps.dupTokenFrac(lit(""))) == 0.0)
    assert(one[Double](TextOps.topNgramFrac(lit(""), 2)) == 0.0)
  }
}
