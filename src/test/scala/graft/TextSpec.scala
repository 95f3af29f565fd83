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
}
