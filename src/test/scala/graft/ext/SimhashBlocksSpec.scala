package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Proofs for the simhash block-combination auto-sizing
  * ([[DedupOps.chooseBlocks]]) and — the part test-sized corpora never
  * exercise through the public pipeline (chooseBlocks returns d+1 for
  * small n) — the c > d+1 combination packing/keying itself:
  * pigeonhole exactness says EVERY valid block count must produce the
  * identical exhaustive pair set, so the classic c = d+1 chunk scheme
  * is the ground truth the wider schemes are asserted against. */
class SimhashBlocksSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic corpus of signatures with planted near pairs:
    * base docs get pseudo-random 64-bit signatures; each base doc
    * 10k..10k+9 gets a twin with k bits flipped (hamming exactly k,
    * up to random-collision noise the exhaustive comparison below is
    * immune to — both schemes see the SAME frame). */
  private def sigFrame(n: Int) = {
    val rnd = new scala.util.Random(42)
    val base = (0 until n).map(i => (i.toLong, rnd.nextLong()))
    val twins = (0 until n).flatMap { i =>
      val k = i % 10
      if (i % 3 == 0) {
        val flips = rnd.shuffle((0 until 64).toList).take(k)
        Some((10000L + i,
          flips.foldLeft(base(i)._2)((s, b) => s ^ (1L << b))))
      } else None
    }
    (base ++ twins).toDF("doc_id", "__sig")
  }

  private def pairs(df: org.apache.spark.sql.DataFrame, d: Int,
                    c: Int): Set[(Long, Long, Int)] =
    DedupOps.simhashPairsFromSigs(df, maxDistance = d,
        maxBucketSize = Int.MaxValue, numBlocks = c)
      .select("id_a", "id_b", "hamming_distance")
      .as[(Long, Long, Int)].collect().toSet

  test("c > d+1 combination schemes emit the IDENTICAL exhaustive " +
    "pair set as the classic c = d+1 chunk scheme") {
    val df = sigFrame(300)
    for (d <- Seq(2, 3)) {
      val classic = pairs(df, d, d + 1)
      assert(classic.nonEmpty, s"d=$d ground truth empty — weak corpus")
      for (c <- Seq(d + 2, 6, 8)) {
        val wide = pairs(df, d, c)
        assert(wide == classic,
          s"d=$d c=$c: ${wide.size} pairs vs classic ${classic.size}; " +
            s"missing=${(classic -- wide).take(5)} " +
            s"extra=${(wide -- classic).take(5)}")
      }
    }
  }

  test("chooseBlocks: bounds hold across the (n, d) grid — " +
    "c in [d+1, 64], combo-table budget respected, pigeonhole valid") {
    for (d <- 1 to 8; n <- Seq(1L, 100L, 10000L, 1000000L,
        100000000L, 10000000000L)) {
      val c = DedupOps.chooseBlocks(n, d)
      assert(c >= d + 1, s"n=$n d=$d: c=$c < d+1")
      assert(c <= 64, s"n=$n d=$d: c=$c > 64")
      assert(DedupOps.comboCount(c, d) <= 64L,
        s"n=$n d=$d: c=$c explodes ${DedupOps.comboCount(c, d)} " +
          "tables > budget 64")
    }
  }

  test("chooseMinhashParams: recall always holds; the FP budget holds " +
    "or the signature sits at the deepest in-budget depth; monotone " +
    "and capped growth with the corpus") {
    // mirror of the production bands formula, for the at-the-cap check
    def bandsFor(t: Double, r: Int): Int = math.max(1,
      math.ceil(math.log(1e-6) / math.log1p(-math.pow(t, r))).toInt)
    for (t <- Seq(0.5, 0.8, 0.9)) {
      val ns = Seq(1000L, 100000L, 10000000L, 1000000000L)
      val params = ns.map(n =>
        DedupOps.chooseMinhashParams(n, threshold = t))
      params.zip(ns).foreach { case ((h, b, r), n) =>
        assert(h == b * r, s"t=$t n=$n: numHashes $h != $b*$r")
        assert(h <= 512, s"t=$t n=$n: signature $h over the 512 cap")
        // recall: a true pair at the threshold misses all bands
        // w.p. (1-t^r)^b <= 1e-6 — never traded away
        val miss = math.pow(1 - math.pow(t, r), b)
        assert(miss <= 1e-6 * 1.0001, s"t=$t n=$n: miss=$miss")
        // precision: expected background-pair candidates per doc <= 1,
        // OR the next depth would blow the signature budget (the
        // documented best-effort fallback at web-scale n)
        val fp = (n - 1) / 2.0 * b * math.pow(0.1, r)
        val atCap = (r + 1).toLong * bandsFor(t, r + 1) > 512
        assert(fp <= 1.0001 || atCap,
          s"t=$t n=$n: fp/doc=$fp with headroom below the cap")
      }
      val hashes = params.map(_._1)
      val rows = params.map(_._3)
      assert(rows == rows.sorted,
        s"t=$t: rows-per-band not monotone: $rows over $ns")
      assert(hashes == hashes.sorted,
        s"t=$t: signature length not monotone: $hashes over $ns")
    }
  }

  test("chooseMinhashParams: a threshold too low for the signature " +
    "budget fails loudly instead of silently degrading recall") {
    intercept[IllegalArgumentException] {
      DedupOps.chooseMinhashParams(1000000L, threshold = 0.2)
    }
    // and a raised budget makes the same threshold feasible again
    val (h, b, r) = DedupOps.chooseMinhashParams(1000000L,
      threshold = 0.2, maxSigHashes = 4096)
    assert(h == b * r && h <= 4096)
    assert(math.pow(1 - math.pow(0.2, r), b) <= 1e-6 * 1.0001)
  }

  test("chooseBlocks: block count is monotone non-decreasing in the " +
    "corpus size (bigger corpora buy wider keys, never narrower)") {
    for (d <- Seq(2, 3, 4)) {
      val ns = Seq(1L, 10L, 1000L, 100000L, 10000000L, 1000000000L,
        100000000000L)
      val cs = ns.map(DedupOps.chooseBlocks(_, d))
      assert(cs == cs.sorted,
        s"d=$d: chooseBlocks not monotone over $ns -> $cs")
      // and at web scale the choice genuinely leaves the classic
      // scheme (the whole point of the auto-sizing)
      assert(cs.last > d + 1,
        s"d=$d: c stuck at classic ${cs.last} even at n=1e11")
    }
  }
}
