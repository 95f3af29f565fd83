package graft

import org.apache.spark.sql.functions._
import graft.ext.SamplingOps

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1 to 200).map(i =>
    (i.toLong, s"document number $i with some content",
      if (i % 3 == 0) "en" else "de")).toDF("doc_id", "text", "lang")

  test("md5Bucket is deterministic, uniform-ish, and repartition-proof") {
    val b1 = docs.select($"doc_id",
      SamplingOps.md5Bucket($"text", 100).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = docs.repartition(13).select($"doc_id",
      SamplingOps.md5Bucket($"text", 100).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2) // layout-independent
    assert(b1.values.forall(b => b >= 0 && b < 100))
    // rough uniformity: 200 docs over 100 buckets → no bucket hogs 10%
    val hist = b1.values.groupBy(identity).view.mapValues(_.size)
    assert(hist.values.max <= 20)
  }

  test("trainTestSplit assignments are permanent as the corpus grows") {
    val s1 = SamplingOps.trainTestSplit(docs, "text", 20)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // grow the corpus 2x: every original doc keeps its split
    val grown = docs.unionByName((201 to 400).map(i =>
      (i.toLong, s"new doc $i arriving later", "en"))
      .toDF("doc_id", "text", "lang"))
    val s2 = SamplingOps.trainTestSplit(grown, "text", 20)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(s1.forall { case (id, sp) => s2(id) == sp })
    // both splits non-empty at 20%
    assert(s1.values.toSet == Set("train", "test"))
  }

  test("stratifiedSample applies per-stratum rates") {
    val kept = SamplingOps.stratifiedSample(docs, "text", "lang",
        Map("en" -> 0), defaultPct = 100)
      .select("lang").as[String].collect()
    assert(!kept.contains("en")) // rate 0 → stratum fully dropped
    assert(kept.length == docs.filter($"lang" === "de").count())
  }

  test("mixture tags components and never duplicates rows across them") {
    val mixed = SamplingOps.mixture(Seq(
      ("a", docs.filter($"lang" === "en"), 100),
      ("b", docs.filter($"lang" === "de"), 50)), "text")
    val byComp = mixed.groupBy("mix_component").count()
      .as[(String, Long)].collect().toMap
    assert(byComp("a") == docs.filter($"lang" === "en").count())
    assert(byComp("b") < docs.filter($"lang" === "de").count())
    assert(mixed.select("doc_id").distinct().count() == mixed.count())
  }

  test("packSequences lays out shards independently with exact window " +
    "arithmetic") {
    // crafted: shard x = 300+300+300 tokens at capacity 512 →
    // doc1 [0,299] w0; doc2 [300,599] spans w0-w1; doc3 [600,899] w1
    val d = Seq((1L, "x", 300), (2L, "x", 300), (3L, "x", 300),
      (10L, "y", 1200)).toDF("doc_id", "shard", "toks")
    val out = SamplingOps.packSequences(d, "shard", "doc_id",
        $"toks", capacity = 512)
      .select("doc_id", "first_window", "last_window", "n_windows")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == (0L, 0L, 1L))
    assert(out(2L) == (0L, 1L, 2L)) // spans the w0/w1 boundary
    assert(out(3L) == (1L, 1L, 1L))
    // shard y starts at its own offset 0 and spans ceil(1200/512)=3
    assert(out(10L) == (0L, 2L, 3L))
  }

  test("packSequences gives tied order keys sequential prefixes, not " +
    "the peer-group sum (ROWS frame, not RANGE)") {
    // two 300-token docs with the SAME order key: a RANGE frame would
    // give both the peer total 600 → both (0,1); ROWS must lay them
    // out sequentially → one (0,0), one (0,1)
    val d = Seq((1L, "x", 5, 300), (2L, "x", 5, 300))
      .toDF("doc_id", "shard", "ord", "toks")
    val spans = SamplingOps.packSequences(d, "shard", "ord",
        $"toks", capacity = 512)
      .select("first_window", "last_window").as[(Long, Long)]
      .collect().toSet
    assert(spans == Set((0L, 0L), (0L, 1L)))
  }

  test("seededShuffle: contiguous ranks, ±1-balanced round-robin " +
    "shards, shard_pos = rank div nShards, and a genuinely " +
    "non-identity permutation") {
    val docs = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id",
      "text")
    val out = SamplingOps.seededShuffle(docs, "doc_id", "s1", 8)
      .select("doc_id", "shuffle_rank", "shard", "shard_pos")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._2).sorted.toSeq == (0L until 100L),
      "ranks must be exactly 0..n-1")
    val sizes = out.groupBy(_._3).view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"shard sizes $sizes")
    assert(out.forall { case (_, r, s, p) => s == r % 8 && p == r / 8 })
    // md5 keying must actually permute (id order would mean the
    // hash never entered the sort)
    assert(out.sortBy(_._1).map(_._2).toSeq != (0L until 100L),
      "permutation is the identity — the seed key is not in play")
  }

  test("seededShuffle is idempotent per seed and independent " +
    "across seeds") {
    val docs = (0L until 64L).map(i => (i, s"d$i")).toDF("doc_id",
      "text")
    def ranks(seed: String): Map[Long, Long] =
      SamplingOps.seededShuffle(docs, "doc_id", seed, 4)
        .select("doc_id", "shuffle_rank").as[(Long, Long)]
        .collect().toMap
    val a1 = ranks("epoch0"); val a2 = ranks("epoch0")
    assert(a1 == a2, "same seed must replay the same permutation")
    val b = ranks("epoch1")
    assert(a1 != b, "different seeds must draw different permutations")
  }

  test("aesKey is deterministic, in (0,1), and monotone in the " +
    "weight for fixed content") {
    val d = Seq(("alpha doc", 1.0), ("alpha doc", 2.0),
      ("alpha doc", 8.0), ("other doc", 2.0))
      .toDF("text", "w")
    val keys = d.select(col("text"), col("w"),
        SamplingOps.aesKey(col("text"), col("w")).as("k"))
      .as[(String, Double, Double)].collect()
    assert(keys.forall { case (_, _, k) => k > 0.0 && k < 1.0 })
    val alpha = keys.filter(_._1 == "alpha doc").sortBy(_._2).map(_._3)
    // u^(1/w) grows with w for u in (0,1): heavier rows rank higher
    assert(alpha.zip(alpha.drop(1)).forall { case (a, b) => a < b })
    // same (content, weight) on a different row → identical key
    val k2 = keys.find(r => r._1 == "alpha doc" && r._2 == 2.0).get._3
    val k2b = d.filter(col("w") === 2.0 && col("text") === "alpha doc")
      .select(SamplingOps.aesKey(col("text"), col("w")))
      .as[Double].head()
    assert(k2 == k2b)
  }
}
