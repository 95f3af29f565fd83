package graft

import org.apache.spark.sql.functions._
import graft.ext.{DedupOps, TextOps, VectorOps}

/** Round-9 corpus-signal operators: across-doc duplicated-n-gram
  * share, self-trained bigram-LM scoring, and SemDeDup-style semantic
  * dedup — each checked against a hand-computed model on crafted
  * corpora (their DuckDB twins gate the registry queries; these specs
  * pin the semantics the twins encode). */
class CorpusSignalsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------- corpusDupNgramShare ----------------

  test("corpusDupNgramShare matches the brute-force model") {
    // doc 1 and 2 share their middle trigram; doc 3 is disjoint;
    // doc 4 is too short for any trigram
    val docs = Seq(
      (1L, "a b c d e"),   // trigrams: abc bcd cde
      (2L, "x b c d y"),   // trigrams: xbc bcd cdy
      (3L, "p q r s"),     // trigrams: pqr qrs
      (4L, "t u")          // none
    ).toDF("doc_id", "text")
    val out = DedupOps.corpusDupNgramShare(docs, "doc_id", "text", 3)
      .orderBy("doc_id")
      .select("doc_id", "n_grams", "n_dup_grams", "dup_share")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1L, 3L, 1L, 0.333333),
      (2L, 3L, 1L, 0.333333),
      (3L, 2L, 0L, 0.0)))
  }

  test("corpusDupNgramShare counts document frequency over DISTINCT " +
    "per-doc grams (within-doc repetition is not corpus duplication)") {
    // "b c" occurs twice INSIDE doc 1 but in no other doc → not dup;
    // "c d" occurs once in each doc → dup for both
    val docs = Seq(
      (1L, "b c b c d"),   // distinct bigrams: "b c", "c b", "c d"
      (2L, "c d")          // distinct bigrams: "c d"
    ).toDF("doc_id", "text")
    val out = DedupOps.corpusDupNgramShare(docs, "doc_id", "text", 2)
      .orderBy("doc_id")
      .select("doc_id", "n_grams", "n_dup_grams")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 3L, 1L), (2L, 1L, 1L)))
  }

  // ---------------- bigramLmScores ----------------

  test("bigramLmScores matches hand-computed ML bigram probabilities") {
    // corpus bigram instances: "a b" x2, "a c" x1, left-counts a=3
    //   doc 1 "a b":     lp = ln(2/3)
    //   doc 2 "a c":     lp = ln(1/3)
    //   doc 3 "a b":     lp = ln(2/3)
    val docs = Seq(
      (1L, "a b"), (2L, "a c"), (3L, "a b"),
      (4L, "solo")  // < 2 tokens → no row
    ).toDF("doc_id", "text")
    val out = TextOps.bigramLmScores(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "lm_logprob")
      .as[(Long, Long, Double)].collect().toSeq
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(out.map(_._1) === Seq(1L, 2L, 3L))
    assert(out.map(_._2) === Seq(1L, 1L, 1L))
    assert(out(0)._3 === r6(math.log(2.0 / 3)))
    assert(out(1)._3 === r6(math.log(1.0 / 3)))
    assert(out(2)._3 === out(0)._3)
  }

  test("bigramLmScores: every score is finite and <= 0 " +
    "(ML probabilities never exceed 1, observed bigrams never have " +
    "zero count)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val scores = TextOps.bigramLmScores(docs, "doc_id", "text")
      .select("lm_logprob").as[Double].collect()
    assert(scores.nonEmpty)
    assert(scores.forall(s => !s.isNaN && !s.isInfinite && s <= 0.0))
  }

  // ---------------- meanCentroids / semanticDedup ----------------

  test("meanCentroids computes per-group element-wise means") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), "g1"),
      (2L, Seq(3.0f, 2.0f), "g1"),
      (3L, Seq(0.0f, 4.0f), "g2")
    ).toDF("id", "vec", "grp")
    val cents = VectorOps.meanCentroids(df, "vec", "grp")
      .orderBy("grp")
      .select(col("grp"), col("centroid"))
      .as[(String, Seq[Double])].collect().toSeq
    assert(cents === Seq(("g1", Seq(2.0, 1.0)), ("g2", Seq(0.0, 4.0))))
  }

  test("semanticDedup assigns to the nearest centroid and prunes " +
    "within clusters with min-id survivors") {
    // two orthogonal directions; ids 1,2,3 are near-identical copies
    // along e1 (pairwise cosine ~1), id 4 is distinct but e1-leaning;
    // ids 10,11 duplicate along e2. Expect cluster A keeps min-id 1
    // (+ the distinct 4), cluster B keeps 10.
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.99f, 0.01f)),
      (3L, Seq(0.98f, 0.02f)),
      (4L, Seq(0.8f, 0.6f)),     // e1 side, but cosine < 0.99 vs 1-3
      (10L, Seq(0.0f, 1.0f)),
      (11L, Seq(0.01f, 0.99f))
    ).toDF("id", "vec")
    val centroids = Seq(
      (0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0))
    ).toDF("cluster", "centroid")
    val out = VectorOps.semanticDedup(vecs, "id", "vec", centroids,
        "cluster", threshold = 0.995)
      .orderBy("cluster")
      .select("cluster", "n_assigned", "n_dropped", "n_kept")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(out === Seq((0, 4L, 2L, 2L), (1, 2L, 1L, 1L)))
  }

  test("semanticDedup accounting invariants on the real corpus: " +
    "every vector is assigned exactly once, kept = assigned - dropped") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = VectorOps.meanCentroids(emb, "embedding", "label")
      .withColumnRenamed("label", "cluster")
    val out = VectorOps.semanticDedup(emb, "vec_id", "embedding",
      cents, "cluster", threshold = 0.2)
    val rows = out.select("n_assigned", "n_dropped", "n_kept")
      .as[(Long, Long, Long)].collect()
    assert(rows.map(_._1).sum === emb.count())
    assert(rows.forall { case (a, d, k) => k == a - d && d >= 0 && k >= 1 })
  }
}
