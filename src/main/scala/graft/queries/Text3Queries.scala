package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{DedupOps, TextOps, VectorOps}

/** Third text/corpus-surface battery — the round-9 additions to the
  * LLM-training-data family, each the distributed form of a published
  * curation signal the earlier batteries did not cover:
  *
  *   - `corpus_dup_ngrams`: ACROSS-document duplicated-n-gram share
  *     (the exact-substring dedup signal — [[graft.ext.DedupOps
  *     .corpusDupNgramShare]]); the per-doc repetition metrics in
  *     [[Text2Queries]] are WITHIN-doc.
  *   - `bigram_lm_score`: self-trained bigram-LM fluency score
  *     ([[graft.ext.TextOps.bigramLmScores]], the CCNet-style
  *     perplexity-filter shape with the corpus itself as the model).
  *   - `semantic_dedup`: SemDeDup-style cluster-then-prune embedding
  *     dedup ([[graft.ext.VectorOps.semanticDedup]]) — the scale
  *     answer to the all-pairs `dedup_embedding` form, with the
  *     quadratic stage confined within centroid clusters.
  *
  * Oracle parity rules are the module-wide ones: shared tokenization
  * (`regexp_split_to_array(lower(trim(text)), '\s+')` ≡
  * [[graft.ext.TextOps.tokens]]), doubles rounded to 6 decimals at
  * every comparison/argmax point, exact-decimal sums for anything
  * accumulated, full ORDER BY with unique tiebreak.
  */
object Text3Queries {

  private val tokSql =
    """CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      |       ELSE regexp_split_to_array(lower(trim(text)), '\s+')
      |  END""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // Corpus-level duplicated-n-gram share, n=5: the digest-shuffled
    // document-frequency fold over every doc's distinct 5-gram set.
    // Docs shorter than 5 tokens yield no row (no 5-grams) — mirrored
    // by the oracle's len(tok) >= 5 guard.
    "corpus_dup_ngrams" -> QueryDef(
      (s, d) => DedupOps.corpusDupNgramShare(
          Tables.documents(s, d), "doc_id", "text", 5)
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, $tokSql AS tok FROM documents),
        |g AS (SELECT DISTINCT doc_id, array_to_string(tok[i:i+4], ' ')
        |    AS gram
        |  FROM t, LATERAL (SELECT
        |    unnest(generate_series(1, len(tok) - 4)) AS i) u
        |  WHERE len(tok) >= 5),
        |dd AS (SELECT doc_id, count(*) OVER (PARTITION BY gram) AS df
        |  FROM g)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_grams,
        |  round(CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS dup_share
        |FROM dd GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Self-trained bigram-LM mean log-probability per document. The
    // model is the corpus's own bigram/left-token count frames; every
    // observed bigram has c2 >= 1 and c1 >= c2, so ln(c2/c1) is finite
    // and <= 0. Docs with < 2 tokens yield no row.
    "bigram_lm_score" -> QueryDef(
      (s, d) => TextOps.bigramLmScores(
          Tables.documents(s, d), "doc_id", "text")
        .select("doc_id", "n_bigrams", "lm_logprob")
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, $tokSql AS tok FROM documents),
        |bg AS (SELECT doc_id, array_to_string(tok[i:i+1], ' ') AS bigram,
        |    tok[i] AS w1
        |  FROM t, LATERAL (SELECT
        |    unnest(generate_series(1, len(tok) - 1)) AS i) u
        |  WHERE len(tok) >= 2),
        |c2 AS (SELECT bigram, count(*) AS c2 FROM bg GROUP BY 1),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
        |j AS (SELECT bg.doc_id,
        |    CAST(round(ln(CAST(c2.c2 AS DOUBLE) / c1.c1), 6)
        |      AS DECIMAL(20,6)) AS lp
        |  FROM bg JOIN c2 USING (bigram) JOIN c1 USING (w1))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS lm_logprob
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // SemDeDup over the embeddings table: per-label mean centroids as
    // the (deterministic, oracle-expressible) cluster model, nearest-
    // centroid assignment by rounded cosine, min-id survivor pruning
    // at cosine >= 0.2 within each assigned cluster. Output is the
    // per-cluster accounting frame.
    "semantic_dedup" -> QueryDef(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        VectorOps.semanticDedup(emb, "vec_id", "embedding",
            VectorOps.meanCentroids(emb, "embedding", "label")
              .withColumnRenamed("label", "cluster"),
            "cluster", threshold = 0.2)
          .orderBy("cluster")
      },
      Some("""WITH comp AS (SELECT label, u.dim, u.component
        |  FROM embeddings, LATERAL (SELECT
        |    unnest(generate_series(1, len(embedding))) AS dim,
        |    unnest(embedding) AS component) u),
        |cent AS (SELECT label AS cluster,
        |    list(mean_c ORDER BY dim) AS centroid
        |  FROM (SELECT label, dim,
        |      CAST(sum(CAST(component AS DECIMAL(25,6))) AS DOUBLE)
        |        / count(*) AS mean_c
        |    FROM comp GROUP BY label, dim) GROUP BY label),
        |a AS (SELECT e.vec_id, c.cluster,
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |      c.centroid), 6) AS cs
        |  FROM embeddings e CROSS JOIN cent c),
        |asg AS (SELECT vec_id, cluster FROM (
        |    SELECT vec_id, cluster, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cs DESC, cluster) AS rn
        |    FROM a) WHERE rn = 1),
        |pairs AS (SELECT DISTINCT x.cluster, y.vec_id AS drop_id
        |  FROM asg x JOIN asg y
        |    ON x.cluster = y.cluster AND x.vec_id < y.vec_id
        |  JOIN embeddings ex ON ex.vec_id = x.vec_id
        |  JOIN embeddings ey ON ey.vec_id = y.vec_id
        |  WHERE round(list_cosine_similarity(
        |    CAST(ex.embedding AS DOUBLE[]),
        |    CAST(ey.embedding AS DOUBLE[])), 6) >= 0.2),
        |drp AS (SELECT cluster, count(*) AS n_dropped
        |  FROM pairs GROUP BY 1)
        |SELECT asg.cluster, CAST(count(*) AS BIGINT) AS n_assigned,
        |  CAST(coalesce(max(drp.n_dropped), 0) AS BIGINT) AS n_dropped,
        |  CAST(count(*) - coalesce(max(drp.n_dropped), 0) AS BIGINT)
        |    AS n_kept
        |FROM asg LEFT JOIN drp ON asg.cluster = drp.cluster
        |GROUP BY asg.cluster ORDER BY asg.cluster""".stripMargin))
  )
}
