package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: remove (or flag) corpus documents that
  * share any word n-gram with an evaluation/benchmark set — the
  * standard guard against test-set leakage into training data.
  *
  * Scale shape (the reason this is its own operator, not a join the
  * caller writes): the eval side is benchmarks — thousands of
  * documents, MBs of distinct n-grams — while the corpus side is the
  * 100 TB store. So the eval n-gram set is collected into a BROADCAST
  * hash relation and the corpus side stays a narrow explode + semi
  * join: zero corpus shuffle, no matter the corpus size. Only the
  * matched ids (a tiny fraction) hit the final distinct's exchange.
  * N-grams join as exact strings by default: for benchmark-sized
  * eval sets the broadcast fits comfortably, and exactness keeps the
  * operator oracle-checkable end to end. `hashed = true` is the
  * production squeeze: each n-gram is xxhash64'd to a long on BOTH
  * sides before the join — same plan shape, ~4× smaller broadcast
  * build side, with a per-(corpus-ngram, eval-ngram) false-positive
  * rate of 2^-64 (DecontamSpec asserts the two modes flag identical
  * documents on the bench corpus).
  */
object DecontamOps {

  /** Distinct ids of `corpus` documents sharing at least one word
    * n-gram with `evalSet`. Documents shorter than `n` tokens have no
    * n-grams and are never flagged. */
  def contaminatedIds(corpus: DataFrame, evalSet: DataFrame,
                      idCol: String, textCol: String, n: Int,
                      hashed: Boolean = false): DataFrame = {
    // explode must stay a top-level generator; the hash squeeze is a
    // follow-up projection (fused by codegen, no extra pass)
    def key(ng: Column): Column = if (hashed) xxhash64(ng) else ng
    val evalNg = evalSet
      .select(explode(TextOps.wordNgrams(col(textCol), n)).as("__ng0"))
      .select(key(col("__ng0")).as("__ng"))
      .distinct()
    corpus
      .select(col(idCol),
        explode(TextOps.wordNgrams(col(textCol), n)).as("__ng0"))
      .select(col(idCol), key(col("__ng0")).as("__ng"))
      .join(broadcast(evalNg), Seq("__ng"), "left_semi")
      .select(idCol)
      .distinct()
  }

  /** `corpus` with contaminated documents removed. */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame,
                    idCol: String, textCol: String, n: Int,
                    hashed: Boolean = false): DataFrame =
    corpus.join(
      contaminatedIds(corpus, evalSet, idCol, textCol, n, hashed),
      Seq(idCol), "left_anti")

  /** `corpus` plus a `contaminated` boolean — the audit form (keep
    * everything, let downstream decide). */
  def flagContaminated(corpus: DataFrame, evalSet: DataFrame,
                       idCol: String, textCol: String, n: Int,
                       hashed: Boolean = false): DataFrame = {
    val bad = contaminatedIds(corpus, evalSet, idCol, textCol, n, hashed)
      .withColumn("__contam", lit(true))
    corpus.join(bad, Seq(idCol), "left")
      .withColumn("contaminated", coalesce(col("__contam"), lit(false)))
      .drop("__contam")
  }

  /** Per-EVAL-document leak report — the audit a benchmark owner runs
    * against a training corpus: for every eval document, how many
    * corpus documents share at least one word `n`-gram with it
    * (`n_contaminating_docs`) and how many distinct n-grams leak
    * (`n_shared_ngrams`). Every eval document gets a row (zeros when
    * clean), so the report doubles as a clean-bill certificate.
    *
    * Same scale shape as [[contaminatedIds]]: the eval n-gram set
    * (now carrying its eval ids) is the broadcast build side; the
    * corpus side is a narrow explode probed against it, so only
    * MATCHED instances — the leak minority — reach the dedupe/agg
    * exchange. The corpus is never shuffled, whatever its size. */
  def leakReport(corpus: DataFrame, evalSet: DataFrame,
                 idCol: String, textCol: String, n: Int): DataFrame =
    // no pre-dedupe of the instances: the distinct aggregates dedupe
    // internally (one Expand + exchange instead of a distinct
    // exchange + an agg one)
    reportFromHits(leakInstances(corpus, evalSet, idCol, textCol, n),
      evalSet, idCol)

  /** Matched (eval_id, corpus_id, n-gram) leak INSTANCES — the probe
    * shared by the one-shot [[leakReport]] and the streaming hits
    * sink ([[leakHits]]): eval n-grams broadcast, corpus side a
    * narrow explode, only matches survive. Not deduped. */
  private def leakInstances(corpus: DataFrame, evalSet: DataFrame,
                            idCol: String, textCol: String,
                            n: Int): DataFrame = {
    val evalNg = evalSet
      .select(col(idCol).as("eval_id"),
        explode(TextOps.wordNgrams(col(textCol), n)).as("__ng"))
      .distinct()
    corpus
      .select(col(idCol).as("corpus_id"),
        explode(TextOps.wordNgrams(col(textCol), n)).as("__ng"))
      .join(broadcast(evalNg), Seq("__ng"))
      .select("eval_id", "corpus_id", "__ng")
  }

  /** DISTINCT leak hits for a corpus batch — the append payload of
    * the streaming leak audit ([[graft.streaming.StreamingOps
    * .leakReportStream]]): (eval_id, corpus_id, __ng) rows, one per
    * leaking combination. Hit-grain is the LEAK MINORITY (matched
    * instances only), so the persisted audit log stays small however
    * large the corpus; identical rows from a replayed batch collapse
    * under the serve-side fold, making at-least-once appends
    * idempotent WITHOUT batch ids. */
  def leakHits(corpus: DataFrame, evalSet: DataFrame, idCol: String,
               textCol: String, n: Int): DataFrame =
    leakInstances(corpus, evalSet, idCol, textCol, n).distinct()

  /** FUZZY contamination audit — the near-duplicate complement of the
    * exact n-gram rule (the "high-overlap" check the Llama/PaLM
    * decontamination write-ups apply after an n-gram hit: an eval
    * item paraphrased or partially quoted in a training document
    * leaks signal even when whole n-grams mostly differ). For every
    * (corpus doc, eval doc) pair sharing at least one word `n`-gram,
    * compute `eval_overlap` = |distinct corpus tokens ∩ distinct eval
    * tokens| / |distinct eval tokens| — the fraction of the EVAL
    * item's vocabulary the corpus document covers (asymmetric by
    * design: eval items are short, and a corpus doc that embeds one
    * is contamination regardless of how much else it contains) — and
    * flag pairs at `tau` or above. Pairs sharing NO n-gram are not
    * candidates and get no row: the n-gram gate is the recall
    * boundary, stated in the contract rather than hidden (a
    * paraphrase sharing not a single 4-gram is invisible to this
    * operator — that case belongs to the embedding family).
    *
    * Scale shape: candidates come from [[leakInstances]] (eval
    * n-grams broadcast, corpus side a narrow explode — the corpus
    * never shuffles, only the leak minority survives); the verify
    * stage joins candidate pairs back to sorted 64-bit hashed token
    * sets and counts intersections with the fused sorted-merge
    * kernel ([[graft.functions.SortedLongIntersectCount]] — the
    * per-pair discipline of every exact verify tier in this repo;
    * 2⁻⁶⁴-per-pair hash equality accepted as at those six sites),
    * the eval set-side broadcast. */
  def fuzzyContaminationReport(corpus: DataFrame, evalSet: DataFrame,
                               idCol: String, textCol: String,
                               n: Int = 4,
                               tau: Double = 0.6): DataFrame = {
    def tokSets(df: DataFrame, as: String, setAs: String) =
      df.select(col(idCol).as(as),
        sort_array(array_distinct(transform(
          TextOps.tokens(col(textCol)), t => xxhash64(t)))).as(setAs))
    // persisted: the candidate frame feeds both the corpus-side
    // semi-filter below and the final pair join — uncached, the
    // broadcast probe would re-run the whole gate stage
    val cand = leakInstances(corpus, evalSet, idCol, textCol, n)
      .select("corpus_id", "eval_id").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // token sets are built ONLY for candidate corpus documents (the
    // leak minority), never the whole corpus: the expensive
    // tokenize/sort stage rides behind a broadcast semi-join on the
    // candidate ids (8-byte ids, not token sets — bounded by the
    // gate's hit count, the operator's stated leak-minority contract;
    // ADVICE r14 closing). Without it, every corpus document was
    // tokenized, sorted, and shuffled into the pair join just to be
    // dropped there.
    val candCorpus = corpus.join(
      broadcast(cand.select(col("corpus_id").as(idCol)).distinct()),
      Seq(idCol), "left_semi")
    cand
      .join(tokSets(candCorpus, "corpus_id", "__cs"), Seq("corpus_id"))
      .join(broadcast(tokSets(evalSet, "eval_id", "__es")),
        Seq("eval_id"))
      .select(col("corpus_id"), col("eval_id"),
        round(graft.functions.native
            .intersect_count_sorted(col("__cs"), col("__es"))
            .cast("double") /
          greatest(size(col("__es")), lit(1)), 6).as("eval_overlap"))
      // the flag derives from the ROUNDED overlap so both engines
      // compare the same 6-decimal value (events_anomaly discipline)
      .withColumn("contaminated_fuzzy", col("eval_overlap") >= tau)
  }

  /** SEMANTIC (embedding-level) contamination report — the layer the
    * n-gram family cannot reach, and the complement
    * [[fuzzyContaminationReport]]'s own contract points at: a
    * paraphrased eval item sharing not a single word n-gram with a
    * training document leaks signal all the same (the GPT-3 appendix-C
    * / Llama decontamination write-ups pair the n-gram gate with an
    * embedding screen for exactly this case). For every (corpus doc,
    * eval doc) pair whose embedding cosine reaches `tau`, one row
    * (corpus_id, eval_id, cosine_sim) — cosine rounded to 6 decimals
    * and thresholded on the ROUNDED value, so both engines compare the
    * same number (the `events_anomaly` discipline).
    *
    * Scale shape (the [[contaminatedIds]] posture at the embedding
    * grain): the eval side is benchmarks — thousands of items — so it
    * rides INSIDE one expression per corpus row
    * ([[graft.functions.CosineMatchesAboveTau]]) and the corpus side
    * is one scan that emits ONLY the matching pairs. The corpus never
    * shuffles whatever its size, and there is no join operator at all
    * — the r16 zipf16 leg post-mortem showed the previous
    * corpus × broadcast(evals) BroadcastNestedLoopJoin form
    * MATERIALIZING 311k × 8.6k ≈ 2.7e9 joined rows (each copying both
    * 64-float vectors into an UnsafeRow) just to filter them down to
    * the leak minority: 490 s of row churn for kilobytes of hits.
    * This is deliberately NOT the ANN-index path: an eval set small
    * enough to broadcast makes exhaustive eval-side comparison both
    * exact and cheaper than probing an index per corpus doc.
    *
    * The eval side is collected to the driver at CALL time — bounded
    * by [[maxSemanticEvalVectors]] (eval sets are benchmark-sized by
    * this operator's contract; a corpus-sized "eval" side belongs on
    * the ANN path) — and each per-pair cosine is bit-identical to the
    * previous `round(CosineSimilarity, 6)` join form (the kernel
    * hoists norm sums without reordering any accumulator's
    * additions). Null embeddings on either side yield no rows (a doc
    * that was never embedded cannot be screened here — run the n-gram
    * gate on it; silent null passthrough in a leak audit would read
    * as a clean bill). Eval ids must be integral (the kernel carries
    * them as longs and the output casts back to the input id type). */
  def semanticContaminationReport(corpus: DataFrame, evalSet: DataFrame,
                                  idCol: String, vecCol: String,
                                  tau: Double): DataFrame = {
    val idType = evalSet.schema(idCol).dataType
    require(Seq("tinyint", "smallint", "int", "bigint")
        .contains(idType.simpleString),
      s"semantic screen eval id must be integral, got $idType")
    // bounded driver-side collect: the eval table rides the kernel
    // expression (task-serialized once per task), so its size is a
    // hard contract, not a soft hint
    val evalRows = evalSet.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("bigint"),
        col(vecCol).cast("array<float>"))
      .collect()
    require(evalRows.length <= maxSemanticEvalVectors,
      s"semantic screen eval side has ${evalRows.length} vectors — " +
        s"the exhaustive screen is contracted to benchmark-sized " +
        s"eval sets (<= $maxSemanticEvalVectors); use the ANN index " +
        "path for corpus-scale similarity")
    val ids = evalRows.map(_.getLong(0)).toSeq
    val vecs = evalRows
      .map(_.getSeq[Float](1).toArray).toSeq
    // NOT widened here: the op's contract is ONE corpus scan with no
    // exchange at all (DecontamSpec pins it) — callers with a narrow
    // scan widen the corpus before passing it in
    corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("corpus_id"),
        explode(graft.functions.native.cosine_matches_above_tau(
          col(vecCol), ids, vecs, tau)).as("__m"))
      .select(col("corpus_id"),
        col("__m.eval_id").cast(idType).as("eval_id"),
        col("__m.cosine_sim").as("cosine_sim"))
  }

  /** Hard bound on the semantic screen's driver-collected eval side:
    * 64k vectors (× a typical 64–1024 dims ≈ 16–256 MB of floats as
    * task payload ceiling). Real eval suites are thousands of items;
    * anything larger is not an "eval set" and belongs on the ANN
    * index path. */
  val maxSemanticEvalVectors: Int = 65536

  /** Distinct corpus ids the semantic screen flags at `tau` — the
    * droppable-id form of [[semanticContaminationReport]]. */
  def semanticContaminatedIds(corpus: DataFrame, evalSet: DataFrame,
                              idCol: String, vecCol: String,
                              tau: Double): DataFrame =
    semanticContaminationReport(corpus, evalSet, idCol, vecCol, tau)
      .select(col("corpus_id").as(idCol)).distinct()

  /** `corpus` with semantically contaminated documents removed. */
  def semanticDecontaminate(corpus: DataFrame, evalSet: DataFrame,
                            idCol: String, vecCol: String,
                            tau: Double): DataFrame =
    corpus.join(
      semanticContaminatedIds(corpus, evalSet, idCol, vecCol, tau),
      Seq(idCol), "left_anti")

  /** The FULL two-layer decontamination pass the production write-ups
    * actually run: drop a corpus document if it trips EITHER the exact
    * word-n-gram gate (any shared `n`-gram with any eval item —
    * [[contaminatedIds]]) OR the embedding screen (cosine ≥ `tau`
    * against any eval item — [[semanticContaminatedIds]]). The two
    * layers are complementary by construction: the n-gram gate catches
    * verbatim and near-verbatim inclusion regardless of embedding
    * quality; the semantic screen catches paraphrases sharing no
    * n-gram, which are invisible to the gate (DecontamSpec constructs
    * exactly that pair). Both layers broadcast the eval side; the
    * corpus is scanned twice (once per layer — the layers need
    * different columns) and shuffled never; the union of flagged ids
    * is leak-minority-sized. */
  def decontaminateFull(corpus: DataFrame, evalSet: DataFrame,
                        idCol: String, textCol: String, vecCol: String,
                        n: Int, tau: Double,
                        hashed: Boolean = false): DataFrame = {
    val bad = contaminatedIds(corpus, evalSet, idCol, textCol, n, hashed)
      .unionByName(
        semanticContaminatedIds(corpus, evalSet, idCol, vecCol, tau))
      .distinct()
    corpus.join(bad, Seq(idCol), "left_anti")
  }

  /** Fold a frame of leak hit rows (shape of [[leakHits]], possibly
    * with duplicates from at-least-once appends) into the per-eval
    * report [[leakReport]] emits. With hits accumulated over corpus
    * batches that partition a corpus, the folded report EQUALS the
    * one-shot report over the whole corpus (StreamingSpec asserts
    * the 2-micro-batch equality). */
  def reportFromHits(hits: DataFrame, evalSet: DataFrame,
                     idCol: String): DataFrame = {
    val agg = hits.groupBy("eval_id")
      .agg(count_distinct(col("corpus_id")).as("n_contaminating_docs"),
        count_distinct(col("__ng")).as("n_shared_ngrams"))
    evalSet.select(col(idCol).as("eval_id")).distinct()
      .join(agg, Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n_contaminating_docs"), lit(0L))
          .as("n_contaminating_docs"),
        coalesce(col("n_shared_ngrams"), lit(0L)).as("n_shared_ngrams"))
  }
}
