package graft.ext

import org.apache.spark.sql.DataFrame
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
  * N-grams join as exact strings: for benchmark-sized eval sets the
  * broadcast fits comfortably, and exactness keeps the operator
  * oracle-checkable end to end (a production deployment squeezing
  * broadcast bytes can hash each n-gram to a long first — same plan,
  * ~4× smaller build side, with a 2^-64 false-positive rate).
  */
object DecontamOps {

  /** Distinct ids of `corpus` documents sharing at least one word
    * n-gram with `evalSet`. Documents shorter than `n` tokens have no
    * n-grams and are never flagged. */
  def contaminatedIds(corpus: DataFrame, evalSet: DataFrame,
                      idCol: String, textCol: String,
                      n: Int): DataFrame = {
    val evalNg = evalSet
      .select(explode(TextOps.wordNgrams(col(textCol), n)).as("__ng"))
      .distinct()
    corpus
      .select(col(idCol),
        explode(TextOps.wordNgrams(col(textCol), n)).as("__ng"))
      .join(broadcast(evalNg), Seq("__ng"), "left_semi")
      .select(idCol)
      .distinct()
  }

  /** `corpus` with contaminated documents removed. */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame,
                    idCol: String, textCol: String, n: Int): DataFrame =
    corpus.join(contaminatedIds(corpus, evalSet, idCol, textCol, n),
      Seq(idCol), "left_anti")

  /** `corpus` plus a `contaminated` boolean — the audit form (keep
    * everything, let downstream decide). */
  def flagContaminated(corpus: DataFrame, evalSet: DataFrame,
                       idCol: String, textCol: String,
                       n: Int): DataFrame = {
    val bad = contaminatedIds(corpus, evalSet, idCol, textCol, n)
      .withColumn("__contam", lit(true))
    corpus.join(bad, Seq(idCol), "left")
      .withColumn("contaminated", coalesce(col("__contam"), lit(false)))
      .drop("__contam")
  }
}
