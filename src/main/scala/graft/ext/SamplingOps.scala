package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reproducible sampling, splitting, mixing, and sequence packing —
  * the corpus-assembly operations of a training-data pipeline, all
  * keyed by CONTENT-DETERMINISTIC hashes rather than RNG state.
  *
  * Why not `df.sample()`/`rand()`: RNG sampling is seed-and-partition
  * dependent — re-running after a repartition, adding one input file,
  * or recovering a failed stage yields a DIFFERENT sample, which at
  * 100 TB means a train/test split that silently drifts between
  * pipeline runs (and test-set leakage when a doc hops splits). A
  * hash of a stable key gives every row a permanent bucket: the split
  * is a pure function of the data, reproducible across runs, engines,
  * partitionings, and cluster sizes, and new data lands in the same
  * proportions without touching old rows' assignments. This is the
  * standard large-corpus practice, and it is also what makes these
  * operators DuckDB-oracle-checkable (no RNG to replicate).
  *
  * Scale shapes: bucket assignment is a narrow map (one md5 over the
  * key per row); sampling/splitting are filters with no shuffle at
  * all; the mixture is a union of filters; packing is one window
  * cumsum per shard (single shuffle on the shard key).
  */
object SamplingOps {

  /** Content-keyed deterministic bucket in [0, buckets): the first 8
    * hex chars of md5(key) as an integer, mod buckets. Stable across
    * runs/engines/partitionings; uniform to ~2⁻³² (the md5 prefix is
    * effectively a uniform 32-bit value, far finer than any realistic
    * bucket count). */
  def md5Bucket(key: Column, buckets: Int): Column =
    pmod(conv(substring(md5(key.cast("binary")), 1, 8), 16, 10)
      .cast("long"), lit(buckets))

  /** Keep ~pct% of rows, deterministically by key. A filter — no
    * shuffle, fully pushdown-friendly. */
  def deterministicSample(df: DataFrame, keyCol: String,
                          pct: Int): DataFrame =
    df.filter(md5Bucket(col(keyCol), 100) < pct)

  /** Efraimidis–Spirakis weighted-sampling key: `u^(1/w)` with
    * u ∈ (0,1) derived content-deterministically from the key (52
    * md5 bits, `(h + 0.5) / 2^52` — a power-of-two divisor, so u is
    * bit-exact in any engine). Taking the top-k rows by this key is
    * exactly weighted random sampling without replacement with
    * inclusion ∝ weight (A-ES, Efraimidis & Spirakis 2006), but with
    * the same reproducibility contract as [[md5Bucket]]: re-runs,
    * engines, and partitionings all draw the SAME sample. Rounded to
    * a 1e-9 grid (the `pow` is the rounded-transcendental class);
    * break remaining ties with the row id. Weights must be > 0. */
  def aesKey(key: Column, weight: Column): Column =
    round(pow(
      (conv(substring(md5(key.cast("binary")), 1, 13), 16, 10)
        .cast("long").cast("double") + lit(0.5)) /
        lit(4503599627370496.0),
      lit(1.0) / weight), 9)

  /** Permanent train/test assignment (~testPct% test) as a `split`
    * column. A doc's split never changes as the corpus grows — the
    * property that prevents slow test-set leakage across pipeline
    * re-runs. */
  def trainTestSplit(df: DataFrame, keyCol: String,
                     testPct: Int): DataFrame =
    df.withColumn("split",
      when(md5Bucket(col(keyCol), 100) < testPct, lit("test"))
        .otherwise(lit("train")))

  /** Per-stratum sampling rates (e.g. downsample dominant languages,
    * keep all of rare ones): rates maps stratum value → keep-percent,
    * `defaultPct` applies to unlisted strata. The rate lookup is a
    * broadcast-free CASE expression (rates is a small static config,
    * not data). */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       rates: Map[String, Int],
                       defaultPct: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(col(stratumCol) === k, lit(p)).otherwise(acc)
    }
    df.filter(md5Bucket(col(keyCol), 100) < rate)
  }

  /** Deterministic dataset mixture: from each (source-filter, weight)
    * component keep weight% of its rows, tagged with the component
    * name — the reproducible form of "mix corpora at fixed ratios".
    * Union of narrow filters: no shuffle, each component's scan keeps
    * its own pushdown. */
  def mixture(components: Seq[(String, DataFrame, Int)],
              keyCol: String): DataFrame =
    components.map { case (name, df, pct) =>
      deterministicSample(df, keyCol, pct)
        .withColumn("mix_component", lit(name))
    }.reduce(_ unionByName _)

  /** Seeded corpus-GLOBAL shuffle — the "shuffle the corpus before
    * packing" step of a training-order export (VERDICT r13 #4):
    * every doc gets a permutation rank `shuffle_rank` (0..n−1, a
    * uniform random order keyed by `md5(seed|id)`), a round-robin
    * `shard` (= rank mod nShards: shard sizes balanced to ±1 by
    * construction) and its position within the shard (`shard_pos` =
    * rank div nShards — within a shard the permutation order is
    * preserved, so "read shards in shard_pos order" replays the
    * global shuffle). Same determinism contract as every op here:
    * the permutation is a pure function of (seed, id) — re-runs,
    * engines, partitionings, and cluster sizes produce the SAME
    * order, a new seed produces an independent one, and the whole
    * layout is DuckDB-re-derivable (export_shuffled). `rand()`-based
    * shuffles give none of that: a stage retry at 100 TB would
    * silently re-deal the epoch order mid-export.
    *
    * Scale shape: the rank is [[graft.ops.Relational
    * .contiguousRowIds]] over the hash key — ordered value-bucket
    * pieces ranked in parallel plus broadcast offsets, never a
    * single-partition global window; the md5 keys are uniform, so
    * the pieces are balanced regardless of id distribution. One
    * bounded sample job + one hash shuffle + a broadcast join. */
  def seededShuffle(df: DataFrame, idCol: String, seed: String,
                    nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards")
    val keyed = df.withColumn("__sk",
      md5(concat(lit(seed), lit("|"), col(idCol).cast("string"))
        .cast("binary")))
    graft.ops.Relational.contiguousRowIds(keyed,
        Seq(col("__sk"), col(idCol)), "shuffle_rank")
      .withColumn("shard", pmod(col("shuffle_rank"), lit(nShards.toLong)))
      .withColumn("shard_pos",
        floor(col("shuffle_rank") / nShards).cast("long"))
      .drop("__sk")
  }

  /** Concat-and-chunk sequence packing: documents are laid out
    * end-to-end in a deterministic order within each shard and cut
    * into fixed-`capacity` token windows — the standard LLM-training
    * packing (documents spanning a window boundary appear in both
    * windows; no padding waste). Emits per doc: its token count, the
    * first/last window it lands in, and how many windows it spans.
    *
    * One window cumsum per shard = a single shuffle on `shardCol`;
    * at 100 TB shard by (lang, date, …) so each shard's running sum
    * is an independent partition-local scan. The window ids are pure
    * arithmetic on the cumsum, so the layout is reproducible and
    * oracle-checkable. */
  def packSequences(df: DataFrame, shardCol: String, orderCol: String,
                    tokenCol: Column, capacity: Int): DataFrame = {
    // explicit ROWS frame: the default frame with an orderBy is RANGE
    // UNBOUNDED PRECEDING..CURRENT ROW, which sums over ORDER-KEY
    // PEERS — duplicate orderCol values would all receive the
    // peer-group total and get identical (wrong, overlapping) window
    // spans. ROWS gives each row its own running prefix regardless of
    // ties; for a REPRODUCIBLE layout pass a unique orderCol (tied
    // rows fall back to partition-arrival order).
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__tokens", tokenCol)
      .withColumn("__end", sum(col("__tokens")).over(w))
      .withColumn("__start", col("__end") - col("__tokens"))
      .withColumn("first_window",
        floor(col("__start") / capacity).cast("long"))
      .withColumn("last_window",
        floor((col("__end") - 1) / capacity).cast("long"))
      .withColumn("n_windows",
        col("last_window") - col("first_window") + 1)
      .drop("__start", "__end")
      .withColumnRenamed("__tokens", "n_tokens")
  }
}
