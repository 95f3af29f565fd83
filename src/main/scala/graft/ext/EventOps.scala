package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators in batch form (every one has a Structured
  * Streaming twin in [[graft.streaming.StreamingOps]] — same logical
  * plan with `readStream` + watermark).
  *
  * Scale notes: every operator here is a single shuffle on its key
  * (user/session key or window bucket) — the same shape Spark uses for
  * streaming state stores, so the batch plan is the scale model of the
  * streaming one.
  */
object EventOps {

  /** Tumbling-window aggregation: epoch-aligned fixed windows — the
    * batch form of `groupBy(window(ts, dur))`. */
  def tumblingAgg(events: DataFrame, tsCol: String, duration: String,
                  keys: Seq[String], aggs: Seq[Column]): DataFrame =
    events
      .groupBy((window(col(tsCol), duration) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Gap-based sessionization via `session_window`: a session extends
    * while consecutive events arrive within `gap`; session end = last
    * event + gap. One shuffle on (key, session). */
  def sessionize(events: DataFrame, tsCol: String, gap: String,
                 keys: Seq[String], aggs: Seq[Column]): DataFrame =
    events
      .groupBy((session_window(col(tsCol), gap) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")

  /** As-of join: for each left row, attach the latest right row with
    * `right.ts <= left.ts` on the same key (inner semantics: lefts
    * with no prior right row are dropped).
    *
    * Spark-first design (SURVEY §7.3 preference (a) — composition):
    * union both sides tagged with a priority, then a single
    * per-key window pass carries the last-seen right payload forward
    * (`last(..., ignoreNulls)` over rows unbounded-preceding). At any
    * scale this is ONE shuffle on the key — strictly cheaper than the
    * sort-merge-band join a naive range-join formulation would plan,
    * and the same shape a dedicated AsOfJoinExec would produce.
    * Ties (left.ts == right.ts) take the right row, matching
    * inclusive `>=` (DuckDB ASOF JOIN semantics).
    *
    * @param payload right-side value columns to carry; emitted with
    *                their own names. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               tsCol: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == key || c == tsCol)
    val pri = "__is_right"
    // "was there a prior right row" is decided by a guaranteed-non-null
    // marker (the right-side ts), NOT the first payload column — a
    // right row may legitimately carry NULL payload, and filtering on
    // the payload would silently substitute an older row's value (or
    // drop the left row), diverging from ASOF semantics.
    val mk = "__matched_ts"
    val taggedRight = right.select(
      (Seq(col(key), col(tsCol), lit(1).as(pri), col(tsCol).as(mk)) ++
        payload.map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (Seq(col(key), col(tsCol), lit(0).as(pri),
        lit(null).cast(right.schema(tsCol).dataType).as(mk)) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftCols.map(col)): _*)
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol), col(pri).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the carried payload must come from THE matched right row, not
    // the last non-NULL value across older rows: wrap each payload in
    // a per-right-row struct (non-null even when the payload value is
    // NULL), carry the struct with last(ignoreNulls), then unwrap —
    // NULL payloads propagate as-is instead of resurrecting older rows
    val unioned = taggedRight.unionByName(taggedLeft)
      .withColumn(mk, last(col(mk), ignoreNulls = true).over(w))
    val filled = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c,
        last(when(col(pri) === 1, struct(col(c))), ignoreNulls = true)
          .over(w)(c))
    }
    filled.filter(col(pri) === 0 && col(mk).isNotNull)
      .drop(pri, mk)
  }

  /** Hot-key-hardened as-of join: same semantics as [[asofJoin]], but
    * the single window partition per key is split into
    * (key, time-bucket) partitions, so one hot key no longer
    * serializes into one task — the unit of serial work becomes one
    * key's rows within one bucket.
    *
    * Two passes, both key-parallel:
    *  1. a per-(key, bucket) summary of the LAST right row (`max_by`
    *     aggregation — rows ≈ #buckets, tiny), from which each left
    *     bucket gets its carry-in seed: the latest right row of any
    *     strictly earlier bucket, found with a window over the bucket
    *     summaries (per-key rows = bucket count, never event count);
    *  2. the [[asofJoin]] union+window pass, with the window
    *     partitioned by (key, bucket) and the seed row injected into
    *     each left bucket so matches crossing bucket boundaries are
    *     preserved.
    *
    * `bucketExpr` must be monotone in the timestamp (e.g.
    * `date_trunc("hour", _)` for timestamps, `floor(_ / 1000)` for
    * epoch longs); granularity trades carry-table size against
    * per-task width. Seeds never reach the output (only left rows
    * survive the final filter). */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, key: String,
                       tsCol: String, payload: Seq[String],
                       bucketExpr: Column => Column): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == key || c == tsCol)
    val pri = "__is_right"
    val mk = "__matched_ts"
    val b = "__bucket"

    // last right row per (key, bucket); max_by keeps ties arbitrary,
    // same as the unbucketed window's behavior on equal (ts, pri)
    val rightStruct = struct((col(tsCol).as("ts") +: payload.map(col)): _*)
    val sums = right.groupBy(col(key), bucketExpr(col(tsCol)).as(b))
      .agg(max_by(rightStruct, col(tsCol)).as("__last_right"))

    // carry-in per left bucket: latest right summary from any STRICTLY
    // earlier bucket (in-bucket right rows flow through the main pass)
    val lb = left.select(col(key), bucketExpr(col(tsCol)).as(b)).distinct()
      .withColumn("__is_lb", lit(true))
    val wb = Window.partitionBy(key).orderBy(col(b))
      .rowsBetween(Window.unboundedPreceding, -1)
    val seeds = lb.join(sums, Seq(key, b), "full_outer")
      .withColumn("__carry",
        last(col("__last_right"), ignoreNulls = true).over(wb))
      .filter(col("__is_lb") && col("__carry").isNotNull)
      .select(
        (Seq(col(key), col("__carry.ts").as(tsCol), lit(1).as(pri),
          col("__carry.ts").as(mk), col(b)) ++
          payload.map(c => col(s"__carry.$c").as(c)) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val taggedRight = right.select(
      (Seq(col(key), col(tsCol), lit(1).as(pri), col(tsCol).as(mk),
        bucketExpr(col(tsCol)).as(b)) ++
        payload.map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (Seq(col(key), col(tsCol), lit(0).as(pri),
        lit(null).cast(right.schema(tsCol).dataType).as(mk),
        bucketExpr(col(tsCol)).as(b)) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftCols.map(col)): _*)

    val w = Window.partitionBy(col(key), col(b))
      .orderBy(col(tsCol), col(pri).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val unioned = taggedRight.unionByName(seeds).unionByName(taggedLeft)
      .withColumn(mk, last(col(mk), ignoreNulls = true).over(w))
    val filled = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c,
        last(when(col(pri) === 1, struct(col(c))), ignoreNulls = true)
          .over(w)(c))
    }
    filled.filter(col(pri) === 0 && col(mk).isNotNull)
      .drop(pri, mk, b)
  }

  /** Streaming-style first-seen dedup (R12 batch shadow): keep the
    * earliest event per key under a deterministic total order. */
  def dedupFirstSeen(events: DataFrame, keys: Seq[String],
                     order: Seq[Column]): DataFrame =
    graft.ops.Relational.dedupeByKeyOrdered(events, keys, order)

  /** Strict ordered funnel: per entity, the earliest time each step
    * was reached AFTER the previous step's reach time (step k counts
    * only if an event of step k's type occurs at-or-after the step
    * k-1 time; ties allowed, matching product-analytics "same
    * timestamp still converts" convention). With `maxStepDelay`
    * (e.g. `"5 MINUTES"`), step k additionally must occur within
    * that interval of step k-1 — the ATTRIBUTION-WINDOW funnel
    * (unbounded funnels overcount casual returns).
    *
    * Returns one row per entity with columns `t1..tn` (nullable
    * timestamps) — the caller aggregates reach counts.
    *
    * Scale shape: ONE hash shuffle on the entity key; the chained
    * conditional `min() OVER (PARTITION BY key)` windows all reuse
    * that single exchange (no per-step join against an ever-smaller
    * survivor set, which would be n-1 extra shuffles). Per-partition
    * state is one group's events — the same per-key-fits-an-executor
    * assumption as every other window op here (hot entities:
    * time-bucket first, as in [[asofJoinBucketed]]). */
  def funnelStages(events: DataFrame, keyCol: String, typeCol: String,
                   tsCol: String, steps: Seq[String],
                   maxStepDelay: Option[String] = None): DataFrame = {
    val w = Window.partitionBy(keyCol)
    val staged = steps.zipWithIndex.foldLeft(events) {
      case (df, (step, i)) =>
        val cond =
          if (i == 0) col(typeCol) === step
          else {
            val ordered =
              col(typeCol) === step && col(tsCol) >= col(s"t$i")
            maxStepDelay.fold(ordered)(delay => ordered &&
              col(tsCol) <= col(s"t$i") + expr(s"INTERVAL $delay"))
          }
        df.withColumn(s"t${i + 1}",
          min(when(cond, col(tsCol))).over(w))
    }
    // t1..tn are constant within a key's partition; min() collapses to
    // one row per entity without a second exchange (the groupBy reuses
    // the window's hash partitioning).
    val aggs = steps.indices.map(i => min(col(s"t${i + 1}")).as(s"t${i + 1}"))
    staged.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Day-grain retention cohorts: cohort = the entity's first-seen
    * day; one output row per (cohort_day, day_offset) with the count
    * of entities active that many days after their cohort day
    * (offset 0 = the cohort size itself).
    *
    * Scale shape: one shuffle on the entity key (window min for the
    * cohort day), a map-side distinct to (entity, offset) grain, then
    * a cohort-grain aggregate — cardinality falls at every step, and
    * nothing is ever driver-side. */
  def retentionCohorts(events: DataFrame, keyCol: String,
                       tsCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
    events
      .withColumn("cohort_day",
        min(date_trunc("day", col(tsCol))).over(w))
      .select(col(keyCol), col("cohort_day"),
        datediff(date_trunc("day", col(tsCol)), col("cohort_day"))
          .as("day_offset"))
      .distinct()
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_active"))
  }
}
