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

  /** Streaming-style first-seen dedup (R12 batch shadow): keep the
    * earliest event per key under a deterministic total order. */
  def dedupFirstSeen(events: DataFrame, keys: Seq[String],
                     order: Seq[Column]): DataFrame =
    graft.ops.Relational.dedupeByKeyOrdered(events, keys, order)
}
