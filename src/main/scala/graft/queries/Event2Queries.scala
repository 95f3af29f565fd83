package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.EventOps

/** Product-analytics battery over the events table: strict ordered
  * funnels and day-grain retention cohorts — the two aggregate shapes
  * a behavioral warehouse is queried with daily. Both are single
  * entity-key-shuffle plans (see [[graft.ext.EventOps.funnelStages]] /
  * [[graft.ext.EventOps.retentionCohorts]] scale notes) and both are
  * fully DuckDB-oracle-checked.
  */
object Event2Queries {

  val defs: Map[String, QueryDef] = Map(

    // Strict ordered funnel view → click → purchase: a user counts at
    // step k only if that event type occurs at-or-after their step
    // k-1 reach time. One output row of stage reach counts.
    "funnel_conversion" -> QueryDef(
      (s, d) => EventOps.funnelStages(Tables.events(s, d),
          "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"))
        .agg(count(col("t1")).as("n_view"),
          count(col("t2")).as("n_click"),
          count(col("t3")).as("n_purchase")),
      Some("""WITH s1 AS (
        |  SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t1
        |  FROM events),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t1
        |                     THEN ts END)
        |      OVER (PARTITION BY user_id) AS t2
        |  FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t2
        |                     THEN ts END)
        |      OVER (PARTITION BY user_id) AS t3
        |  FROM s2),
        |per_user AS (
        |  SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
        |  FROM s3 GROUP BY user_id)
        |SELECT count(t1) AS n_view, count(t2) AS n_click,
        |  count(t3) AS n_purchase
        |FROM per_user""".stripMargin)),

    // Day-grain retention: cohort = first-seen day; one row per
    // (cohort_day, day_offset) with distinct active users.
    "retention_cohorts" -> QueryDef(
      (s, d) => EventOps.retentionCohorts(Tables.events(s, d),
          "user_id", "ts")
        // DATE → string for the cross-engine hash (SURVEY §7.4)
        .withColumn("cohort_day",
          date_format(col("cohort_day"), "yyyy-MM-dd"))
        .select("cohort_day", "day_offset", "n_active")
        .orderBy("cohort_day", "day_offset"),
      Some("""WITH firsts AS (
        |  SELECT user_id, ts,
        |    min(date_trunc('day', ts)) OVER (PARTITION BY user_id)
        |      AS cohort_day
        |  FROM events),
        |activity AS (
        |  SELECT DISTINCT user_id,
        |    strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
        |    CAST(date_diff('day', CAST(cohort_day AS DATE),
        |      CAST(date_trunc('day', ts) AS DATE)) AS INT) AS day_offset
        |  FROM firsts)
        |SELECT cohort_day, day_offset, count(*) AS n_active
        |FROM activity GROUP BY 1, 2
        |ORDER BY cohort_day, day_offset""".stripMargin)),

    // Key-skew diagnostic: top-10 hottest keys with their share of
    // all rows — the pre-flight a 100 TB join/agg runs to decide
    // whether it needs salting or AQE skew handling (the same signal
    // SkewSpec injects synthetically). Partial-agg + TakeOrdered +
    // one broadcast scalar; never a driver-side histogram.
    "skew_histogram" -> QueryDef(
      (s, d) => {
        val e = Tables.events(s, d)
        val counts = e.groupBy("user_id").agg(count(lit(1)).as("n"))
        val total = e.agg(count(lit(1)).as("__t"))
        counts.crossJoin(broadcast(total))
          .withColumn("share",
            round(col("n").cast("double") / col("__t"), 6))
          .select("user_id", "n", "share")
          .orderBy(col("n").desc, col("user_id"))
          .limit(10)
      },
      Some("""SELECT user_id, count(*) AS n,
        |  round(CAST(count(*) AS DOUBLE) /
        |    (SELECT count(*) FROM events), 6) AS share
        |FROM events GROUP BY user_id
        |ORDER BY n DESC, user_id LIMIT 10""".stripMargin)),

    // Time-BOUND conversion: a click counts only within 5 minutes of
    // the user's first view — funnelStages' attribution-window form
    // (same single entity-key-shuffle chained-window plan as
    // funnel_conversion; maxStepDelay is the only delta).
    "timed_conversion" -> QueryDef(
      (s, d) => EventOps.funnelStages(Tables.events(s, d),
          "user_id", "event_type", "ts", Seq("view", "click"),
          maxStepDelay = Some("5 MINUTES"))
        .agg(count(col("t1")).as("n_viewers"),
          count(col("t2")).as("n_converted_5min")),
      Some("""WITH s1 AS (
        |  SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS v
        |  FROM events),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts >= v
        |                     AND ts <= v + INTERVAL 5 MINUTE
        |                     THEN ts END)
        |      OVER (PARTITION BY user_id) AS c
        |  FROM s1),
        |per_user AS (
        |  SELECT user_id, min(v) AS v, min(c) AS c
        |  FROM s2 GROUP BY user_id)
        |SELECT count(v) AS n_viewers, count(c) AS n_converted_5min
        |FROM per_user""".stripMargin)),

    // Trailing-window anomaly detection: each hourly (type, count) is
    // z-scored against the 24 PRECEDING OBSERVED hourly buckets for
    // the same type (never the current value — no self-masking).
    // ROWS-frame semantics deliberately: hours with zero events for a
    // type are absent from the hourly grid, so on a sparse type the
    // 24-row baseline reaches further back than 24 wall-clock hours;
    // the production alternative is gap-filling the grid (sequence()
    // explode) and a RANGE frame — at this corpus's density every
    // hour is populated, so the two coincide. Stream-shaped analytics
    // in batch form: one type-key shuffle, sequential 24-row frames;
    // z rounded to 6 dp (the windowed stddev is the
    // rounded-transcendental class) and the anomaly flag derived
    // from the ROUNDED z on both sides so the boolean can't straddle
    // an ULP.
    "events_anomaly" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val hourly = Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("hour"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("hour")
          .rowsBetween(-24, -1)
        hourly
          .withColumn("cnt_w", count(lit(1)).over(w))
          .withColumn("mean_w",
            sum("n").over(w).cast("double") / col("cnt_w"))
          .withColumn("sd_w", stddev_samp(col("n").cast("double")).over(w))
          .filter(col("cnt_w") === 24 && col("sd_w") > 0)
          .withColumn("z",
            round((col("n") - col("mean_w")) / col("sd_w"), 6))
          .withColumn("is_anomaly", abs(col("z")) > 2)
          .select(date_format(col("hour"), "yyyy-MM-dd HH:mm").as("hour"),
            col("event_type"), col("n"), col("z"), col("is_anomaly"))
          .orderBy("hour", "event_type")
      },
      Some("""WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT *, count(*) OVER win AS cnt_w,
        |    CAST(sum(n) OVER win AS DOUBLE) / count(*) OVER win
        |      AS mean_w,
        |    stddev_samp(CAST(n AS DOUBLE)) OVER win AS sd_w
        |  FROM hourly
        |  WINDOW win AS (PARTITION BY event_type ORDER BY hour
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT strftime(hour, '%Y-%m-%d %H:%M') AS hour, event_type, n,
        |  round((n - mean_w) / sd_w, 6) AS z,
        |  abs(round((n - mean_w) / sd_w, 6)) > 2 AS is_anomaly
        |FROM w WHERE cnt_w = 24 AND sd_w > 0
        |ORDER BY hour, event_type""".stripMargin))
  )
}
