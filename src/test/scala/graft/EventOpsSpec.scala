package graft

import org.apache.spark.sql.functions._
import graft.ext.EventOps

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin attaches the latest prior right row per key") {
    val left = Seq(("k", 10L, "L1"), ("k", 20L, "L2"), ("k", 5L, "L0"))
      .toDF("key", "ts", "lval")
    val right = Seq(("k", 8L, "A"), ("k", 15L, "B"))
      .toDF("key", "ts", "rval")
    val out = EventOps.asofJoin(left, right, "key", "ts", Seq("rval"))
      .select("ts", "rval").as[(Long, String)].collect().toMap
    // ts=5 has no prior right row → dropped (inner semantics)
    assert(out == Map(10L -> "A", 20L -> "B"))
  }

  test("asofJoin propagates NULL payload from the matched right row") {
    val left = Seq(("k", 10L, "L1"), ("k", 20L, "L2"))
      .toDF("key", "ts", "lval")
    val right = Seq(("k", 8L, Some("A")), ("k", 15L, None))
      .toDF("key", "ts", "rval")
    val out = EventOps.asofJoin(left, right, "key", "ts", Seq("rval"))
    val rows = out.select("ts", "rval").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // ts=20 matches the rts=15 row whose payload is legitimately NULL:
    // true ASOF emits NULL — it must NOT resurrect the older "A", and
    // the left row must NOT be dropped
    assert(rows == Map(10L -> Some("A"), 20L -> None))
  }

  test("asofJoinBucketed == asofJoin on randomized data, incl. " +
    "matches crossing bucket boundaries") {
    val rnd = new scala.util.Random(42)
    val left = (1 to 300).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, s"L$i"))
      .toDF("key", "ts", "lval")
    val right = (1 to 100).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, s"R$i"))
      .toDF("key", "ts", "rval").dropDuplicates("key", "ts")
    val plain = EventOps.asofJoin(left, right, "key", "ts", Seq("rval"))
      .groupBy("key", "ts", "lval").agg(max("rval").as("rval"))
    val bucketed = EventOps.asofJoinBucketed(left, right, "key", "ts",
        Seq("rval"), ts => floor(ts / 100))
      .groupBy("key", "ts", "lval").agg(max("rval").as("rval"))
    assert(plain.exceptAll(bucketed).isEmpty &&
      bucketed.exceptAll(plain).isEmpty)
    assert(plain.count() > 0)
  }

  test("asofJoinBucketed propagates NULL payload and drops seedless lefts") {
    val left = Seq(("k", 10L, "L1"), ("k", 20L, "L2"), ("k", 5L, "L0"))
      .toDF("key", "ts", "lval")
    val right = Seq(("k", 8L, Some("A")), ("k", 15L, None))
      .toDF("key", "ts", "rval")
    // bucket width 10 puts ts=20 in a bucket with no right rows: its
    // match must arrive via the carry-in seed (the NULL-payload row)
    val out = EventOps.asofJoinBucketed(left, right, "key", "ts",
      Seq("rval"), ts => floor(ts / 10))
    val rows = out.select("ts", "rval").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows == Map(10L -> Some("A"), 20L -> None))
  }

  test("asofJoinBucketed splits a hot key across bucket partitions") {
    // one key, 10k events: the plain form serializes this into ONE
    // window partition; the bucketed form's unit of serial work is a
    // (key, bucket) slice
    val left = (1 to 10000).map(i => ("hot", i.toLong, s"L$i"))
      .toDF("key", "ts", "lval")
    val right = (1 to 100).map(i => ("hot", i * 100L, s"R$i"))
      .toDF("key", "ts", "rval")
    val bucket = (ts: org.apache.spark.sql.Column) => floor(ts / 500)
    val out = EventOps.asofJoinBucketed(left, right, "key", "ts",
      Seq("rval"), bucket)
    // plan: the main window partitions on (key, __bucket), not key
    val win = out.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Window") && l.contains("__matched_ts"))
      .mkString("\n")
    assert(win.contains("__bucket"), s"window not bucket-partitioned:\n$win")
    // row distribution: max serial unit is one bucket's rows (~500+1
    // seed + right rows), never the hot key's 10k
    val maxUnit = left.select(col("key"), bucket(col("ts")).as("b"))
      .unionByName(right.select(col("key"), bucket(col("ts")).as("b")))
      .groupBy("key", "b").count().agg(max("count")).head().getLong(0)
    assert(maxUnit <= 600, s"serial unit $maxUnit")
    // and the join is still correct at the boundaries
    assert(out.count() == 10000 - 99) // ts 1..99 precede first right row
    val r = out.filter($"ts" === 500L).select("rval").head().getString(0)
    assert(r == "R5")
  }

  test("asofJoin tie (left.ts == right.ts) takes the right row") {
    val left = Seq(("k", 10L, "L")).toDF("key", "ts", "lval")
    val right = Seq(("k", 10L, "T"), ("k", 9L, "old"))
      .toDF("key", "ts", "rval")
    val out = EventOps.asofJoin(left, right, "key", "ts", Seq("rval"))
    assert(out.select("rval").as[String].head() == "T")
  }

  test("funnelStages enforces step ORDER: a click before the first " +
    "view never converts; a same-timestamp step does") {
    val e = Seq(
      // u1: clean view → click → purchase
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:05:00"),
      (1L, "purchase", "2024-01-01 10:10:00"),
      // u2: click BEFORE the only view → stops at view
      (2L, "click", "2024-01-01 09:00:00"),
      (2L, "view", "2024-01-01 09:30:00"),
      // u3: view then purchase but NO click → purchase can't count
      (3L, "view", "2024-01-01 08:00:00"),
      (3L, "purchase", "2024-01-01 08:30:00"),
      // u4: view and click at the SAME timestamp → tie converts
      (4L, "view", "2024-01-01 07:00:00"),
      (4L, "click", "2024-01-01 07:00:00"),
      // u5: never viewed → reaches nothing
      (5L, "purchase", "2024-01-01 06:00:00"))
      .toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = EventOps.funnelStages(e, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.isNullAt(1), r.isNullAt(2), r.isNullAt(3))).toMap
    assert(out(1L) == (false, false, false))
    assert(out(2L) == (false, true, true))
    assert(out(3L) == (false, true, true))
    assert(out(4L) == (false, false, true))
    assert(out(5L) == (true, true, true))
  }

  test("funnelStages maxStepDelay bounds each step to the " +
    "attribution window") {
    val e = Seq(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:03:00"),  // within 5 min → counts
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-01 10:10:00"))  // outside → dropped
      .toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = EventOps.funnelStages(e, "user_id", "event_type", "ts",
        Seq("view", "click"), maxStepDelay = Some("5 MINUTES"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(out == Map(1L -> false, 2L -> true))
    // and without the bound, both convert
    val unbounded = EventOps.funnelStages(e, "user_id", "event_type",
        "ts", Seq("view", "click"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(unbounded == Map(1L -> false, 2L -> false))
  }

  test("retentionCohorts counts an entity once per active day, " +
    "offset from its first-seen day") {
    val e = Seq(
      (1L, "2024-01-01 10:00:00"), // u1 cohort day 0
      (1L, "2024-01-01 23:00:00"), // same day — not double counted
      (1L, "2024-01-03 01:00:00"), // offset 2
      (2L, "2024-01-02 12:00:00")) // u2 cohort Jan 2, offset 0 only
      .toDF("user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = EventOps.retentionCohorts(e, "user_id", "ts")
      .collect().map(r => (r.getTimestamp(0).toString.take(10),
        r.getInt(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01", 0) -> 1L, ("2024-01-01", 2) -> 1L,
      ("2024-01-02", 0) -> 1L))
  }
}
