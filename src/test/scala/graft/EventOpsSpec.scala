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

  test("asofJoin tie (left.ts == right.ts) takes the right row") {
    val left = Seq(("k", 10L, "L")).toDF("key", "ts", "lval")
    val right = Seq(("k", 10L, "T"), ("k", 9L, "old"))
      .toDF("key", "ts", "rval")
    val out = EventOps.asofJoin(left, right, "key", "ts", Seq("rval"))
    assert(out.select("rval").as[String].head() == "T")
  }
}
