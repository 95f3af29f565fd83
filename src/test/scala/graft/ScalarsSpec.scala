package graft

import org.apache.spark.sql.functions._
import graft.ops.Scalars._

class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).head().get(0)

  test("E1 epoch seconds → UTC timestamp") {
    assert(one(toIso(epochToTimestamp(lit(0L))))
      == "1970-01-01T00:00:00Z")
    assert(one(toIso(epochToTimestamp(lit(1650000000L))))
      == "2022-04-15T05:20:00Z")
  }

  test("E2 synthetic key concat") {
    assert(one(syntheticKey(lit("p1"), lit("u"), lit(5)))
      == "p1_u_5")
  }

  test("E3/E4 array join") {
    val df = Seq(Seq("Mon: 9", "Tue: 9")).toDF("h")
    assert(df.select(arrayJoined($"h", " | ")).head().getString(0)
      == "Mon: 9 | Tue: 9")
  }

  test("E5 coalesce falls through empty strings like Python or") {
    assert(one(coalesceNonEmpty(lit(""), lit("  "), lit("x"))) == "x")
    assert(one(coalesceNonEmpty(lit(null).cast("string"), lit("y"))) == "y")
    assert(one(coalesceNonEmpty(lit("a"), lit("b"))) == "a")
  }

  test("E6 strict + lenient timestamp parse") {
    assert(one(toIso(parseTimestamp(lit("2024-03-01 10:30:00"))))
      == "2024-03-01T10:30:00Z")
    assert(one(parseTimestampLenient(lit("garbage"))) == null)
  }

  test("E7-E11 time derivations") {
    val ts = parseTimestamp(lit("2024-03-01 10:30:05"))
    assert(one(timeOfDay(ts)) == "10:30:05")
    assert(one(dayName(ts)) == "Friday")
    assert(one(dateOf(ts)).toString == "2024-03-01")
    assert(one(yearMonth(ts)) == "2024-03")
    assert(one(yearOf(ts)) == 2024L)
  }

  test("E13 normalized key") {
    assert(one(normalized(lit("  MaKan  "))) == "makan")
  }

  test("E16 JSON field access on events-like props") {
    assert(one(jsonGet(lit("""{"a":{"b":"x"},"n":3}"""), "$.a.b")) == "x")
    assert(one(jsonGet(lit("""{"n":3}"""), "$.n")) == "3")
    assert(one(jsonGet(lit("""{"n":3}"""), "$.missing")) == null)
  }

  test("E17 ternary null-guard") {
    assert(one(nullUnless(lit(true), lit(1))) == 1)
    assert(one(nullUnless(lit(false), lit(1))) == null)
  }
}
