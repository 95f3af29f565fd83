package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.etl.MartBuild
import graft.io.Staging
import graft.schema.Schemas

/** Partition-scoped fact rebuild: rebuilding one day's partition must
  * leave every other day's files untouched — the dynamic-partition-
  * overwrite form of the mart truncate-load. */
class MartPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def reviewsDf(rows: Seq[(String, String, String, String, String, Double)]): DataFrame =
    rows.toDF("id_review", "ts", "place_id", "author_url",
        "review_text", "rating")
      .withColumn("timestamp_review",
        to_timestamp(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .drop("ts")

  private def freshStore(): (String, String) = {
    val root = Files.createTempDirectory("graft-mart-part")
    val store = root.resolve("store").toString
    // the non-reviews operational tables exist but stay empty — their
    // facts build to empty frames, which replace no partitions
    Schemas.operational.foreach { case (t, s) =>
      Staging.ensureTable(spark, store, t, s)
    }
    (store, root.resolve("mart").toString)
  }

  test("rebuilding one day's partition leaves other days untouched") {
    val (store, mart) = freshStore()
    Staging.overwriteParquet(reviewsDf(Seq(
      ("r1", "2024-03-01 10:00:00", "p1", "http://a", "day1", 5.0),
      ("r2", "2024-03-02 11:00:00", "p1", "http://b", "day2-v1", 4.0))),
      store, "reviews")
    val first = MartBuild.runFactsPartitioned(spark, store, mart)
    assert(first("fact_maps") == 2)

    // the store now only knows about day 2 (day-1 source is GONE): a
    // whole-table truncate would lose r1; the partition-scoped
    // rebuild must not
    Staging.overwriteParquet(reviewsDf(Seq(
      ("r2", "2024-03-02 11:00:00", "p1", "http://b", "day2-v2", 4.0),
      ("r3", "2024-03-02 12:00:00", "p2", "http://c", "day2-new", 3.0))),
      store, "reviews")
    val second = MartBuild.runFactsPartitioned(spark, store, mart)
    assert(second("fact_maps") == 3)

    val out = Staging.readTable(spark, mart, "fact_maps")
      .select("id_review", "review_longtext").as[(String, String)]
      .collect().toMap
    // day-1 partition survived; day-2 was fully replaced (v1 gone)
    assert(out == Map("r1" -> "day1", "r2" -> "day2-v2", "r3" -> "day2-new"))
  }

  test("dates filter scopes the rebuild to the named day only") {
    val (store, mart) = freshStore()
    Staging.overwriteParquet(reviewsDf(Seq(
      ("r1", "2024-03-01 10:00:00", "p1", "http://a", "day1-v1", 5.0),
      ("r2", "2024-03-02 11:00:00", "p1", "http://b", "day2-v1", 4.0))),
      store, "reviews")
    MartBuild.runFactsPartitioned(spark, store, mart)

    // both days' source rows change, but the rebuild is scoped to
    // day 2 — day 1 must keep v1
    Staging.overwriteParquet(reviewsDf(Seq(
      ("r1", "2024-03-01 10:00:00", "p1", "http://a", "day1-v2", 5.0),
      ("r2", "2024-03-02 11:00:00", "p1", "http://b", "day2-v2", 4.0))),
      store, "reviews")
    MartBuild.runFactsPartitioned(spark, store, mart,
      dates = Seq("2024-03-02"))

    val out = Staging.readTable(spark, mart, "fact_maps")
      .select("id_review", "review_longtext").as[(String, String)]
      .collect().toMap
    assert(out == Map("r1" -> "day1-v1", "r2" -> "day2-v2"))
  }

  test("partition pruning reaches the scan on the partitioned fact") {
    val (store, mart) = freshStore()
    Staging.overwriteParquet(reviewsDf(Seq(
      ("r1", "2024-03-01 10:00:00", "p1", "http://a", "day1", 5.0),
      ("r2", "2024-03-02 11:00:00", "p1", "http://b", "day2", 4.0))),
      store, "reviews")
    MartBuild.runFactsPartitioned(spark, store, mart)
    val q = Staging.readTable(spark, mart, "fact_maps")
      .filter(col("dt") === "2024-03-01")
    assert(q.count() == 1)
    // the day predicate is partition pruning, not a post-scan filter
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("dt"), s"expected partition filter in:\n$plan")
  }
}
