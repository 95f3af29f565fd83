package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.etl.OperationalLoad
import graft.io.JdbcStore

/** F3/F4/F5 against a real JDBC database (embedded Derby, which ships
  * in the Spark distribution) — the reference's operational store is
  * SQL (`transformation_db.py:109-116`), so the incremental-load
  * contract must hold over JDBC, not only parquet. */
class JdbcStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshUrl(): String = {
    val dir = Files.createTempDirectory("graft-derby").toFile
    dir.delete() // derby wants to create the directory itself
    JdbcStore.derbyUrl(dir.getAbsolutePath)
  }

  test("loadIfNewJdbc is idempotent: second identical run loads 0") {
    val url = freshUrl()
    val batch = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id_review", "review_text")
    assert(OperationalLoad.loadIfNewJdbc(spark, batch, url,
      "reviews", "id_review") == 3L)
    assert(OperationalLoad.loadIfNewJdbc(spark, batch, url,
      "reviews", "id_review") == 0L)
    assert(JdbcStore.read(spark, url, "reviews").count() == 3L)
  }

  test("loadIfNewJdbc appends only the genuinely new keys") {
    val url = freshUrl()
    val first = Seq((1L, "a"), (2L, "b")).toDF("id_review", "review_text")
    val second = Seq((2L, "b2"), (3L, "c")).toDF("id_review", "review_text")
    assert(OperationalLoad.loadIfNewJdbc(spark, first, url,
      "reviews", "id_review") == 2L)
    assert(OperationalLoad.loadIfNewJdbc(spark, second, url,
      "reviews", "id_review") == 1L)
    val rows = JdbcStore.read(spark, url, "reviews")
      .as[(Long, String)].collect().toMap
    // key 2 kept its FIRST-loaded value — append-only, no upsert,
    // matching the reference's if_exists='append' semantics
    assert(rows == Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("keyScan ships only the key column, server-side pruned") {
    val url = freshUrl()
    val batch = Seq((1L, "a")).toDF("id_review", "review_text")
    OperationalLoad.loadIfNewJdbc(spark, batch, url, "reviews", "id_review")
    val scan = JdbcStore.keyScan(spark, url, "reviews", "id_review")
    assert(scan.columns.toSeq == Seq("id_review"))
    // the pruned projection reaches the JDBC relation (ReadSchema has
    // exactly one field), not a post-scan Project over a full read
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("id_review") && !plan.contains("review_text"))
  }

  test("overwrite is a truncate-load: full rebuild replaces all rows") {
    val url = freshUrl()
    JdbcStore.overwrite(Seq((1L, "a"), (2L, "b"))
      .toDF("id_review", "review_text"), url, "mart_t")
    JdbcStore.overwrite(Seq((3L, "c")).toDF("id_review", "review_text"),
      url, "mart_t")
    val rows = JdbcStore.read(spark, url, "mart_t")
      .as[(Long, String)].collect().toMap
    assert(rows == Map(3L -> "c"))
  }

  test("partitioned JDBC read range-splits into parallel tasks") {
    val url = freshUrl()
    val batch = (1L to 100L).map(i => (i, s"t$i")).toDF("id_review", "review_text")
    OperationalLoad.loadIfNewJdbc(spark, batch, url, "reviews", "id_review")
    val part = JdbcStore.read(spark, url, "reviews",
      partitionColumn = Some("id_review"),
      lowerBound = 1L, upperBound = 101L, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100L)
  }
}
