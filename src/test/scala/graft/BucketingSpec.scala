package graft

import org.apache.spark.sql.functions._
import graft.io.Staging

/** Co-located joins via bucketing: both sides bucketed+sorted on the
  * join key → the sort-merge join consumes the buckets directly, with
  * NO Exchange on either side. This is the scale story for repeated
  * fact-to-fact joins (SCALING.md). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-bucketed equi-join plans without a shuffle") {
    val dir = "/root/testdata/sf0.001"
    Staging.writeBucketed(
      Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
      "b_orders", 8, Seq("o_orderkey"))
    Staging.writeBucketed(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", 8, Seq("o_orderkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      // and it computes the right thing
      assert(joined.count() ==
        Tables.lineitem(spark, dir).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("bucketed aggregation on the bucket key avoids the shuffle") {
    val dir = "/root/testdata/sf0.001"
    Staging.writeBucketed(
      Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
      "b_orders_agg", 8, Seq("o_orderkey"))
    try {
      val agg = spark.table("b_orders_agg")
        .groupBy("o_orderkey").agg(sum("o_totalprice"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed aggregation, got:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders_agg")
    }
  }
}
