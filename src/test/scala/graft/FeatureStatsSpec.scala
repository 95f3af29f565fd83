package graft

import org.apache.spark.sql.functions._

/** The feature_corr closed form (exact-decimal raw moments + one
  * shared IEEE expression) must agree with Spark's built-in
  * streaming-moment corr/covar_pop to well past the query's 6 dp
  * rounding — the builtins are the semantic ground truth; the closed
  * form exists for cross-engine bit-portability, not to change the
  * statistic. */
class FeatureStatsSpec extends SparkSpec {

  test("closed-form corr/covar match Spark's builtins to 1e-6") {
    val d = "/root/testdata/sf0.001"
    val closed = SparkEntry.queries("feature_corr")(spark, d)
      .select("l_returnflag", "corr_qty_price", "covar_pop_qty_price")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val builtin = Tables.lineitem(spark, d)
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_pop(col("l_quantity"), col("l_extendedprice")).as("v"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(closed.keySet == builtin.keySet)
    closed.foreach { case (k, (c, v)) =>
      assert(math.abs(c - builtin(k)._1) < 1e-6, s"corr($k)")
      assert(math.abs(v - builtin(k)._2) < 1e-6, s"covar($k)")
    }
  }
}
