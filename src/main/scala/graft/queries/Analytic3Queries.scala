package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import QueryDef.{dsum, dsumSql}

/** Third analytic battery: unpivot (melt), the analytic-window
  * function set beyond ranking (ntile / percent_rank / cume_dist /
  * first_value / last_value), ordered string aggregation, and the
  * statistics aggregate family (corr / covariance / stddev / variance
  * / median).
  *
  * Bit-exactness notes: percent_rank and cume_dist are exact integer
  * ratios (identical doubles in both engines); corr is bounded by 1
  * and rounded; stddev/var/covar run on `l_quantity`/`l_discount`
  * (small-magnitude columns) so the cross-engine one-pass-merge
  * difference sits far below the rounding granularity. Spark's
  * `skewness`/`kurtosis` use population formulas while DuckDB
  * bias-corrects, so that pair is deliberately excluded from the
  * oracle surface.
  */
object Analytic3Queries {

  val defs: Map[String, QueryDef] = Map(

    // Unpivot (melt): wide per-flag measure columns → long
    // (flag, measure, value) rows. Exact-decimal sums so the melted
    // doubles are bit-identical.
    "unpivot_agg" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_discount")).as("sum_disc"),
          dsum(col("l_tax")).as("sum_tax"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_disc"), col("sum_tax")),
          "measure", "value")
        .orderBy("l_returnflag", "measure"),
      Some(s"""WITH s AS (SELECT l_returnflag,
        |    ${dsumSql("l_quantity")} AS sum_qty,
        |    ${dsumSql("l_discount")} AS sum_disc,
        |    ${dsumSql("l_tax")} AS sum_tax
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, measure, value
        |FROM (UNPIVOT s ON sum_qty, sum_disc, sum_tax
        |      INTO NAME measure VALUE value)
        |ORDER BY l_returnflag, measure""".stripMargin)),

    // Analytic window set beyond ranking: quartile bucket, exact
    // rank ratios, per-partition first/last under an explicit frame.
    "window_analytics" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
        val wf = w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 200)
          .select(col("l_returnflag"), col("l_orderkey"),
            col("l_linenumber"),
            ntile(4).over(w).as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"),
            first(col("l_orderkey")).over(wf).as("first_key"),
            last(col("l_orderkey")).over(wf).as("last_key"))
          .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_returnflag, l_orderkey, l_linenumber,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  first_value(l_orderkey) OVER wf AS first_key,
        |  last_value(l_orderkey) OVER wf AS last_key
        |FROM lineitem WHERE l_orderkey < 200
        |WINDOW w AS (PARTITION BY l_returnflag
        |    ORDER BY l_orderkey, l_linenumber),
        |  wf AS (PARTITION BY l_returnflag
        |    ORDER BY l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin)),

    // Ordered string aggregation (listagg): deterministic via
    // sorted distinct values.
    "string_agg" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(concat_ws(",",
          sort_array(collect_set(col("l_linestatus")))).as("statuses"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        |  string_agg(DISTINCT l_linestatus, ','
        |    ORDER BY l_linestatus) AS statuses
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)),

    // Approximate percentile sketch under the same discipline as
    // approx_distinct: the query emits the EXACT percentile plus an
    // in-query invariant that the sketch estimate (accuracy 10000)
    // lands within 1 of it on this 1..50-valued column — the oracle
    // asserts the exact value and TRUE, so sketch drift fails the
    // hash gate.
    "approx_percentile_check" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
            .as("__approx"),
          expr("percentile(l_quantity, 0.5)").as("exact_median"))
        .withColumn("sketch_within_1",
          abs(col("__approx") - col("exact_median")) <= lit(1.0))
        .drop("__approx")
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS exact_median,
        |  TRUE AS sketch_within_1
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)),

    // RANGE window frame: moving sum over a VALUE range (all rows
    // whose order key is within 5 of the current row's), as opposed
    // to the ROWS frames elsewhere.
    "range_frame" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_orderkey"))
          .rangeBetween(-5L, 0L)
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 200)
          .select(col("l_returnflag"), col("l_orderkey"),
            col("l_linenumber"),
            sum(col("l_quantity").cast("decimal(25,6)")).over(w)
              .cast("double").as("moving_qty"))
          .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_returnflag, l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) OVER (
        |    PARTITION BY l_returnflag ORDER BY l_orderkey
        |    RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS moving_qty
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin)),

    // Statistics aggregate family over small-magnitude columns.
    "stats_agg" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6)
            .as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6)
            .as("covar_qty_disc"),
          round(stddev_samp(col("l_quantity")), 6).as("std_qty"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          median(col("l_quantity")).as("median_qty"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc,
        |  round(stddev_samp(l_quantity), 6) AS std_qty,
        |  round(var_samp(l_discount), 6) AS var_disc,
        |  median(l_quantity) AS median_qty
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin))
  )
}
