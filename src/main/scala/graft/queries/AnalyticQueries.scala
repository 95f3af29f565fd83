package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import QueryDef.{dsum, dsumSql}

/** Aggregation / windowing / ordering surface (SURVEY.md §2.4 —
  * engine capabilities beyond the reference's own operator set, graded
  * as part of the complete engine).
  *
  * All double aggregates use the exact-decimal discipline (QueryDef
  * scaladoc). Rollup/cube grouping-null rows order with explicit
  * NULLS FIRST on both sides (Spark ASC default is nulls-first,
  * DuckDB's is nulls-last).
  */
object AnalyticQueries {

  val defs: Map[String, QueryDef] = Map(

    // Flagship: TPC-H Q1-shaped pricing summary.
    "q1_agg" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
        |  ${dsumSql("l_quantity")} AS sum_qty,
        |  ${dsumSql("l_extendedprice")} AS sum_base_price,
        |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Full stats battery: sum/min/max/avg/count/count-distinct.
    "groupby_stats" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag,
        |  ${dsumSql("l_quantity")} AS sum_qty,
        |  min(l_quantity) AS min_qty,
        |  max(l_quantity) AS max_qty,
        |  ${dsumSql("l_extendedprice")} / count(*) AS avg_price,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)),

    // ROLLUP hierarchy totals.
    "rollup_agg" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  ${dsumSql("l_quantity")} AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
        .stripMargin)),

    // CUBE over two dimensions.
    "cube_agg" -> QueryDef(
      (s, d) => Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority")),
      Some(s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  ${dsumSql("o_totalprice")} AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""
        .stripMargin)),

    // GROUPING SETS (via SQL on a temp view — same Catalyst plan).
    "grouping_sets" -> QueryDef(
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_gs")
        s.sql(s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""
          .stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""
        .stripMargin)),

    // Ranking + analytic window battery over a deterministic frame.
    "window_rank" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d)
          .withColumn("rnk", rank().over(w))
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("running_total",
            graft.functions.DecimalDoubleSum.column(col("o_totalprice"))
              .over(wsum))
          .filter(col("rnk") <= 50)
          .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk",
            "prev_price", "running_total")
          .orderBy(col("o_orderpriority"), col("rnk"))
      },
      Some("""SELECT o_orderpriority, o_orderkey, o_totalprice, rnk,
        |  prev_price, running_total
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  rank() OVER w AS rnk,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) OVER
        |    (PARTITION BY o_orderpriority
        |     ORDER BY o_totalprice DESC, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE rnk <= 50
        |ORDER BY o_orderpriority, rnk""".stripMargin)),

    // Global top-k (Catalyst plans TakeOrderedAndProject — no full sort).
    "orderby_limit" -> QueryDef(
      (s, d) => Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // HLL++ approximate distinct. The sketch estimate itself is
    // engine-specific, so the query emits the EXACT distinct count
    // plus an in-query invariant: the HLL++ estimate (rsd = 0.01)
    // must land within 5% of it. The oracle asserts the exact count
    // and TRUE — a drifting sketch flips the boolean and fails the
    // hash gate, making this a real oracle-checked row, not rows-only.
    "approx_distinct" -> QueryDef(
      // dedupe-then-aggregate, never countDistinct + HLL in ONE agg:
      // combining a distinct and a non-distinct aggregate makes
      // Spark's two-phase distinct rewrite carry the HLL buffer at
      // the (flag, partkey) grain — an rsd-0.01 sketch is ~1.6k
      // longs, so that plan built and SHUFFLED ~13 KB of registers
      // per distinct pair (audited: "... 1616 more fields", 7 s at
      // sf0.1 for a 3-row answer). Over the deduped pairs both
      // answers fold at flag grain: count(*) IS the exact distinct,
      // and HLL over a distinct set estimates the same cardinality
      // by definition. One scan, one compact pair exchange, three
      // sketch buffers total.
      (s, d) => Tables.lineitem(s, d)
        .select("l_returnflag", "l_partkey").distinct()
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("exact_parts"),
          approx_count_distinct(col("l_partkey"), 0.01).as("__approx"))
        .withColumn("hll_within_5pct",
          abs(col("__approx") - col("exact_parts")) <=
            col("exact_parts") * lit(0.05))
        .drop("__approx")
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS hll_within_5pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)),

    // Count-min-sketch heavy hitters, same verified-sketch discipline
    // as approx_distinct: exact top-10 users by event count, each
    // checked against the CMS point estimate — lower_ok is the
    // never-underestimates guarantee, upper_ok the ±eps·N bound
    // (graft.ext.SketchOps scaladoc). The oracle asserts the exact
    // counts and TRUE/TRUE, so a drifting sketch fails the hash gate.
    "heavy_hitters_cms" -> QueryDef(
      (s, d) => graft.ext.SketchOps.heavyHittersVerified(
          Tables.events(s, d), "user_id", topK = 10)
        .orderBy(col("n_exact").desc, col("user_id")),
      Some("""SELECT user_id, count(*) AS n_exact,
        |  TRUE AS lower_ok, TRUE AS upper_ok
        |FROM events GROUP BY user_id
        |ORDER BY n_exact DESC, user_id LIMIT 10""".stripMargin))
  )
}
