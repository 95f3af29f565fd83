package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import QueryDef.{dsum, dsumSql}

/** Second analytic battery: pivot, explode+agg, correlated subquery,
  * exact percentiles, salted (skew-resistant) aggregation, array ops.
  */
object Analytic2Queries {

  val defs: Map[String, QueryDef] = Map(

    // Pivot event counts into one column per event type.
    "pivot_agg" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("user_id"),
      Some("""SELECT user_id,
        |  coalesce(click, 0) AS click, coalesce(error, 0) AS error,
        |  coalesce(purchase, 0) AS purchase, coalesce(signup, 0) AS signup,
        |  coalesce(view, 0) AS view
        |FROM (PIVOT events ON event_type USING count(*) GROUP BY user_id)
        |ORDER BY user_id""".stripMargin)),

    // Explode (lateral) tokens → corpus-wide top-20 token counts.
    "top_tokens" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(explode(graft.ext.TextOps.tokens(col("text")))
          .as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20),
      Some("""SELECT token, count(*) AS n
        |FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)),
        |        '\s+')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin)),

    // Correlated scalar subquery: orders above their customer's mean.
    "scalar_subquery" -> QueryDef(
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_sq")
        s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
          |FROM orders_sq o
          |WHERE o_totalprice > 2 * (
          |  SELECT CAST(sum(CAST(i.o_totalprice AS DECIMAL(25,6)))
          |    AS DOUBLE) / count(*)
          |  FROM orders_sq i WHERE i.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 2 * (
        |  SELECT CAST(sum(CAST(i.o_totalprice AS DECIMAL(25,6)))
        |    AS DOUBLE) / count(*)
        |  FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)),

    // Exact interpolated percentiles (Spark percentile == DuckDB
    // quantile_cont), rounded to absorb interpolation-arithmetic ULP.
    "percentile_agg" -> QueryDef(
      // NOT fused into an array-percentile: A/B showed the array form
      // SLOWER (1.4 -> 2.0 s) despite sharing one value buffer for
      // the two l_quantity cuts — the scalar path wins here
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
          round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90_price"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.25), 6) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)),

    // Skew-resistant two-phase aggregation: salt the key, partial-agg
    // per (key, salt), then final-agg per key. Same result as a plain
    // groupBy — which is the oracle — but the first shuffle spreads a
    // hot key over 16 reducers (the pattern AQE skew-join mirrors for
    // joins; for aggregation Spark's partial aggregation already does
    // map-side combine, so this is the explicit form for pathological
    // key distributions).
    "salted_agg" -> QueryDef(
      (s, d) => {
        val salted = Tables.events(s, d)
          .withColumn("__salt", pmod(col("event_id"), lit(16)))
          .groupBy("event_type", "__salt")
          .agg(count(lit(1)).as("__n"),
            sum(col("value").cast("decimal(25,6)")).as("__v"))
        salted.groupBy("event_type")
          .agg(sum(col("__n")).as("n"),
            sum(col("__v")).cast("double").as("total_value"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type, count(*) AS n,
        |  ${dsumSql("value")} AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type"""
        .stripMargin)),

    // E3/E4 array ops: tokenize, slice, re-join with a delimiter.
    "array_ops" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          graft.ops.Scalars.arrayJoined(
            slice(graft.ext.TextOps.tokens(col("text")), 1, 5), " | ")
            .as("first_tokens"),
          size(graft.ext.TextOps.tokens(col("text"))).as("n_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
        |  array_to_string(regexp_split_to_array(lower(trim(text)),
        |    '\s+')[1:5], ' | ') AS first_tokens,
        |  CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
        |    AS INT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
