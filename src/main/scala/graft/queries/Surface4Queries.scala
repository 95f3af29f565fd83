package graft.queries

import graft.Tables

/** Round-8 surface battery: the last classic TPC-H planner shapes —
  * scan-only conditional aggregate (Q6), LIKE-pushdown profit
  * aggregation (Q9), HAVING vs an uncorrelated global scalar (Q11),
  * two-CASE-count join (Q12), and conditional-ratio with date pruning
  * (Q14). With these the battery covers 21/22 classic shapes (Q1 is
  * `q1_agg`). The testdata has no partsupp and lineitem carries no
  * commit/receipt dates or shipmode, so Q9/Q11/Q12 re-express their
  * relationships through the columns that exist (p_retailprice as the
  * supply-cost role, l_returnflag as the mode role, late = shipped
  * >30 days after order) — the planner SHAPES are the point, and
  * QueryPlanSpec pins them.
  *
  * Decimal discipline (SparkEntry scaladoc): per-row double products
  * are IEEE-identical on both engines; sums run in DECIMAL(25,6) so
  * results are summation-order-free, then cast back to double.
  */
object Surface4Queries {

  private def views(s: org.apache.spark.sql.SparkSession,
                    d: String): Unit = {
    Tables.part(s, d).createOrReplaceTempView("v_part")
    Tables.supplier(s, d).createOrReplaceTempView("v_supplier")
    Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
    Tables.orders(s, d).createOrReplaceTempView("v_orders")
    Tables.nation(s, d).createOrReplaceTempView("v_nation")
  }

  val defs: Map[String, QueryDef] = Map(

    // TPC-H Q6: the pure scan-side aggregate — every predicate must
    // reach the parquet scan (PushedFilters on shipdate, discount,
    // quantity), no join, no shuffle beyond the single global
    // aggregate. The whole query is a filter-pushdown + partial-agg
    // exercise; any Exchange beyond SinglePartition is a regression.
    "sql_q6" -> QueryDef(
      (s, d) => {
        views(s, d)
        QueryDef.graftSql(s, """SELECT dsum_exact(l_extendedprice * l_discount
          |) AS revenue
          |FROM v_lineitem
          |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          |  AND l_discount BETWEEN 0.05 AND 0.07
          |  AND l_quantity < 24""".stripMargin)
      },
      Some("""SELECT CAST(sum(CAST(l_extendedprice * l_discount
        |    AS DECIMAL(25,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin)),

    // TPC-H Q9 shape: profit by (nation, year) behind a p_name LIKE
    // '%…%' filter — the LIKE must be pushed into the part scan
    // (StringContains), the part join stays broadcast, and the profit
    // expression spans the lineitem-part join (p_retailprice plays
    // ps_supplycost's role; no partsupp in the testdata).
    "sql_q9" -> QueryDef(
      (s, d) => {
        views(s, d)
        QueryDef.graftSql(s, """SELECT nation, o_year,
          |  dsum_exact(amount) AS sum_profit
          |FROM (SELECT n_name AS nation,
          |        year(l_shipdate) AS o_year,
          |        l_extendedprice * (1 - l_discount)
          |            - p_retailprice * l_quantity * 0.01 AS amount
          |      FROM v_part, v_supplier, v_lineitem, v_nation
          |      WHERE s_suppkey = l_suppkey
          |        AND p_partkey = l_partkey
          |        AND s_nationkey = n_nationkey
          |        AND p_name LIKE '%bolt%') profit
          |GROUP BY nation, o_year
          |ORDER BY nation, o_year DESC""".stripMargin)
      },
      Some("""SELECT nation, o_year,
        |  CAST(sum(amount) AS DOUBLE) AS sum_profit
        |FROM (SELECT n_name AS nation,
        |        year(l_shipdate) AS o_year,
        |        CAST(l_extendedprice * (1 - l_discount)
        |            - p_retailprice * l_quantity * 0.01
        |          AS DECIMAL(25,6)) AS amount
        |      FROM part, supplier, lineitem, nation
        |      WHERE s_suppkey = l_suppkey
        |        AND p_partkey = l_partkey
        |        AND s_nationkey = n_nationkey
        |        AND p_name LIKE '%bolt%') profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin)),

    // TPC-H Q11 shape: per-part value within one nation's suppliers,
    // kept only when it exceeds a FRACTION OF THE GLOBAL TOTAL — the
    // HAVING-vs-uncorrelated-scalar shape: the subquery aggregates
    // the SAME join once (not per group), lands as a scalar
    // broadcast, and the outer HAVING filters against it. lineitem
    // value plays partsupp's (supplycost × availqty) role.
    "sql_q11" -> QueryDef(
      (s, d) => {
        views(s, d)
        QueryDef.graftSql(s, """SELECT l_partkey,
          |  dsum_exact(l_extendedprice * l_quantity
          |) AS value
          |FROM v_lineitem, v_supplier, v_nation
          |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          |  AND n_name = 'NATION_7'
          |GROUP BY l_partkey
          |HAVING sum(CAST(l_extendedprice * l_quantity
          |    AS DECIMAL(25,6))) > (
          |  SELECT sum(CAST(l_extendedprice * l_quantity
          |      AS DECIMAL(25,6))) * 0.001
          |  FROM v_lineitem, v_supplier, v_nation
          |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          |    AND n_name = 'NATION_7')
          |ORDER BY value DESC, l_partkey
          |LIMIT 100""".stripMargin)
      },
      Some("""SELECT l_partkey,
        |  CAST(sum(CAST(l_extendedprice * l_quantity
        |      AS DECIMAL(25,6))) AS DOUBLE) AS value
        |FROM lineitem, supplier, nation
        |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND n_name = 'NATION_7'
        |GROUP BY l_partkey
        |HAVING sum(CAST(l_extendedprice * l_quantity
        |    AS DECIMAL(25,6))) > (
        |  SELECT sum(CAST(l_extendedprice * l_quantity
        |      AS DECIMAL(25,6))) * 0.001
        |  FROM lineitem, supplier, nation
        |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_name = 'NATION_7')
        |ORDER BY value DESC, l_partkey
        |LIMIT 100""".stripMargin)),

    // TPC-H Q12 shape: orders⋈lineitem with BOTH aggregates as
    // CASE-counts over the order priority, grouped by a lineitem
    // attribute (l_returnflag plays l_shipmode's role) — the
    // two-conditional-sum join. "Late" = shipped more than 30 days
    // after the order date (no commit/receipt dates in the testdata);
    // that predicate spans the join, so it must evaluate post-join
    // while the returnflag filter still pushes into the scan.
    "sql_q12" -> QueryDef(
      (s, d) => {
        views(s, d)
        s.sql("""SELECT l_returnflag,
          |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
          |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
          |FROM v_orders JOIN v_lineitem ON o_orderkey = l_orderkey
          |WHERE l_returnflag IN ('R', 'A')
          |  AND l_shipdate > o_orderdate + INTERVAL 30 DAYS
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_returnflag IN ('R', 'A')
        |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)),

    // TPC-H Q14 shape: conditional-ratio aggregate (promo revenue /
    // total revenue) over one shipdate month — the date window must
    // prune the lineitem scan, the part join stays broadcast, and
    // both sums come out of ONE aggregate pass (no double scan).
    // Numerator and denominator are exact decimals; the one division
    // happens on the final scalars, rounded to absorb the ULP.
    "sql_q14" -> QueryDef(
      (s, d) => {
        views(s, d)
        QueryDef.graftSql(s, """SELECT round(100.0 * CAST(sum(CASE
          |      WHEN p_type = 'PROMO'
          |      THEN CAST(l_extendedprice * (1 - l_discount)
          |        AS DECIMAL(25,6))
          |      ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
          |    / dsum_exact(l_extendedprice * (1 - l_discount)
          |), 6) AS promo_revenue
          |FROM v_lineitem JOIN v_part ON l_partkey = p_partkey
          |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'"""
          .stripMargin)
      },
      Some("""SELECT round(100.0 * CAST(sum(CASE
        |      WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice * (1 - l_discount)
        |        AS DECIMAL(25,6))
        |      ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(25,6))) AS DOUBLE), 6) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'"""
        .stripMargin)))
}
