package graft.queries

import graft.Tables

/** Round-7 surface battery: the remaining classic TPC-H shapes —
  * correlated scalar MIN (Q2), bidirectional multi-nation join with
  * order-safe decimal revenue (Q7), CASE-conditional market share
  * (Q8), LEFT-JOIN count distribution (Q13), and NOT IN +
  * count-distinct (Q16). The testdata has no partsupp table and no
  * comment columns, so Q2/Q16 re-express their supply/complaint
  * relationships through lineitem and s_acctbal — the SHAPES (the
  * planner work each query stresses) are the point, and QueryPlanSpec
  * pins the decorrelation / reorder / distinct-agg plans.
  */
object Surface3Queries {

  private def views(s: org.apache.spark.sql.SparkSession,
                    d: String): Unit = {
    Tables.part(s, d).createOrReplaceTempView("v_part")
    Tables.supplier(s, d).createOrReplaceTempView("v_supplier")
    Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
    Tables.orders(s, d).createOrReplaceTempView("v_orders")
    Tables.customer(s, d).createOrReplaceTempView("v_customer")
    Tables.nation(s, d).createOrReplaceTempView("v_nation")
    Tables.region(s, d).createOrReplaceTempView("v_region")
  }

  val defs: Map[String, QueryDef] = Map(

    // TPC-H Q2 shape: correlated SCALAR subquery (min supply price)
    // over a multi-way join, the subquery itself a 4-way join re-
    // scanning the fact — Catalyst must decorrelate to an aggregate-
    // then-join (one min-per-part build side), not a per-row probe.
    // lineitem plays partsupp's supply role (no partsupp in the
    // testdata); min(l_extendedprice) is an order-insensitive double
    // aggregate, so no decimal discipline is needed. DISTINCT guards
    // the LIMIT boundary against duplicate (part, supplier, price)
    // rows from multiple identical-price lineitems.
    "sql_q2" -> QueryDef(
      (s, d) => {
        views(s, d)
        s.sql("""SELECT DISTINCT p_partkey, p_brand, s_name, n_name,
          |  l_extendedprice AS price
          |FROM v_part, v_lineitem, v_supplier, v_nation, v_region
          |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          |  AND r_name = 'EUROPE' AND p_size = 15
          |  AND l_extendedprice = (
          |    SELECT min(l2.l_extendedprice)
          |    FROM v_lineitem l2, v_supplier s2, v_nation n2, v_region r2
          |    WHERE l2.l_partkey = p_partkey
          |      AND s2.s_suppkey = l2.l_suppkey
          |      AND s2.s_nationkey = n2.n_nationkey
          |      AND n2.n_regionkey = r2.r_regionkey
          |      AND r2.r_name = 'EUROPE')
          |ORDER BY price DESC, p_partkey, s_name
          |LIMIT 100""".stripMargin)
      },
      Some("""SELECT DISTINCT p_partkey, p_brand, s_name, n_name,
        |  l_extendedprice AS price
        |FROM part, lineitem, supplier, nation, region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE' AND p_size = 15
        |  AND l_extendedprice = (
        |    SELECT min(l2.l_extendedprice)
        |    FROM lineitem l2, supplier s2, nation n2, region r2
        |    WHERE l2.l_partkey = p_partkey
        |      AND s2.s_suppkey = l2.l_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey
        |      AND n2.n_regionkey = r2.r_regionkey
        |      AND r2.r_name = 'EUROPE')
        |ORDER BY price DESC, p_partkey, s_name
        |LIMIT 100""".stripMargin)),

    // TPC-H Q7 shape: 6-way join with nation twice (supplier side and
    // customer side) under a bidirectional nation-pair predicate —
    // the join-REORDER stress: both nation joins are broadcast-sized,
    // the lineitem-orders-customer spine must stay the shuffle spine.
    // Revenue follows the decimal-sum discipline: the per-row double
    // product is IEEE-identical on both engines, the sum runs in
    // exact DECIMAL(25,6), so the result is summation-order-free.
    "sql_q7" -> QueryDef(
      (s, d) => {
        views(s, d)
        QueryDef.graftSql(s, """SELECT supp_nation, cust_nation, l_year,
          |  dsum_exact(volume) AS revenue
          |FROM (SELECT n1.n_name AS supp_nation,
          |        n2.n_name AS cust_nation,
          |        year(l_shipdate) AS l_year,
          |        l_extendedprice * (1 - l_discount) AS volume
          |      FROM v_supplier, v_lineitem, v_orders, v_customer,
          |        v_nation n1, v_nation n2
          |      WHERE s_suppkey = l_suppkey
          |        AND o_orderkey = l_orderkey
          |        AND c_custkey = o_custkey
          |        AND s_nationkey = n1.n_nationkey
          |        AND c_nationkey = n2.n_nationkey
          |        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          |          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          |        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
          |          AND TIMESTAMP '1996-12-31 23:59:59') shipping
          |GROUP BY supp_nation, cust_nation, l_year
          |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)
      },
      Some("""SELECT supp_nation, cust_nation, l_year,
        |  CAST(sum(volume) AS DOUBLE) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation,
        |        n2.n_name AS cust_nation,
        |        year(l_shipdate) AS l_year,
        |        CAST(l_extendedprice * (1 - l_discount)
        |          AS DECIMAL(25,6)) AS volume
        |      FROM supplier, lineitem, orders, customer,
        |        nation n1, nation n2
        |      WHERE s_suppkey = l_suppkey
        |        AND o_orderkey = l_orderkey
        |        AND c_custkey = o_custkey
        |        AND s_nationkey = n1.n_nationkey
        |        AND c_nationkey = n2.n_nationkey
        |        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
        |          AND TIMESTAMP '1996-12-31 23:59:59') shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    // TPC-H Q8 shape: national market share — CASE-conditional
    // aggregation (the share numerator) over a region-filtered
    // multi-way join, the ratio of two exact-decimal sums with one
    // IEEE divide at the end (order-safe on both engines; the
    // all-zero year cannot occur because the denominator sums the
    // same rows the numerator filters).
    "sql_q8" -> QueryDef(
      (s, d) => {
        views(s, d)
        QueryDef.graftSql(s, """SELECT o_year,
          |  CAST(dsum_exact(CASE WHEN supp_nation = 'NATION_3'
          |        THEN volume ELSE 0.0D END)
          |    / dsum_exact(volume) AS DOUBLE) AS mkt_share
          |FROM (SELECT year(o_orderdate) AS o_year,
          |        l_extendedprice * (1 - l_discount) AS volume,
          |        n2.n_name AS supp_nation
          |      FROM v_part, v_lineitem, v_orders, v_customer,
          |        v_supplier, v_nation n1, v_nation n2, v_region
          |      WHERE p_partkey = l_partkey
          |        AND l_orderkey = o_orderkey
          |        AND o_custkey = c_custkey
          |        AND c_nationkey = n1.n_nationkey
          |        AND n1.n_regionkey = r_regionkey
          |        AND r_name = 'ASIA'
          |        AND l_suppkey = s_suppkey
          |        AND s_nationkey = n2.n_nationkey
          |        AND p_type = 'ECONOMY') all_nations
          |GROUP BY o_year
          |ORDER BY o_year""".stripMargin)
      },
      Some("""SELECT o_year,
        |  CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3'
        |        THEN volume ELSE CAST(0 AS DECIMAL(25,6)) END)
        |      AS DOUBLE)
        |    / CAST(sum(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
        |FROM (SELECT year(o_orderdate) AS o_year,
        |        CAST(l_extendedprice * (1 - l_discount)
        |          AS DECIMAL(25,6)) AS volume,
        |        n2.n_name AS supp_nation
        |      FROM part, lineitem, orders, customer,
        |        supplier, nation n1, nation n2, region
        |      WHERE p_partkey = l_partkey
        |        AND l_orderkey = o_orderkey
        |        AND o_custkey = c_custkey
        |        AND c_nationkey = n1.n_nationkey
        |        AND n1.n_regionkey = r_regionkey
        |        AND r_name = 'ASIA'
        |        AND l_suppkey = s_suppkey
        |        AND s_nationkey = n2.n_nationkey
        |        AND p_type = 'ECONOMY') all_nations
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin)),

    // TPC-H Q13 shape: customer order-count DISTRIBUTION — LEFT OUTER
    // join with the filter in the ON clause (pushing it to WHERE
    // would wrongly drop order-less customers), a per-customer count,
    // then a histogram over the counts. The one LEFT JOIN + GROUP BY
    // + re-GROUP shape the battery lacked.
    "sql_q13" -> QueryDef(
      (s, d) => {
        views(s, d)
        s.sql("""SELECT c_count, count(*) AS custdist
          |FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          |      FROM v_customer c
          |      LEFT OUTER JOIN v_orders o
          |        ON c.c_custkey = o.o_custkey
          |        AND o.o_orderpriority <> '1-URGENT'
          |      GROUP BY c.c_custkey) c_orders
          |GROUP BY c_count
          |ORDER BY custdist DESC, c_count DESC""".stripMargin)
      },
      Some("""SELECT c_count, count(*) AS custdist
        |FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |      FROM customer c
        |      LEFT OUTER JOIN orders o
        |        ON c.c_custkey = o.o_custkey
        |        AND o.o_orderpriority <> '1-URGENT'
        |      GROUP BY c.c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // TPC-H Q16 shape: NOT IN subquery (excluded suppliers — planned
    // as a null-aware anti join; s_suppkey is non-null so it executes
    // as a plain LeftAnti) + count(DISTINCT) per group over the
    // part-lineitem join. s_acctbal < 0 plays the complaint-supplier
    // role (no s_comment in the testdata).
    "sql_q16" -> QueryDef(
      (s, d) => {
        views(s, d)
        s.sql("""SELECT p_brand, p_type, p_size,
          |  count(DISTINCT l_suppkey) AS supplier_cnt
          |FROM v_lineitem JOIN v_part ON p_partkey = l_partkey
          |WHERE p_brand <> 'Brand#13'
          |  AND p_type <> 'PROMO'
          |  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
          |  AND l_suppkey NOT IN (
          |    SELECT s_suppkey FROM v_supplier WHERE s_acctbal < 0)
          |GROUP BY p_brand, p_type, p_size
          |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
          |LIMIT 50""".stripMargin)
      },
      Some("""SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#13'
        |  AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 50""".stripMargin)))
}
