package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Relational
import QueryDef.{dsum, dsumSql}

/** Driver-contract queries exercising the reference's relational
  * operators R1-R15 (SURVEY.md §2.2) on the TPC-H-ish testdata, each
  * with a DuckDB oracle twin.
  *
  * Determinism: every result carries a total ORDER BY; dedupes use an
  * explicit per-key order (SURVEY §2.2-R3 caveat).
  */
object RelationalQueries {

  val defs: Map[String, QueryDef] = Map(

    // R3 — dedupe by key with deterministic tiebreak. The tiebreak
    // must be a TOTAL order within the key: (l_orderkey, l_linenumber)
    // is not unique in this data, so extend to partkey+suppkey.
    "dedup_by_key" -> QueryDef(
      (s, d) => Relational.dedupeByKeyOrdered(
          Tables.lineitem(s, d), Seq("l_orderkey"),
          Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY l_orderkey
        |         ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
        |      FROM lineitem)
        |WHERE rn = 1 ORDER BY l_orderkey""".stripMargin)),

    // R4 — distinct rows.
    "distinct_values" -> QueryDef(
      (s, d) => Relational.distinctRows(
          Tables.orders(s, d).select("o_orderstatus", "o_orderpriority"))
        .orderBy("o_orderstatus", "o_orderpriority"),
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // R5 — the load-bearing incremental anti-join: customers with no
    // large order. Distributed left-anti (never a driver-side key set).
    "anti_join_new_keys" -> QueryDef(
      (s, d) => Relational.antiJoinNewKeys(
          Tables.customer(s, d),
          Tables.orders(s, d).filter(col("o_totalprice") > 400000)
            .select(col("o_custkey").as("c_custkey")),
          "c_custkey")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin)),

    // R6 — left outer equi-join enrichment (dim side broadcastable).
    "join_left_enrich" -> QueryDef(
      (s, d) => Relational.leftEnrich(
          Tables.lineitem(s, d).filter(col("l_orderkey") < 200),
          Tables.part(s, d), "l_partkey", "p_partkey",
          Seq("p_brand", "p_name"))
        .select("l_orderkey", "l_linenumber", "p_brand", "p_name")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, p_brand, p_name
        |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
        |WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // R7 — explicit broadcast lookup join + aggregate.
    "broadcast_join" -> QueryDef(
      (s, d) => Relational.lookupJoin(
          Tables.lineitem(s, d),
          Tables.supplier(s, d)
            .select(col("s_suppkey").as("l_suppkey"), col("s_name")),
          Seq("l_suppkey"), "inner")
        .groupBy("s_name")
        .agg(dsum(col("l_extendedprice")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("s_name"),
      Some(s"""SELECT s_name, ${dsumSql("l_extendedprice")} AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin)),

    // R8 — union-all aligned by name.
    "union_all" -> QueryDef(
      (s, d) => Relational.unionAll(Seq(
          Tables.customer(s, d)
            .select(col("c_custkey").as("id"), lit("customer").as("src")),
          Tables.supplier(s, d)
            .select(col("s_suppkey").as("id"), lit("supplier").as("src"))))
        .orderBy("src", "id"),
      Some("""SELECT c_custkey AS id, 'customer' AS src FROM customer
        |UNION ALL
        |SELECT s_suppkey AS id, 'supplier' AS src FROM supplier
        |ORDER BY src, id""".stripMargin)),

    // R9 — union + dedupe (dim_proyek topology).
    "union_dedup" -> QueryDef(
      (s, d) => Relational.unionDedupe(
          Tables.customer(s, d).select(col("c_nationkey").as("nationkey")),
          Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")),
          "nationkey")
        .orderBy("nationkey"),
      Some("""SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin)),

    // R10 — NOT NULL enforcement by dropping rows.
    "notnull_filter" -> QueryDef(
      (s, d) => Relational.dropNullsIn(
          Tables.customer(s, d).select(col("c_custkey"),
            nullif(col("c_mktsegment"), lit("BUILDING")).as("segment")),
          Seq("segment"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS segment
        |FROM customer
        |WHERE nullif(c_mktsegment, 'BUILDING') IS NOT NULL
        |ORDER BY c_custkey""".stripMargin)),

    // R11 — predicate filter (pushed to the parquet scan).
    "filter_predicate" -> QueryDef(
      (s, d) => Relational.where(Tables.lineitem(s, d),
          col("l_shipdate").between("1995-01-01", "1995-03-31") &&
            col("l_discount") > 0.05 && col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
        |                     AND TIMESTAMP '1995-03-31 00:00:00'
        |  AND l_discount > 0.05 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // R14 — deterministic top-N per key.
    "topn_per_key" -> QueryDef(
      (s, d) => Relational.topNPerKey(Tables.orders(s, d),
          Seq("o_orderpriority"),
          Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .orderBy(col("o_orderpriority"), col("o_totalprice").desc,
          col("o_orderkey")),
      Some("""SELECT o_orderpriority, o_orderkey, o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
        |        ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey"""
        .stripMargin)),

    // Contiguous global row ids without the single-partition global
    // window (Relational.contiguousRowIds: range exchange + parallel
    // per-partition ranks + broadcast offsets — QueryPlanSpec asserts
    // the data path never collapses to SinglePartition). The oracle
    // computes the same ids with a bare global row_number, which
    // DuckDB can afford at oracle scale.
    "global_row_ids" -> QueryDef(
      (s, d) => Relational.contiguousRowIds(
          Tables.orders(s, d).select("o_orderkey", "o_orderstatus"),
          Seq(col("o_orderkey")))
        // row_id is monotone in o_orderkey (it IS the o_orderkey
        // rank), so ordering by the key is the same row order; the
        // sort runs on the source column rather than the derived id
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderstatus,
        |  row_number() OVER (ORDER BY o_orderkey) - 1 AS row_id
        |FROM orders ORDER BY row_id""".stripMargin)),

    // R1+R2+R15 — projection with existence guard + rename.
    "select_rename" -> QueryDef(
      (s, d) => Relational.renameAll(
          Relational.selectExisting(Tables.nation(s, d),
            Seq("n_nationkey", "n_name", "not_a_column")),
          Map("n_nationkey" -> "id", "n_name" -> "name"))
        .orderBy("id"),
      Some("SELECT n_nationkey AS id, n_name AS name FROM nation ORDER BY id")),

    // R13 — the reference's only aggregate: row count.
    "row_count" -> QueryDef(
      (s, d) => Tables.lineitem(s, d).agg(count(lit(1)).as("n")),
      Some("SELECT count(*) AS n FROM lineitem")),

    // Left-semi join (EXISTS).
    "semi_join" -> QueryDef(
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_custkey").as("c_custkey"))
        Tables.customer(s, d)
          .join(o, Seq("c_custkey"), "left_semi")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin)),

    // Full outer join of two sparse per-nation aggregates.
    "full_outer_join" -> QueryDef(
      (s, d) => {
        val c = Tables.customer(s, d).filter(col("c_acctbal") < 0)
          .groupBy(col("c_nationkey").as("ck"))
          .agg(count(lit(1)).as("n_debtors"))
        val p = Tables.supplier(s, d).filter(col("s_acctbal") > 5000)
          .groupBy(col("s_nationkey").as("sk"))
          .agg(count(lit(1)).as("n_rich_suppliers"))
        c.join(p, c("ck") === p("sk"), "full_outer")
          .select(coalesce(col("ck"), col("sk")).as("nationkey"),
            col("n_debtors"), col("n_rich_suppliers"))
          .orderBy("nationkey")
      },
      Some("""SELECT coalesce(ck, sk) AS nationkey, n_debtors, n_rich_suppliers
        |FROM (SELECT c_nationkey AS ck, count(*) AS n_debtors
        |      FROM customer WHERE c_acctbal < 0 GROUP BY c_nationkey) c
        |FULL OUTER JOIN
        |     (SELECT s_nationkey AS sk, count(*) AS n_rich_suppliers
        |      FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey) p
        |ON ck = sk
        |ORDER BY nationkey""".stripMargin)),

    // INTERSECT (set semantics, distinct).
    "intersect_keys" -> QueryDef(
      (s, d) => Tables.customer(s, d).select(col("c_custkey").as("key"))
        .intersect(Tables.orders(s, d).select(col("o_custkey").as("key")))
        .orderBy("key"),
      Some("""SELECT c_custkey AS key FROM customer
        |INTERSECT
        |SELECT o_custkey AS key FROM orders
        |ORDER BY key""".stripMargin)),

    // EXCEPT (set semantics, distinct).
    "except_keys" -> QueryDef(
      (s, d) => Tables.customer(s, d).select(col("c_custkey").as("key"))
        .except(Tables.orders(s, d).filter(col("o_totalprice") > 400000)
          .select(col("o_custkey").as("key")))
        .orderBy("key"),
      Some("""SELECT c_custkey AS key FROM customer
        |EXCEPT
        |SELECT o_custkey AS key FROM orders WHERE o_totalprice > 400000
        |ORDER BY key""".stripMargin)),

    // Non-equi range join against a small literal band table
    // (broadcast nested-loop on the tiny side — never a shuffle).
    "range_join" -> QueryDef(
      (s, d) => {
        val bands = s.createDataFrame(Seq(
          ("low", 0.0, 5.0), ("mid", 5.0, 20.0), ("high", 20.0, 1e9)))
          .toDF("band", "lo", "hi")
        Tables.events(s, d)
          .join(broadcast(bands),
            col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy("band")
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
          .orderBy("band")
      },
      Some(s"""SELECT band, count(*) AS n,
        |  ${dsumSql("value")} AS total_value
        |FROM events e JOIN (VALUES ('low', 0.0, 5.0), ('mid', 5.0, 20.0),
        |  ('high', 20.0, 1e9)) b(band, lo, hi)
        |ON e.value >= b.lo AND e.value < b.hi
        |GROUP BY band ORDER BY band""".stripMargin))
  )
}
