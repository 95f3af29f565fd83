package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Scalars

/** Driver-contract queries exercising the scalar library E1-E17
  * (SURVEY.md §2.3) with DuckDB oracle twins.
  *
  * Cross-engine type discipline: DATE and TIME values are emitted as
  * strings (DuckDB TIME has no Spark native type — SURVEY §1/§7.4);
  * timestamps compare natively at µs precision.
  */
object ScalarQueries {

  val defs: Map[String, QueryDef] = Map(

    // E7-E11 — the dim_waktu derivation battery on orders timestamps.
    "time_derivations" -> QueryDef(
      (s, d) => {
        val ts = Tables.orders(s, d)
          .select(col("o_orderdate").as("timestamp_datetime"))
          .na.drop().distinct()
        ts.select(
          col("timestamp_datetime"),
          Scalars.timeOfDay(col("timestamp_datetime")).as("jam"),
          Scalars.dayName(col("timestamp_datetime")).as("hari"),
          date_format(col("timestamp_datetime"), "yyyy-MM-dd").as("tanggal"),
          Scalars.yearMonth(col("timestamp_datetime")).as("bulan"),
          Scalars.yearOf(col("timestamp_datetime")).as("tahun"))
          .orderBy("timestamp_datetime")
      },
      Some("""SELECT timestamp_datetime,
        |  strftime(timestamp_datetime, '%H:%M:%S') AS jam,
        |  dayname(timestamp_datetime) AS hari,
        |  strftime(timestamp_datetime, '%Y-%m-%d') AS tanggal,
        |  strftime(timestamp_datetime, '%Y-%m') AS bulan,
        |  CAST(year(timestamp_datetime) AS BIGINT) AS tahun
        |FROM (SELECT DISTINCT o_orderdate AS timestamp_datetime
        |      FROM orders WHERE o_orderdate IS NOT NULL)
        |ORDER BY timestamp_datetime""".stripMargin)),

    // E2 + E13 + E15 — synthetic key, normalize, cast-to-string.
    "synthetic_scalars" -> QueryDef(
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey"),
          Scalars.syntheticKey(col("c_custkey"),
            Scalars.normalized(col("c_mktsegment"))).as("synthetic_key"),
          Scalars.asString(col("c_nationkey")).as("nation_str"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
        |  concat_ws('_', c_custkey, lower(trim(c_mktsegment)))
        |    AS synthetic_key,
        |  CAST(c_nationkey AS VARCHAR) AS nation_str
        |FROM customer ORDER BY c_custkey""".stripMargin)),

    // E1 — epoch seconds ↔ timestamp round trip (second granularity on
    // both sides; SURVEY §7.4 precision note).
    "epoch_roundtrip" -> QueryDef(
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          unix_timestamp(date_trunc("second", col("o_orderdate")))
            .as("epoch_s"))
        .withColumn("ts_back", Scalars.epochToTimestamp(col("epoch_s")))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        |  CAST(epoch(date_trunc('second', o_orderdate)) AS BIGINT)
        |    AS epoch_s,
        |  CAST(to_timestamp(CAST(epoch(date_trunc('second', o_orderdate))
        |    AS BIGINT)) AS TIMESTAMP) AS ts_back
        |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // E5 — falsy-coalesce (empty string falls through like Python or).
    "coalesce_nonempty" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          Scalars.coalesceNonEmpty(col("source"), lit("unknown"))
            .as("src"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
        |  coalesce(CASE WHEN length(trim(source)) = 0 THEN NULL
        |                ELSE source END, 'unknown') AS src
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // E6 — strict + lenient timestamp parsing: every 10th key gets an
    // unparseable string; lenient parse yields NULL (the reference's
    // pd.to_datetime leniency), never an error.
    "parse_timestamps" -> QueryDef(
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          when(pmod(col("o_orderkey"), lit(10)) === 0, lit("not-a-date"))
            .otherwise(date_format(col("o_orderdate"),
              "yyyy-MM-dd HH:mm:ss")).as("ts_str"))
        .select(col("o_orderkey"), col("ts_str"),
          Scalars.parseTimestampLenient(col("ts_str")).as("ts_parsed"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, ts_str,
        |  try_strptime(ts_str, '%Y-%m-%d %H:%M:%S') AS ts_parsed
        |FROM (SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 'not-a-date'
        |       ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
        |  END AS ts_str FROM orders)
        |ORDER BY o_orderkey""".stripMargin)),

    // E16 — JSON field extraction from the events.props payload.
    "json_extract" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          Scalars.toLong(Scalars.jsonGet(col("props"), "$.k")).as("k"),
          Scalars.jsonGet(col("props"), "$.missing").as("absent"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  json_extract_string(props, '$.missing') AS absent
        |FROM events ORDER BY event_id""".stripMargin)),

    // Decimal/monetary fidelity at the DECIMAL(38,9) boundary —
    // SURVEY §1 maps BIGNUMERIC → DecimalType(38,9) and the mart
    // facts carry money, but until r13 no registry query pinned the
    // cast/round/overflow EDGES against the oracle engine (the
    // TPC-H shapes' exact-decimal sums test sums, not the edge):
    //  * round-half-up AWAY FROM ZERO at the .0x5 boundary, negative
    //    values included (both engines round decimals half away from
    //    zero; a half-even engine would diverge by 0.01 here);
    //  * string→DECIMAL(38,9) cast rounding at the 10th fractional
    //    digit (half-up in both engines — probed, not assumed);
    //  * overflow → NULL under try_cast (ANSI CAST would error;
    //    TRY_CAST is the null-semantics form both engines share);
    //  * a DECIMAL(38,9) sum over the money column.
    // Output discipline: every decimal column casts to DOUBLE at the
    // edge (the dsum rule) — the decimal VALUES carry the semantics,
    // and a 2-dp decimal casts to the identical nearest double in
    // both engines, so the compare stays bit-exact.
    "decimal_money_edge" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.functions.{expr => sexpr}
        Tables.orders(s, d).filter(col("o_orderkey") < 400)
          .select(col("o_orderkey"), col("o_totalprice"))
          .withColumn("half_step",
            sexpr("CAST(o_orderkey % 19 - 9 AS DECIMAL(10,0)) * " +
              "CAST(0.005 AS DECIMAL(10,3))"))
          .select(
            col("o_orderkey"),
            sexpr("CAST(CAST(o_totalprice AS DECIMAL(38,9)) AS DOUBLE)")
              .as("money389"),
            sexpr("CAST(round(half_step, 2) AS DOUBLE)")
              .as("round_half_away"),
            sexpr("CAST(CAST(concat('0.00000000', " +
              "CAST(o_orderkey % 10 AS STRING), '5') AS DECIMAL(38,9)) " +
              "AS DOUBLE)").as("cast_digit10_round"),
            sexpr("CAST(try_cast(concat(repeat('9', " +
              "CASE WHEN o_orderkey % 3 = 0 THEN 25 ELSE 10 END), " +
              "'.5') AS DECIMAL(18,2)) AS DOUBLE)").as("overflow_null"))
          .groupBy()
          .agg(
            QueryDef.dsum(col("money389")).as("sum_money"),
            QueryDef.dsum(col("round_half_away")).as("sum_round"),
            // exact decimal fold at scale 15 — a plain double sum of
            // ~400 1e-9-scale values is addition-order-dependent
            sum(col("cast_digit10_round").cast("decimal(25,15)"))
              .cast("double").as("sum_cast_round"),
            count(when(col("overflow_null").isNull, 1)).as("n_overflow"),
            QueryDef.dsum(col("overflow_null")).as("sum_fit"))
      },
      Some(s"""SELECT
        |  ${QueryDef.dsumSql("money389")} AS sum_money,
        |  ${QueryDef.dsumSql("round_half_away")} AS sum_round,
        |  CAST(sum(CAST(cast_digit10_round AS DECIMAL(25,15)))
        |    AS DOUBLE) AS sum_cast_round,
        |  count(CASE WHEN overflow_null IS NULL THEN 1 END) AS n_overflow,
        |  ${QueryDef.dsumSql("overflow_null")} AS sum_fit
        |FROM (SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(38,9)) AS DOUBLE) AS money389,
        |  CAST(round(CAST(o_orderkey % 19 - 9 AS DECIMAL(10,0)) *
        |    CAST(0.005 AS DECIMAL(10,3)), 2) AS DOUBLE) AS round_half_away,
        |  CAST(CAST(concat('0.00000000',
        |    CAST(o_orderkey % 10 AS VARCHAR), '5') AS DECIMAL(38,9))
        |    AS DOUBLE) AS cast_digit10_round,
        |  CAST(TRY_CAST(concat(repeat('9',
        |    CASE WHEN o_orderkey % 3 = 0 THEN 25 ELSE 10 END),
        |    '.5') AS DECIMAL(18,2)) AS DOUBLE) AS overflow_null
        |  FROM orders WHERE o_orderkey < 400)""".stripMargin))
  )
}
