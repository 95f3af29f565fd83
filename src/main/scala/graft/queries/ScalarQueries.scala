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
        |FROM events ORDER BY event_id""".stripMargin))
  )
}
