package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Built-in function batteries (SURVEY §2.4: categories the reference
  * lacks entirely; the engine exposes Spark's built-ins, oracle-checked
  * against DuckDB equivalents).
  *
  * Parity notes: transcendental results (ln/exp/pow) round to 6
  * decimals — JVM Math and C libm may differ in the last ULP;
  * integer/string functions compare exactly.
  */
object FunctionQueries {

  val defs: Map[String, QueryDef] = Map(

    // Regex + string battery over documents.source / lang.
    "string_funcs" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_extract(col("source"), "src(\\d+)", 1).cast("int")
            .as("source_num"),
          upper(col("lang")).as("lang_upper"),
          substring(col("text"), 1, 12).as("prefix"),
          lpad(col("doc_id").cast("string"), 6, "0").as("padded_id"),
          reverse(col("lang")).as("lang_rev"),
          length(col("text")).as("text_len"),
          instr(col("source"), "rc").as("rc_pos"),
          translate(col("lang"), "aeiou", "AEIOU").as("lang_tr"),
          repeat(col("lang"), 2).as("lang2"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
        |  CAST(regexp_extract(source, 'src(\d+)', 1) AS INT)
        |    AS source_num,
        |  upper(lang) AS lang_upper,
        |  substring(text, 1, 12) AS prefix,
        |  lpad(CAST(doc_id AS VARCHAR), 6, '0') AS padded_id,
        |  reverse(lang) AS lang_rev,
        |  length(text) AS text_len,
        |  CAST(instr(source, 'rc') AS INT) AS rc_pos,
        |  translate(lang, 'aeiou', 'AEIOU') AS lang_tr,
        |  repeat(lang, 2) AS lang2
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Math battery over lineitem (transcendentals rounded).
    "math_funcs" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 500)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          abs(col("l_discount") - 0.05).as("abs_d"),
          ceil(col("l_quantity")).as("ceil_q"),
          floor(col("l_extendedprice")).as("floor_p"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_q"),
          round(log(col("l_extendedprice")), 6).as("ln_p"),
          round(pow(col("l_discount"), lit(2)), 6).as("d2"),
          signum(col("l_discount") - 0.05).as("sign_d"),
          greatest(col("l_quantity"), col("l_discount") * 100)
            .as("greatest_v"),
          pmod(col("l_partkey"), lit(7)).as("mod7"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey,
        |  abs(l_discount - 0.05) AS abs_d,
        |  CAST(ceil(l_quantity) AS BIGINT) AS ceil_q,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
        |  round(sqrt(l_quantity), 6) AS sqrt_q,
        |  round(ln(l_extendedprice), 6) AS ln_p,
        |  round(pow(l_discount, 2), 6) AS d2,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_d,
        |  greatest(l_quantity, l_discount * 100) AS greatest_v,
        |  l_partkey % 7 AS mod7
        |FROM lineitem WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin)),

    // Date/interval arithmetic battery over orders.
    "date_funcs" -> QueryDef(
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd")
            .as("due_date"),
          datediff(lit("1999-01-01").cast("date"),
            col("o_orderdate").cast("date")).as("days_to_1999"),
          (col("o_orderdate") + expr("INTERVAL 36 HOURS")).as("plus_36h"),
          date_format(date_trunc("month", col("o_orderdate")),
            "yyyy-MM-dd").as("month_start"),
          quarter(col("o_orderdate")).as("qtr"),
          dayofweek(col("o_orderdate")).as("dow"),
          weekofyear(col("o_orderdate")).as("iso_week"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE),
        |    DATE '1999-01-01') AS INT) AS days_to_1999,
        |  o_orderdate + INTERVAL 36 HOUR AS plus_36h,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')
        |    AS month_start,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(weekofyear(o_orderdate) AS INT) AS iso_week
        |FROM orders ORDER BY o_orderkey""".stripMargin))
  )
}
