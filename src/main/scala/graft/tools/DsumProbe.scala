package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe: what the exact-decimal sum discipline (QueryDef.dsum)
  * costs per aggregate vs plain double / long alternatives, measured
  * on the bench lineitem at local[32]. Guide §1: measure before
  * touching a discipline that ~30 oracle twins depend on. */
object DsumProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def time(label: String)(f: => Any): Unit = {
      // warm twice, time median-ish third
      f; f
      val t0 = System.nanoTime(); f
      println(f"DSUMPROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val x = col("l_extendedprice")
    time("baseline scan (count only)")(li.agg(count(lit(1))).head())
    time("sum double")(li.agg(sum(x)).head())
    time("dsum decimal(25,6)")(
      li.agg(sum(x.cast("decimal(25,6)")).cast("double")).head())
    time("dsum decimal(18,6)")(
      li.agg(sum(x.cast("decimal(18,6)")).cast("double")).head())
    time("sum unscaled long")(
      li.agg(sum((x * 1e6).cast("long"))).head())
    time("6x dsum25 by group")(
      li.groupBy(col("l_returnflag")).agg(
        sum(x.cast("decimal(25,6)")),
        sum(col("l_quantity").cast("decimal(25,6)")),
        sum((col("l_quantity") * x).cast("decimal(25,6)")),
        sum((x * x).cast("decimal(25,6)")),
        sum((col("l_quantity") * col("l_quantity")).cast("decimal(25,6)")),
        sum((x + col("l_quantity")).cast("decimal(25,6)"))).collect())
    time("6x sum double by group")(
      li.groupBy(col("l_returnflag")).agg(
        sum(x), sum(col("l_quantity")), sum(col("l_quantity") * x),
        sum(x * x), sum(col("l_quantity") * col("l_quantity")),
        sum(x + col("l_quantity"))).collect())
    def nsum(c: org.apache.spark.sql.Column) =
      graft.functions.DecimalDoubleSum.column(c)
    time("6x dsum_exact by group")(
      li.groupBy(col("l_returnflag")).agg(
        nsum(x), nsum(col("l_quantity")), nsum(col("l_quantity") * x),
        nsum(x * x), nsum(col("l_quantity") * col("l_quantity")),
        nsum(x + col("l_quantity"))).collect())
    // bit-equality check vs the decimal discipline, per group,
    // including a HIGH-CARDINALITY grouping (per-orderkey)
    val a = li.groupBy(col("l_returnflag")).agg(
      sum(x.cast("decimal(25,6)")).cast("double").as("s1"),
      sum((col("l_quantity") * x).cast("decimal(25,6)")).cast("double")
        .as("s2"))
    val b = li.groupBy(col("l_returnflag")).agg(
      nsum(x).as("s1"), nsum(col("l_quantity") * x).as("s2"))
    val mism = a.join(b, Seq("l_returnflag"))
      .filter(a("s1") =!= b("s1") || a("s2") =!= b("s2")).count()
    println(s"DSUMPROBE mismatch-lowcard=$mism")
    val ah = li.groupBy(col("l_orderkey")).agg(
      sum(x.cast("decimal(25,6)")).cast("double").as("s1"))
    val bh = li.groupBy(col("l_orderkey")).agg(nsum(x).as("s1"))
    val mh = ah.join(bh, Seq("l_orderkey"))
      .filter(ah("s1") =!= bh("s1")).count()
    val nulls = bh.filter(col("s1").isNull).count()
    println(s"DSUMPROBE mismatch-highcard=$mh groups=${ah.count()} " +
      s"nulls=$nulls")
    // adversarial values: midpoints, negatives, tiny/huge magnitudes
    val adv = spark.range(0, 200000).selectExpr(
      "id",
      """CASE pmod(id, 7)
         WHEN 0 THEN cast(id as double) / 3.0
         WHEN 1 THEN -cast(id as double) * 1.0000005
         WHEN 2 THEN cast(id as double) * 1e-7
         WHEN 3 THEN 0.0000005 + id
         WHEN 4 THEN -1e9 - cast(id as double) * 0.9999995
         WHEN 5 THEN cast(id as double) * 12345.6789012345
         ELSE cast(null as double) END AS v""")
    val aa = adv.groupBy(pmod(col("id"), lit(97)).as("g"))
      .agg(sum(col("v").cast("decimal(25,6)")).cast("double").as("s"))
    val bb = adv.groupBy(pmod(col("id"), lit(97)).as("g"))
      .agg(nsum(col("v")).as("s"))
    val ma = aa.join(bb, Seq("g"))
      .filter(!(aa("s") <=> bb("s"))).count()
    println(s"DSUMPROBE mismatch-adversarial=$ma")
    spark.stop()
  }
}
