package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object WidenAggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val liW = li.repartition(32)
    def time(label: String)(f: => Any): Unit = {
      f; f; val t0 = System.nanoTime(); f
      println(f"WPROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def distinctAgg(df: org.apache.spark.sql.DataFrame) = df
      .select("l_returnflag", "l_partkey").distinct()
      .groupBy("l_returnflag")
      .agg(count(lit(1)), approx_count_distinct(col("l_partkey"), 0.01))
      .queryExecution.toRdd.count()
    time("approx_distinct narrow")(distinctAgg(li))
    time("approx_distinct widened")(distinctAgg(liW))
    def pct(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)))
      .queryExecution.toRdd.count()
    time("percentile narrow")(pct(li))
    time("percentile widened")(pct(liW))
    def dsums(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("l_returnflag")
      .agg(graft.functions.DecimalDoubleSum.column(col("l_extendedprice")),
        graft.functions.DecimalDoubleSum.column(col("l_quantity")),
        count(lit(1)))
      .queryExecution.toRdd.count()
    time("dsum3 narrow")(dsums(li))
    time("dsum3 widened")(dsums(liW))
    spark.stop()
  }
}
