package graft.tools

import org.apache.spark.sql.SparkSession

/** Builder-side utility: time one or more registry queries and
  * optionally print the formatted physical plan.
  *
  * Usage: runMain graft.tools.TimeQuery <sfDir> [--explain] <query>...
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val explain = args.contains("--explain")
    val names = args.drop(1).filterNot(_ == "--explain")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      if (explain) {
        println(s"=== plan: $name ===")
        df.explain("formatted")
      }
      val t0 = System.nanoTime()
      val n = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"TIMEQUERY $name rows=$n secs=$secs%.2f")
    }
    spark.stop()
  }
}
