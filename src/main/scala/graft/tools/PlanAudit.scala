package graft.tools

import org.apache.spark.sql.SparkSession

/** Builder-side plan audit: print the EXECUTED plan of registry
  * queries (after AQE finalization) for shuffle/exchange review —
  * the .explain loop behind the SCALING.md claims.
  *
  * Usage: sbt "runMain graft.tools.PlanAudit <sfDir> <query> [query…]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.count() // finalize adaptive plan
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange ".r.findAllIn(plan).size
      println(s"=== $name (Exchange count: $exchanges) ===")
      println(plan)
    }
    spark.stop()
  }
}
