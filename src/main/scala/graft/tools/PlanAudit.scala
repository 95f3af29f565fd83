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
      // collect() executes THIS Dataset so AQE finalizes ITS plan —
      // count() would build a separate aggregate Dataset and leave
      // df's adaptive plan unfinalized (the SkewSpec-documented trap)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // a finalized AdaptiveSparkPlan prints BOTH the final plan and
      // an "== Initial Plan ==" section — count the final one only
      val finalSection = plan.split("== Initial Plan ==").head
      // shuffles only: skip BroadcastExchange and ReusedExchange.
      // ReusedExchangeExec's argString embeds the referenced child's
      // own "Exchange hashpartitioning(...)" text, so a lookbehind
      // alone overcounts — drop ReusedExchange lines entirely first.
      val exchanges = finalSection.linesIterator
        .filterNot(_.contains("ReusedExchange"))
        .flatMap("Exchange (hash|range|Single)".r.findAllIn(_))
        .size
      println(s"=== $name (shuffle Exchange count: $exchanges) ===")
      println(plan)
    }
    spark.stop()
  }
}
