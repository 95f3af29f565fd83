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
      // build and execute timed SEPARATELY: several registry queries
      // do eager work while the DataFrame is CONSTRUCTED (fixture
      // builds, persisted stage materialization, localCheckpoints,
      // the cluster loop) — graft.Bench times fn().count() as one
      // unit, so comparing a bench median against a count-only
      // timing here systematically under-reads the query
      val tB = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val buildSecs = (System.nanoTime() - tB) / 1e9
      if (explain) {
        println(s"=== plan: $name ===")
        df.explain("formatted")
      }
      val t0 = System.nanoTime()
      // full-output evaluation, not count(): count() column-prunes a
      // terminal projection away entirely (Bench.forceFull scaladoc)
      val n = df.queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"TIMEQUERY $name rows=$n secs=${buildSecs + secs}%.2f " +
        f"(build=$buildSecs%.2f exec=$secs%.2f)")
    }
    spark.stop()
  }
}
