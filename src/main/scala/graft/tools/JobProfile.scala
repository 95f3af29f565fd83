package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Builder-side per-JOB profiler for registry queries: runs each named
  * query (one untimed warm pass, then one measured pass) with a
  * listener that records every Spark job's wall time and call site,
  * so multi-action queries (store-maintenance sequences, iterative
  * loops, fixture builds) can be attributed job by job — the guide's
  * "decide where the time goes before optimizing" step (§1.1) for
  * queries whose cost is spread over many driver actions rather than
  * one plan.
  *
  * Usage: runMain graft.tools.JobProfile <sfDir> <query>...
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null && collecting) {
          val dt = (System.nanoTime() - s._1) / 1e9
          log.add(f"  job ${je.jobId}%4d ${dt}%7.3f s  ${s._2}")
        }
      }
    })

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm pass: JIT + memoized fixtures, uncounted
      try fn(spark, sfDir).queryExecution.toRdd.count()
      catch { case e: Throwable => println(s"WARM FAIL $name: $e") }
      log.clear()
      collecting = true
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tB = System.nanoTime()
      df.queryExecution.toRdd.count()
      val t1 = System.nanoTime()
      collecting = false
      // let stragglers land
      Thread.sleep(200)
      println(f"PROFILE $name total=${(t1 - t0) / 1e9}%.2f s " +
        f"(build=${(tB - t0) / 1e9}%.2f exec=${(t1 - tB) / 1e9}%.2f)")
      log.forEach(l => println(l))
    }
    spark.stop()
  }
}
