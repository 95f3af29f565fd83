package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the configured SF
  * and prints one JSON metric line.
  *
  * METHODOLOGY (recorded in the JSON as "timing"): each query is
  * first run once, untimed, in a parallel warmup pass; the timed
  * sequential pass then measures STEADY-STATE execution. At bench SF
  * the one-time Janino/JIT compilation of each query's generated
  * stages (~0.3-0.5 s per query, ~25 s across the registry) would
  * otherwise dominate and scale-invert the signal — on the target
  * 100 TB runs the same compile cost is amortized over
  * minutes-to-hours of execution, so steady-state is the
  * scale-faithful throughput measure. Warmup failures are ignored;
  * the timed pass records per-query errors and exits non-zero on
  * any. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb first-job session warmup (codegen, broadcast infra)
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    // parallel warmup: compile + execute each query once so the timed
    // pass below measures steady state (see scaladoc)
    val warmupSec = {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      val t0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutor(pool)
      val fs = SparkEntry.queries.toSeq.map { case (_, fn) =>
        Future { try fn(spark, sfDir).count() catch { case _: Throwable => } }
      }
      Await.ready(Future.sequence(fs), 15.minutes)
      pool.shutdown()
      (System.nanoTime() - t0) / 1e9
    }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.next().take(200)
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"\"${esc(k)}\":\"${esc(v)}\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    spark.stop()
    // the metric JSON must be the sole, final stdout line so the
    // driver's parser finds it without scraping interleaved log output
    Console.out.flush()
    println(s"""{"metric":"total","value":$total,"unit":"sec","timing":"steady_state_after_warmup","warmup_wall_sec":$warmupSec,"queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    if (errors.nonEmpty) sys.exit(1)
  }
}
