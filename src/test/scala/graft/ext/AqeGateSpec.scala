package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The AQE restore race that inflated the whole r9 bench suite:
  * duplicateClusters brackets its loop with adaptive-execution off,
  * and a bare get/set/restore pair let the SECOND of two overlapping
  * loops read "false" as its restore value and re-land it — leaving
  * the session permanently without AQE after a parallel warmup.
  * AqeGate reference-counts the bracket; these cases pin the exact
  * interleaving that broke and the concurrent real-op shape. */
class AqeGateSpec extends SparkSpec {
  import spark.implicits._

  private val key = "spark.sql.adaptive.enabled"

  test("overlapping enters restore the ORIGINAL value only at the " +
    "last exit (the parallel-warmup interleaving)") {
    val orig = spark.conf.get(key, "true")
    AqeGate.enter(spark)                     // loop A starts
    assert(spark.conf.get(key) === "false")
    AqeGate.enter(spark)                     // loop B overlaps — the
                                             // raced form read "false"
                                             // here as its restore value
    assert(spark.conf.get(key) === "false")
    AqeGate.exit(spark)                      // A ends: still bracketed
    assert(spark.conf.get(key) === "false")
    AqeGate.exit(spark)                      // B ends: true restore
    assert(spark.conf.get(key) === orig)
  }

  test("concurrent duplicateClusters invocations leave AQE as found") {
    val orig = spark.conf.get(key, "true")
    val pairsA = Seq((1L, 2L), (2L, 3L), (4L, 5L))
      .toDF("id_a", "id_b")
    val pairsB = Seq((10L, 11L), (11L, 12L))
      .toDF("id_a", "id_b")
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fa = Future(DedupOps.duplicateClusters(pairsA).count())
    val fb = Future(DedupOps.duplicateClusters(pairsB).count())
    assert(Await.result(fa, 2.minutes) === 5L)
    assert(Await.result(fb, 2.minutes) === 3L)
    assert(spark.conf.get(key, "true") === orig)
  }
}
