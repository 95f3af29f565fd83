package graft.tools

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{StreamingOps, UserEvent, UserProfile,
  FunnelProgress}

/** Measures the RocksDB state-store footprint of the stateful
  * streaming twins on a real SF's events table — the numbers for
  * SCALING.md's state-sizing section (VERDICT r12 #6 asked for
  * MEASURED sizes at the sf1 leg, not the analytic model alone).
  *
  * Streams `<sfDir>/events.parquet` through three stateful twins on
  * the RocksDB provider with changelog checkpointing, multiple
  * micro-batches (`maxFilesPerTrigger=1`, so state persists and
  * compacts across batches like production), then reports per twin:
  * input rows, distinct state keys, and the checkpoint state dir's
  * bytes / file counts by kind (.zip snapshots vs .changelog deltas).
  *
  * Usage: `runMain graft.tools.StateSizeProbe <sfDir> [outJson]`
  */
object StateSizeProbe {

  private def dirStats(ckpt: String): (Long, Long, Long, Long) = {
    val d = Paths.get(ckpt, "state")
    if (!Files.exists(d)) return (0L, 0L, 0L, 0L)
    val s = Files.walk(d)
    try {
      import scala.jdk.CollectionConverters._
      var bytes = 0L; var zips = 0L; var logs = 0L; var other = 0L
      s.iterator().asScala.filter(Files.isRegularFile(_)).foreach {
        p: Path =>
          bytes += Files.size(p)
          val n = p.getFileName.toString
          if (n.endsWith(".zip")) zips += 1
          else if (n.endsWith(".changelog")) logs += 1
          else other += 1
      }
      (bytes, zips, logs, other)
    } finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outJson = if (args.length > 1) Some(args(1)) else None
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        StreamingOps.RocksDBStateStoreProvider)
      .config(StreamingOps.RocksDBChangelogConfKey, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val root = Files.createTempDirectory("graft-state-probe")
    def src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$sfDir/events.parquet")

    val results = scala.collection.mutable.ArrayBuffer[String]()

    def report(name: String, ckpt: String, inRows: Long,
               stateKeys: Long): Unit = {
      val (bytes, zips, logs, other) = dirStats(ckpt)
      val line = s"""{"twin":"$name","input_rows":$inRows,""" +
        s""""state_keys":$stateKeys,"state_bytes":$bytes,""" +
        s""""zip_snapshots":$zips,"changelogs":$logs,"other":$other}"""
      println(s"[stateprobe] $line")
      results += line
    }

    // 1. seen-set exact dedup — state keyed by (event_id, ts) within
    //    the watermark: the widest-key twin
    locally {
      val ckpt = root.resolve("dedup").toString
      val rows = spark.sparkContext.longAccumulator("rows")
      val q = StreamingOps.dedupStream(src, "ts", "10 minutes",
          Seq("event_id"))
        .writeStream.outputMode("append")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          rows.add(b.count()); ()
        }
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
      report("dedup_seen_set", ckpt, rows.value, rows.value)
    }

    // 2. running per-user profile — mapGroupsWithState keyed by
    //    user_id: the entity-state twin
    locally {
      val ckpt = root.resolve("profile").toString
      val users = new java.util.concurrent.ConcurrentHashMap[Long, Unit]()
      val rows = spark.sparkContext.longAccumulator("rows2")
      val ev = src.select(col("ts"), col("user_id"), col("event_type"),
        col("value")).as[UserEvent]
      val q = StreamingOps.runningUserProfile(ev)
        .writeStream.outputMode("update")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[UserProfile], _: Long) =>
          b.collect().foreach(p => users.put(p.user_id, ()))
          rows.add(b.count()); ()
        }
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
      report("running_user_profile", ckpt, rows.value, users.size().toLong)
    }

    // 3. funnel reach-times — flatMapGroupsWithState keyed by
    //    user_id with a 3-slot state record
    locally {
      val ckpt = root.resolve("funnel").toString
      val users = new java.util.concurrent.ConcurrentHashMap[Long, Unit]()
      val rows = spark.sparkContext.longAccumulator("rows3")
      val ev = src.select(col("ts"), col("user_id"), col("event_type"),
        col("value")).as[UserEvent]
      val q = StreamingOps.funnelStream(ev, ("view", "click", "purchase"))
        .writeStream.outputMode("update")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[FunnelProgress], _: Long) =>
          b.collect().foreach(p => users.put(p.user_id, ()))
          rows.add(b.count()); ()
        }
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
      report("funnel_reach_times", ckpt, rows.value, users.size().toLong)
    }

    val json = results.mkString("[", ",", "]")
    outJson.foreach(p => Files.write(Paths.get(p),
      (json + "\n").getBytes("UTF-8")))
    println(s"[stateprobe] done sf=$sfDir -> $json")
    spark.stop()
  }
}
