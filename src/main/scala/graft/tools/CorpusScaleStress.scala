package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-side measurement behind SCALING.md's "corpus-linear, not
  * quadratic" claims for the ONE-SHOT production dedup/ANN paths
  * (the incremental-index twin is [[IndexScaleStress]]): run each
  * pipeline over salted corpus multiples (1×, 2×, 4×, 8× of the given
  * SF's documents/embeddings — 8× sf0.1 ≈ an sf1-scale corpus) and
  * print wall seconds, shuffle bytes, and result counts per multiple.
  *
  * The claim under test: banded/bucketed candidate generation keeps
  * total cost ~linear in corpus size (cost(8×) ≈ 8 × cost(1×)), while
  * a quadratic all-pairs design would show cost(8×) ≈ 64 × cost(1×).
  * Salting mirrors IndexScaleStress: each clone carries 25 unique
  * per-(clone, doc) tokens, so clones are NOT near-dups of each other
  * and the true-pair count stays ~linear too (worst case for the
  * candidate stages — maximal distinct signatures).
  *
  * Usage: sbt "runMain graft.tools.CorpusScaleStress <sfDir> [multiples...]"
  */
object CorpusScaleStress {

  private class ShuffleMeter extends SparkListener {
    val read = new java.util.concurrent.atomic.AtomicLong(0)
    val write = new java.util.concurrent.atomic.AtomicLong(0)
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def reset(): Unit = { read.set(0); write.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val multiples = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
                    else Seq(1, 2, 4, 8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    /** m salted clones of documents (clone 0 = the original corpus). */
    def docsX(m: Int) = (0 until m).map { c =>
      if (c == 0) docs
      else docs.select(
        (col("doc_id") + lit(c.toLong * 10000000L)).as("doc_id"),
        concat(col("text"), lit(" "),
          concat_ws(" ", transform(sequence(lit(1), lit(25)),
            j => concat(lit(s"u${c}x"), col("doc_id"), lit("y"), j))))
          .as("text"))
    }.reduce(_ unionByName _)

    def embX(m: Int) = (0 until m).map { c =>
      emb.select((col("vec_id") + lit(c.toLong * 10000000L)).as("vec_id"),
        col("embedding"))
    }.reduce(_ unionByName _)

    multiples.foreach { m =>
      val d = docsX(m).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = d.count()

      meter.reset()
      val (nExact, tExact) = timed {
        graft.ext.DedupOps.exactDedupByHash(d, "doc_id", "text").count()
      }
      val exactMb = (meter.read.get + meter.write.get) / 1e6

      meter.reset()
      // auto-sized banding: rows-per-band grows with log n to hold
      // false candidates per doc flat (chooseMinhashParams scaladoc)
      val (mhHashes, mhBands, mhRows) =
        graft.ext.DedupOps.chooseMinhashParams(n, threshold = 0.8)
      val (nMh, tMh) = timed {
        graft.ext.DedupOps.minhashNearDupPairs(
          d, "doc_id", "text", shingleSize = 1, numHashes = mhHashes,
          bands = mhBands, threshold = 0.8).count()
      }
      val mhMb = (meter.read.get + meter.write.get) / 1e6

      meter.reset()
      val (nSh, tSh) = timed {
        graft.ext.DedupOps.simhashNearDupPairs(
          d, "doc_id", "text", maxDistance = 3).count()
      }
      val shMb = (meter.read.get + meter.write.get) / 1e6

      println(f"docs x$m%-2d n=$n%7d | exact: $tExact%6.1f s " +
        f"$exactMb%6.0f MB ($nExact kept) | minhash[r=$mhRows%d " +
        f"b=$mhBands%d]: $tMh%6.1f s " +
        f"$mhMb%6.0f MB ($nMh pairs) | simhash: $tSh%6.1f s " +
        f"$shMb%6.0f MB ($nSh pairs)")
      d.unpersist()
    }

    multiples.foreach { m =>
      val e = embX(m).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = e.count()
      val queries = emb.filter(col("vec_id") < 5)
      meter.reset()
      // auto-sized inverted file: √n lists (chooseNumCentroids)
      val nc = graft.ext.VectorOps.chooseNumCentroids(n)
      val (nIvf, tIvf) = timed {
        graft.ext.VectorOps.ivfTopK(e, queries, "vec_id", "embedding",
          k = 10, nCentroids = nc, nProbe = 2).count()
      }
      println(f"emb  x$m%-2d n=$n%7d | ivf(topk=10, probes=2/" +
        f"$nc%d): $tIvf%6.1f s " +
        f"${(meter.read.get + meter.write.get) / 1e6}%6.0f MB " +
        f"($nIvf rows)")
      e.unpersist()
    }
    spark.stop()
  }
}
