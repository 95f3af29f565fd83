package graft.queries

import org.apache.spark.sql.SparkSession

/** Shared scratch-dir and build-once fixture-store plumbing for
  * registry queries, factored so the naming/cleanup scheme and the
  * session-cache discipline cannot drift between the queries that
  * need them (dpp/zorder/postings stores, the store-maintenance
  * sequences).
  */
object FixtureStore {

  /** Session-lifetime keyed memoizer for build-once artifacts
    * (snapshot stores, persisted model frames, index fixtures).
    * `map.synchronized { getOrElseUpdate(k, build) }` holds EVERY
    * key hostage to one multi-second build — exactly the
    * parallel-warmup shape the AqeGate fix targets: a concurrent
    * query on a DIFFERENT (session, dir) key would block for the
    * whole build. Here the monitor only installs a per-key lazy
    * cell; the build runs under the CELL's own lock, so same-key
    * callers still build exactly once (and block only on their own
    * key) while different keys never wait on each other. A build
    * that throws leaves the cell unpoisoned — lazy initialization
    * retries on the next force. */
  final class KeyedOnce[K, V] {
    private final class Cell(thunk: () => V) {
      lazy val value: V = thunk()
    }
    private val cells = scala.collection.mutable.Map.empty[K, Cell]
    def apply(key: K)(build: => V): V = {
      val cell = cells.synchronized {
        cells.getOrElseUpdate(key, new Cell(() => build))
      }
      cell.value
    }
  }

  /** The deterministic per-(query, sf-dir) scratch path — exposed
    * separately from [[clearedScratchDir]] because an oracle twin
    * that reads a persisted fixture back (the `bpe_token_count_store`
    * merge table) must compose the SAME path formula at SQL-generation
    * time, and duplicating the formula is how the two sides drift. */
  def scratchDirFor(name: String, d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_q_${name}_" +
      java.lang.Integer.toHexString(d.hashCode)

  /** Deterministic per-(query, sf-dir) scratch dir, cleared on call.
    * Queries that WRITE stores use this so repeated bench executions
    * do not accrete state across runs — each execution owns its
    * batches. */
  def clearedScratchDir(s: SparkSession, name: String,
                        d: String): String = {
    val dir = scratchDirFor(name, d)
    val dp = new org.apache.hadoop.fs.Path(dir)
    dp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(dp, true)
    dir
  }

  private val cache =
    new KeyedOnce[(SparkSession, String, String), String]

  /** Build-once store per (session, query-name, sf-dir): a
    * production store (partitioned fact, clustered table, search
    * index) is written once per corpus snapshot and read many times,
    * so the fixture write is not the query under test — `build` runs
    * only on the first call for a given key. */
  def buildOnce(s: SparkSession, name: String, d: String)
               (build: String => Unit): String =
    cache((s, name, d)) {
      val dir = clearedScratchDir(s, name, d)
      build(dir)
      dir
    }
}
