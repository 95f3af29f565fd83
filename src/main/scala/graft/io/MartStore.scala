package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Cross-table atomic publish: the multi-table answer to
  * [[VersionedStore]]'s single-table commits. The reference's mart
  * rebuild truncate-loads 11 tables one by one
  * (`transformation_dw.py:122-334`) — a reader querying mid-rebuild
  * sees some tables new and some old. Here a publish writes every
  * table's next version dir UNCOMMITTED, then lands ONE small commit
  * marker naming all (table → version) pairs:
  *
  * Layout: `<storeDir>/<table>/_v_<N>/data/` (immutable data, no
  * per-table marker — visibility is gated solely by the mart commit)
  * + `<storeDir>/_commits/_c_<M>` (one-line JSON
  * `{"mart_version":M,"batch_id":"…","tables":{"t1":3,"t2":7}}`).
  *
  * THE COMMIT POINT is the completed write of `_c_<M>` — a single
  * small object PUT covering ALL tables at once. A reader resolves a
  * [[Snapshot]] from the highest valid marker ONCE and reads every
  * table through it, so it observes one consistent table-set by
  * construction: there is no interleaving in which it can see table A
  * from commit M and table B from commit M-1. A marker that is empty
  * or unparsable reads as not-committed (same crash-window reasoning
  * as [[VersionedStore]]'s `markerCommitted`).
  *
  * Crash windows (single publisher per store):
  *   - dies after writing some tables' version dirs, before the
  *     marker → readers unaffected (old marker still current); the
  *     orphaned dirs are swept by the next publish;
  *   - dies after the marker, before prune → the commit IS durable;
  *     stale markers/versions prune on the next publish;
  *   - the publish batch is REPLAYED → `batchId` dedup against every
  *     retained commit: acknowledged, no new versions.
  *
  * A publish may cover a SUBSET of tables: unlisted tables carry
  * forward at their current version in the new marker (the
  * incremental form — rebuild 2 of 11 tables, commit all 11
  * consistently). Old commits are kept `keepCommits` deep; version
  * dirs referenced by NO retained commit are pruned with them.
  *
  * CONCURRENT PUBLISHERS: the design assumes one publisher per store,
  * but a second one must fail LOUDLY, never corrupt. Two racing
  * publishers compute the same next commit number; who wins depends
  * on the filesystem's `create(path, overwrite = false)`:
  *   - HDFS/local: atomic create-if-absent — the second create
  *     throws, and publishAll surfaces it as
  *     [[ConcurrentPublishException]];
  *   - object stores: create is a blind PUT with last-writer-wins —
  *     NOT atomic, both "succeed". publishAll therefore re-reads the
  *     marker it just wrote and checks the embedded per-publish
  *     `publisher` nonce; a mismatch means this publish was
  *     overwritten and it throws [[ConcurrentPublishException]].
  * Either way exactly one publisher's marker survives as commit N and
  * the loser's uncommitted version dirs are swept by the next
  * publish. The loser's caller retries: if its batch carried a
  * `batchId` and the winner was a replay of the same batch, the retry
  * dedups and acknowledges; otherwise it lands as commit N+1. The
  * post-PUT verification closes the race to the PUT-to-read window —
  * on stores with read-after-write consistency (S3 since 2020) the
  * overwrite is detected; a store without even that needs an external
  * lease, which no marker protocol can replace. */
/** A concurrent publisher won the commit race (MartStore scaladoc,
  * "CONCURRENT PUBLISHERS"): nothing from this publish is visible;
  * the store is exactly as the winner left it. Retry the publish —
  * a same-`batchId` winner dedups the retry into an acknowledge. */
final class ConcurrentPublishException(message: String)
  extends RuntimeException(message)

object MartStore {
  private val CommitsDir = "_commits"
  private val CPrefix = "_c_"
  private val VerPrefix = "_v_"

  private def vname(v: Long): String = f"$VerPrefix$v%07d"

  private def fsFor(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** One resolved, immutable view of the whole store: every
    * `readTable` against the same snapshot reads from the same mart
    * commit — the all-or-nothing reader contract. */
  case class Snapshot(version: Long, batchId: Option[String],
                      tables: Map[String, Long], storeDir: String) {
    def readTable(spark: SparkSession, table: String): DataFrame = {
      val v = tables.getOrElse(table,
        throw new java.util.NoSuchElementException(
          s"table $table not in mart commit $version"))
      spark.read.parquet(s"$storeDir/$table/${vname(v)}/data")
    }
  }

  private def readMarkerText(fs: org.apache.hadoop.fs.FileSystem,
                             p: org.apache.hadoop.fs.Path)
      : Option[String] =
    try {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    } catch { case _: java.io.IOException => None }

  private def parseMarker(txt: String)
      : Option[(Long, Option[String], Map[String, Long])] =
    """"mart_version":(\d+)""".r.findFirstMatchIn(txt).map { m =>
      val batch = """"batch_id":"([^"]*)"""".r.findFirstMatchIn(txt)
        .map(_.group(1)).filter(_.nonEmpty)
      val body = """"tables":\{([^}]*)\}""".r.findFirstMatchIn(txt)
        .map(_.group(1)).getOrElse("")
      val tables = """"([^"]+)":(\d+)""".r.findAllMatchIn(body)
        .map(g => g.group(1) -> g.group(2).toLong).toMap
      (m.group(1).toLong, batch, tables)
    }

  /** Every VALID commit marker, ascending. An empty or unparsable
    * marker file (crash mid-write) is skipped — not committed. */
  private def commits(spark: SparkSession, storeDir: String)
      : Seq[(Long, org.apache.hadoop.fs.Path,
             (Long, Option[String], Map[String, Long]))] = {
    val dir = new org.apache.hadoop.fs.Path(s"$storeDir/$CommitsDir")
    val fs = fsFor(spark, storeDir)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith(CPrefix))
      .flatMap { s =>
        s.getPath.getName.stripPrefix(CPrefix).toLongOption.flatMap { n =>
          val in = fs.open(s.getPath)
          val txt = try scala.io.Source.fromInputStream(in, "UTF-8")
            .mkString finally in.close()
          parseMarker(txt).filter(_._1 == n).map(p => (n, s.getPath, p))
        }
      }
      .sortBy(_._1)
  }

  def snapshot(spark: SparkSession, storeDir: String): Option[Snapshot] =
    commits(spark, storeDir).lastOption.map { case (v, _, (_, b, t)) =>
      Snapshot(v, b, t, storeDir)
    }

  /** Batch ids of every retained commit — the replay-detection
    * window, as in [[VersionedStore.appliedBatchIds]]. */
  def appliedBatchIds(spark: SparkSession, storeDir: String): Set[String] =
    commits(spark, storeDir).flatMap(_._3._2).toSet

  private def versionDirs(fs: org.apache.hadoop.fs.FileSystem,
                          troot: org.apache.hadoop.fs.Path)
      : Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(troot)) Nil
    else fs.listStatus(troot).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(VerPrefix))
      .flatMap(s => s.getPath.getName.stripPrefix(VerPrefix).toLongOption
        .map(v => (v, s.getPath)))

  /** PUT the marker with create-if-absent semantics. On an
    * atomic-create filesystem a collision with a concurrent
    * publisher's valid marker surfaces here; on a blind-PUT store
    * both writes "succeed" and the loser is caught by
    * [[verifyOwnMarker]]. Package-visible so MartStoreSpec can drive
    * the PUT/PUT/verify/verify interleaving deterministically. */
  private[graft] def landMarker(fs: org.apache.hadoop.fs.FileSystem,
                                mpath: org.apache.hadoop.fs.Path,
                                marker: String): Unit =
    try {
      val out = fs.create(mpath, false)
      try out.write((marker + "\n").getBytes("UTF-8")) finally out.close()
    } catch {
      case e: java.io.IOException if fs.exists(mpath) &&
          readMarkerText(fs, mpath).flatMap(parseMarker).nonEmpty =>
        // another publisher landed this commit number first and its
        // marker is valid — lost race on an atomic-create filesystem
        throw new ConcurrentPublishException(
          s"commit $mpath was published concurrently " +
            s"(atomic create refused: ${e.getMessage})")
    }

  /** Last-writer-wins detection for stores whose create() is a blind
    * PUT (see scaladoc): the surviving marker must carry OUR nonce,
    * otherwise this publish was overwritten and did not land. */
  private[graft] def verifyOwnMarker(fs: org.apache.hadoop.fs.FileSystem,
                                     mpath: org.apache.hadoop.fs.Path,
                                     nonce: String): Unit = {
    val winner = readMarkerText(fs, mpath).getOrElse("")
    if (!""""publisher":"([^"]*)"""".r.findFirstMatchIn(winner)
        .map(_.group(1)).contains(nonce))
      throw new ConcurrentPublishException(
        s"commit $mpath was overwritten by a concurrent publisher " +
          "between PUT and verify — this publish did not land")
  }

  /** Publish `tables` as one atomic commit: write each table's next
    * version dir, then land the single marker naming every table's
    * version (published ones advance, the rest carry forward).
    * Returns the committed snapshot. Replay-idempotent on `batchId`. */
  def publishAll(spark: SparkSession, tables: Seq[(String, DataFrame)],
                 storeDir: String, batchId: Option[String] = None,
                 keepCommits: Int = 2): Snapshot = {
    if (batchId.exists(appliedBatchIds(spark, storeDir)))
      return snapshot(spark, storeDir).get
    val fs = fsFor(spark, storeDir)
    val cs = commits(spark, storeDir)
    val cur: Map[String, Long] = cs.lastOption.map(_._3._3)
      .getOrElse(Map.empty)
    val referenced: Map[String, Set[Long]] = cs.flatMap(_._3._3.toSeq)
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).toSet }
    val nextC = cs.lastOption.map(_._1 + 1).getOrElse(1L)
    // sweep corpses of a crashed previous publish: unparsable marker
    // files, and published tables' version dirs no commit references
    // (readers never saw either)
    val cdir = new org.apache.hadoop.fs.Path(s"$storeDir/$CommitsDir")
    if (fs.exists(cdir)) {
      val valid = cs.map(_._2.getName).toSet
      fs.listStatus(cdir).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith(CPrefix) &&
          !valid.contains(s.getPath.getName))
        .foreach(s => fs.delete(s.getPath, false))
    }
    tables.foreach { case (name, _) =>
      val troot = new org.apache.hadoop.fs.Path(s"$storeDir/$name")
      versionDirs(fs, troot)
        .filterNot { case (v, _) =>
          referenced.getOrElse(name, Set.empty).contains(v) }
        .foreach { case (_, p) => fs.delete(p, true) }
    }
    // write every table's next version dir — all UNCOMMITTED until
    // the one marker below; a crash anywhere in this loop leaves the
    // store exactly as readers currently see it
    val newVers: Map[String, Long] = tables.map { case (name, df) =>
      val troot = new org.apache.hadoop.fs.Path(s"$storeDir/$name")
      val v = versionDirs(fs, troot).map(_._1).maxOption.getOrElse(0L) + 1
      df.write.mode(SaveMode.Overwrite)
        .parquet(s"$storeDir/$name/${vname(v)}/data")
      name -> v
    }.toMap
    val all = cur ++ newVers
    // ---- the commit point: ONE small object PUT for ALL tables ----
    val body = all.toSeq.sortBy(_._1)
      .map { case (t, v) => s""""$t":$v""" }.mkString(",")
    val nonce = java.util.UUID.randomUUID().toString
    val marker = s"""{"mart_version":$nextC,"batch_id":"${
      batchId.getOrElse("")}","publisher":"$nonce","tables":{$body}}"""
    fs.mkdirs(cdir)
    val mpath = new org.apache.hadoop.fs.Path(cdir, f"$CPrefix$nextC%07d")
    landMarker(fs, mpath, marker)
    verifyOwnMarker(fs, mpath, nonce)
    // post-commit housekeeping — crash-safe to skip or die inside:
    // drop commits beyond the keep window, then version dirs no
    // retained commit references
    val after = commits(spark, storeDir)
    after.filter(_._1 <= nextC - keepCommits)
      .foreach { case (_, p, _) => fs.delete(p, false) }
    val retained = after.filter(_._1 > nextC - keepCommits)
    val live: Map[String, Set[Long]] = retained.flatMap(_._3._3.toSeq)
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).toSet }
    fs.listStatus(new org.apache.hadoop.fs.Path(storeDir)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName != CommitsDir)
      .foreach { tdir =>
        val name = tdir.getPath.getName
        versionDirs(fs, tdir.getPath)
          .filterNot { case (v, _) =>
            live.getOrElse(name, Set.empty).contains(v) }
          .foreach { case (_, p) => fs.delete(p, true) }
      }
    Snapshot(nextC, batchId, all, storeDir)
  }
}
