package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.io.Staging

/** Store maintenance operations: upsert merge (whole-table and
  * partition-scoped), schema-evolving append, small-file
  * compaction. */
class StoreOpsSpec extends SparkSpec {
  import spark.implicits._

  test("mergeUpsert replaces same-key rows and appends new keys") {
    val store = Files.createTempDirectory("graft-upsert").toString
    Staging.overwriteParquet(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), store, "t")
    val n = Staging.mergeUpsert(spark,
      Seq((2L, "b2"), (3L, "c")).toDF("id", "v"), store, "t", "id")
    assert(n == 3)
    val rows = Staging.readTable(spark, store, "t")
      .as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test("partition-scoped mergeUpsert rewrites only touched partitions") {
    val store = Files.createTempDirectory("graft-upsert-p").toString
    val init = Seq((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2"))
      .toDF("id", "v", "dt")
    Staging.overwritePartitionsDynamic(init, store, "t", Seq("dt"))
    val d2Before = new java.io.File(s"$store/t/dt=d2").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.lastModified).max
    Thread.sleep(1100)
    // update key 2 (partition d1) and introduce key 4 in new d3
    val n = Staging.mergeUpsert(spark,
      Seq((2L, "b2", "d1"), (4L, "d", "d3")).toDF("id", "v", "dt"),
      store, "t", "id", partitionCols = Seq("dt"))
    assert(n == 4)
    val rows = Staging.readTable(spark, store, "t")
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "a", 2L -> "b2", 3L -> "c", 4L -> "d"))
    // untouched d2 partition files were not rewritten
    val d2After = new java.io.File(s"$store/t/dt=d2").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.lastModified).max
    assert(d2After == d2Before, "untouched partition was rewritten")
  }

  test("partition-scoped mergeUpsert refuses to run over a crashed " +
    "swap's backup dir and cleans scaffolding on success") {
    val store = Files.createTempDirectory("graft-upsert-bak").toString
    Staging.overwritePartitionsDynamic(
      Seq((1L, "a", "d1")).toDF("id", "v", "dt"), store, "t", Seq("dt"))
    // simulate a merge that died mid-swap: its backup dir survives
    val bak = new java.io.File(s"$store/__merge_bak_t")
    bak.mkdirs()
    val e = intercept[IllegalArgumentException] {
      Staging.mergeUpsert(spark,
        Seq((2L, "b", "d1")).toDF("id", "v", "dt"),
        store, "t", "id", partitionCols = Seq("dt"))
    }
    assert(e.getMessage.contains("crashed mid-swap"))
    // store untouched by the refused run
    assert(Staging.readTable(spark, store, "t").count() == 1)
    // operator clears the backup → merge proceeds and removes its
    // scaffolding (no __merge_tmp/__merge_bak left behind)
    assert(bak.delete())
    Staging.mergeUpsert(spark,
      Seq((2L, "b", "d1")).toDF("id", "v", "dt"),
      store, "t", "id", partitionCols = Seq("dt"))
    assert(Staging.readTable(spark, store, "t").count() == 2)
    assert(!new java.io.File(s"$store/__merge_bak_t").exists())
    assert(!new java.io.File(s"$store/__merge_tmp_t").exists())
  }

  test("partition-scoped mergeUpsert keeps existing rows when a NEW key " +
    "lands in an EXISTING partition") {
    // regression: `touched` once only collected partitions holding
    // updated store keys, so a partition receiving only brand-new keys
    // was dynamically overwritten with just the new rows, silently
    // deleting its survivors
    val store = Files.createTempDirectory("graft-upsert-newkey").toString
    Staging.overwritePartitionsDynamic(
      Seq((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2"))
        .toDF("id", "v", "dt"), store, "t", Seq("dt"))
    val n = Staging.mergeUpsert(spark,
      Seq((4L, "d", "d2")).toDF("id", "v", "dt"),
      store, "t", "id", partitionCols = Seq("dt"))
    assert(n == 4)
    val rows = Staging.readTable(spark, store, "t")
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
  }

  test("partition-scoped mergeUpsert clears a partition a key moved " +
    "out of (no stale duplicate)") {
    // regression: dynamic overwrite only replaces partitions present
    // in the written data; a partition whose ONLY row was an updated
    // key that moved elsewhere emits nothing and kept its stale files
    val store = Files.createTempDirectory("graft-upsert-move").toString
    Staging.overwritePartitionsDynamic(
      Seq((1L, "a", "d1"), (2L, "b", "d2")).toDF("id", "v", "dt"),
      store, "t", Seq("dt"))
    val n = Staging.mergeUpsert(spark,
      Seq((1L, "a2", "d2")).toDF("id", "v", "dt"),
      store, "t", "id", partitionCols = Seq("dt"))
    assert(n == 2)
    val rows = Staging.readTable(spark, store, "t")
      .select("id", "v", "dt").as[(Long, String, String)].collect().toSet
    assert(rows == Set((1L, "a2", "d2"), (2L, "b", "d2")))
  }

  test("partition-scoped mergeUpsert clears moved-out TIMESTAMP " +
    "partitions (directory-name rendering)") {
    // regression: JVM Timestamp.toString renders '...00:00:00.0' but
    // the directory is the Spark string cast '...00:00:00' — a
    // toString-built delete path missed the stale directory
    val store = Files.createTempDirectory("graft-upsert-ts").toString
    val mk = (s: String) => java.sql.Timestamp.valueOf(s)
    Staging.overwritePartitionsDynamic(
      Seq((1L, "a", mk("2020-01-01 00:00:00")),
        (2L, "b", mk("2020-01-02 00:00:00"))).toDF("id", "v", "ts"),
      store, "t", Seq("ts"))
    Staging.mergeUpsert(spark,
      Seq((1L, "a2", mk("2020-01-02 00:00:00"))).toDF("id", "v", "ts"),
      store, "t", "id", partitionCols = Seq("ts"))
    val rows = Staging.readTable(spark, store, "t")
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "a2", 2L -> "b"))
  }

  test("deleteKeys removes ids; partition-scoped form rewrites only " +
    "partitions holding a doomed key") {
    val store = Files.createTempDirectory("graft-del").toString
    // whole-table form
    Staging.overwriteParquet(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), store, "t")
    val n = Staging.deleteKeys(spark, Seq(2L).toDF("id"), store, "t", "id")
    assert(n == 2)
    assert(Staging.readTable(spark, store, "t")
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // partition-scoped: d2 holds no doomed key → files untouched
    val init = Seq((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2"))
      .toDF("id", "v", "dt")
    Staging.overwritePartitionsDynamic(init, store, "p", Seq("dt"))
    val d2Before = new java.io.File(s"$store/p/dt=d2").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.lastModified).max
    Thread.sleep(1100)
    val n2 = Staging.deleteKeys(spark, Seq(1L).toDF("id"), store, "p",
      "id", partitionCols = Seq("dt"))
    assert(n2 == 2)
    val d2After = new java.io.File(s"$store/p/dt=d2").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.lastModified).max
    assert(d2After == d2Before, "untouched partition was rewritten")
    // deleting EVERY key of a partition clears its directory
    Staging.deleteKeys(spark, Seq(3L).toDF("id"), store, "p",
      "id", partitionCols = Seq("dt"))
    assert(!new java.io.File(s"$store/p/dt=d2").exists())
    assert(Staging.readTable(spark, store, "p")
      .select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("partition-scoped deleteKeys keeps non-doomed rows of a " +
    "NULL-valued partition") {
    // regression: the survivor semi-join on partitionCols used
    // null-UNSAFE equality, so no row of the NULL partition
    // (__HIVE_DEFAULT_PARTITION__) ever reached `kept` — the swap then
    // displaced the whole directory and dropped the backup, deleting
    // rows that were never in the doomed set
    val store = Files.createTempDirectory("graft-del-nullpart").toString
    val init = Seq((1L, "a", Some("d1")), (3L, "c", None), (4L, "d", None))
      .toDF("id", "v", "dt")
    Staging.overwritePartitionsDynamic(init, store, "p", Seq("dt"))
    val n = Staging.deleteKeys(spark, Seq(3L).toDF("id"), store, "p",
      "id", partitionCols = Seq("dt"))
    assert(n == 2)
    val rows = Staging.readTable(spark, store, "p")
      .select("id", "dt").as[(Long, Option[String])].collect().toSet
    assert(rows == Set((1L, Some("d1")), (4L, None)))
  }

  test("deleteKeys that empties the table leaves it readable; missing " +
    "table is a no-op") {
    // regression: deleting the last row of every partition left a dir
    // with only _SUCCESS → later reads threw 'Unable to infer schema'
    val store = Files.createTempDirectory("graft-del-all").toString
    Staging.overwritePartitionsDynamic(
      Seq((1L, "a", "d1"), (2L, "b", "d2")).toDF("id", "v", "dt"),
      store, "p", Seq("dt"))
    val n = Staging.deleteKeys(spark, Seq(1L, 2L).toDF("id"), store, "p",
      "id", partitionCols = Seq("dt"))
    assert(n == 0)
    val emptied = Staging.readTable(spark, store, "p")
    assert(emptied.count() == 0)
    assert(emptied.columns.toSet == Set("id", "v", "dt"))
    // a table that was never created is "nothing to delete", not an error
    assert(Staging.deleteKeys(spark, Seq(1L).toDF("id"), store,
      "never_created", "id") == 0L)
  }

  test("schema-evolving append surfaces new columns as NULL on old rows") {
    val store = Files.createTempDirectory("graft-evolve").toString
    Staging.appendParquetEvolving(
      Seq((1L, "a")).toDF("id", "v"), store, "t")
    Staging.appendParquetEvolving(
      Seq((2L, "b", 0.5)).toDF("id", "v", "score"), store, "t")
    val out = Staging.readTableEvolved(spark, store, "t")
    assert(out.columns.toSet == Set("id", "v", "score"))
    val byId = out.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("score")))
    assert(byId(2L).getAs[Double]("score") == 0.5)
  }

  test("dropPartitions removes matching partitions without a scan") {
    val store = Files.createTempDirectory("graft-retention").toString
    val df = Seq((1L, "2024-01-01"), (2L, "2024-02-01"), (3L, "2024-03-01"))
      .toDF("id", "dt")
    Staging.overwritePartitionsDynamic(df, store, "t", Seq("dt"))
    val dropped = Staging.dropPartitions(spark, store, "t", "dt",
      _ < "2024-02-15")
    assert(dropped.sorted == Seq("2024-01-01", "2024-02-01"))
    val rest = Staging.readTable(spark, store, "t")
      .select("id").as[Long].collect().toSeq
    assert(rest == Seq(3L))
  }

  test("compactTable collapses many small files into few, same rows") {
    val store = Files.createTempDirectory("graft-compact").toString
    // 40 appends of 10 rows → ≥40 files
    (1 to 40).foreach { i =>
      Staging.appendParquet(
        (1 to 10).map(j => (i * 100L + j, s"v$i-$j")).toDF("id", "v"),
        store, "t")
    }
    def files() = new java.io.File(s"$store/t").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files() >= 40)
    val before = Staging.readTable(spark, store, "t")
      .as[(Long, String)].collect().toSet
    Staging.compactTable(spark, store, "t", targetFileMB = 128)
    assert(files() <= 4, s"still ${files()} files")
    val after = Staging.readTable(spark, store, "t")
      .as[(Long, String)].collect().toSet
    assert(after == before)
  }

  // ---------------------------------------------------------------
  // Crash-window drills: a rename FAILS mid-swap (via the test-only
  // Staging.renameFailpoint, simulating Hadoop's `false` return) and
  // the documented invariant must hold — every touched partition's
  // data sits in exactly one recoverable state (store-new, or
  // store-old, or bak-old + tmp-new), no partition mixes old and new
  // rows, untouched partitions are untouched, and moving the backup
  // partitions back restores the exact pre-operation table.
  // ---------------------------------------------------------------

  /** (id, v) rows of one partition of store/t, by dt value. */
  private def partRows(store: String, dt: String): Set[(Long, String)] = {
    val dir = new java.io.File(s"$store/t/dt=$dt")
    if (!dir.exists()) Set.empty
    else spark.read.parquet(dir.toString)
      .select("id", "v").as[(Long, String)].collect().toSet
  }

  /** Roll the interrupted swap BACK: restore displaced partitions
    * from the backup dir, drop the scaffolding. */
  private def rollBack(store: String): Unit = {
    val bak = new java.io.File(s"$store/__merge_bak_t")
    Option(bak.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("dt="))
      .foreach { p =>
        val dst = new java.io.File(s"$store/t/${p.getName}")
        if (dst.exists()) {
          dst.listFiles().foreach(_.delete()); dst.delete()
        }
        assert(p.renameTo(dst), s"rollback of ${p.getName} failed")
      }
    def rmr(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmr)
      f.delete()
    }
    rmr(bak); rmr(new java.io.File(s"$store/__merge_tmp_t"))
  }

  test("mergeUpsert swap interrupted by a failed rename leaves every " +
    "partition old XOR new and rolls back to the pre-merge table") {
    val store = Files.createTempDirectory("graft-crash-merge").toString
    val initial = Set((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2"),
      (4L, "d", "d3"), (9L, "z", "d9"))
    Staging.overwritePartitionsDynamic(
      initial.toSeq.toDF("id", "v", "dt"), store, "t", Seq("dt"))
    val d9Before = new java.io.File(s"$store/t/dt=d9").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.lastModified).max
    val olds = Map(
      "d1" -> Set(1L -> "a", 2L -> "b"), "d2" -> Set(3L -> "c"),
      "d3" -> Set(4L -> "d"))
    val news = Map(
      "d1" -> Set(1L -> "a", 2L -> "b2"), "d2" -> Set(3L -> "c2"),
      "d3" -> Set(4L -> "d2"))
    // fail the store-ward rename of partition d2 (not its backup move)
    Staging.renameFailpoint =
      dst => dst.endsWith("/t/dt=d2")
    try {
      val e = intercept[java.io.IOException] {
        Staging.mergeUpsert(spark,
          Seq((2L, "b2", "d1"), (3L, "c2", "d2"), (4L, "d2", "d3"))
            .toDF("id", "v", "dt"),
          store, "t", "id", partitionCols = Seq("dt"))
      }
      assert(e.getMessage.contains("merge aborted"))
    } finally Staging.renameFailpoint = null
    // the staged new state is complete and durable in the temp dir
    assert(new java.io.File(s"$store/__merge_tmp_t/_SUCCESS").exists())
    // every touched partition sits in exactly one recoverable state
    // (a swapped partition's new dir was MOVED from tmp into the
    // store, so tmp only holds not-yet-swapped partitions):
    //   swapped:      store=new, bak=old
    //   not reached:  store=old, tmp=new
    //   failed mid:   store gone, bak=old, tmp=new
    // — and never a mix of old and new rows in one partition
    Seq("d1", "d2", "d3").foreach { dt =>
      def rowsAt(dir: String): Set[(Long, String)] = {
        val f = new java.io.File(dir)
        if (!f.exists()) Set.empty
        else spark.read.parquet(dir)
          .select("id", "v").as[(Long, String)].collect().toSet
      }
      val inStore = partRows(store, dt)
      val inBak = rowsAt(s"$store/__merge_bak_t/dt=$dt")
      val inTmp = rowsAt(s"$store/__merge_tmp_t/dt=$dt")
      if (inStore == news(dt))
        assert(inBak == olds(dt), s"$dt swapped but backup holds $inBak")
      else if (inStore == olds(dt))
        assert(inTmp == news(dt), s"$dt unswapped but temp holds $inTmp")
      else {
        assert(inStore.isEmpty, s"$dt mixes old and new rows: $inStore")
        assert(inBak == olds(dt) && inTmp == news(dt),
          s"$dt lost from store; bak=$inBak tmp=$inTmp")
      }
    }
    // untouched partition: same files, untouched
    val d9After = new java.io.File(s"$store/t/dt=d9").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.lastModified).max
    assert(d9After == d9Before)
    // operator rollback from the backup restores the pre-merge table
    rollBack(store)
    val restored = Staging.readTable(spark, store, "t")
      .select("id", "v", "dt").as[(Long, String, String)].collect().toSet
    assert(restored == initial)
  }

  test("deleteKeys swap interrupted by a failed displacement leaves " +
    "the doomed partition intact and re-runs to completion after " +
    "rollback") {
    val store = Files.createTempDirectory("graft-crash-del").toString
    val initial = Set((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2"),
      (4L, "d", "d3"))
    Staging.overwritePartitionsDynamic(
      initial.toSeq.toDF("id", "v", "dt"), store, "t", Seq("dt"))
    // keys 2 (mixed partition d1) and 3 (all of d2): d1 re-emits its
    // survivor, d2 empties and is DISPLACED to backup — fail that
    // displacement (dst under the backup dir)
    Staging.renameFailpoint =
      dst => dst.contains("__merge_bak_t") && dst.endsWith("dt=d2")
    try {
      intercept[java.io.IOException] {
        Staging.deleteKeys(spark, Seq(2L, 3L).toDF("id"),
          store, "t", "id", partitionCols = Seq("dt"))
      }
    } finally Staging.renameFailpoint = null
    // d2's displacement failed BEFORE its rename: still whole in store
    assert(partRows(store, "d2") == Set(3L -> "c"))
    // d1 was already swapped (new in store, old in backup) — old XOR
    // new, both recoverable
    assert(partRows(store, "d1") == Set(1L -> "a"))
    assert(spark.read.parquet(s"$store/__merge_bak_t/dt=d1")
      .select("id", "v").as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 2L -> "b"))
    // untouched d3 intact
    assert(partRows(store, "d3") == Set(4L -> "d"))
    // rollback restores the exact pre-delete table, then the re-run
    // completes and clears its scaffolding
    rollBack(store)
    assert(Staging.readTable(spark, store, "t")
      .select("id", "v", "dt").as[(Long, String, String)]
      .collect().toSet == initial)
    val n = Staging.deleteKeys(spark, Seq(2L, 3L).toDF("id"),
      store, "t", "id", partitionCols = Seq("dt"))
    assert(n == 2)
    assert(Staging.readTable(spark, store, "t")
      .select("id", "v", "dt").as[(Long, String, String)]
      .collect().toSet == Set((1L, "a", "d1"), (4L, "d", "d3")))
    assert(!new java.io.File(s"$store/__merge_bak_t").exists())
    assert(!new java.io.File(s"$store/__merge_tmp_t").exists())
  }

  // ---------------------------------------------------------------
  // VersionedStore: the object-store-atomic commit protocol
  // ---------------------------------------------------------------
  import graft.io.VersionedStore

  private def committedVersions(store: String, table: String): Seq[String] =
    new java.io.File(s"$store/$table").listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("_v_") &&
        new java.io.File(f, "_COMMIT").exists())
      .map(_.getName).sorted

  test("versioned store: commit/upsert/delete roundtrip, pruned to the " +
    "keep window") {
    val store = Files.createTempDirectory("graft-vs").toString
    VersionedStore.commit(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), store, "t", Some("b1"))
    assert(VersionedStore.readTable(spark, store, "t")
      .as[(Long, String)].collect().toMap == Map(1L -> "a", 2L -> "b"))
    val n2 = VersionedStore.mergeUpsert(spark,
      Seq((2L, "b2"), (3L, "c")).toDF("id", "v"), store, "t", "id",
      Some("b2"))
    assert(n2 == 3)
    val n3 = VersionedStore.deleteKeys(spark, Seq(1L).toDF("id"),
      store, "t", "id", Some("b3"))
    assert(n3 == 2)
    assert(VersionedStore.readTable(spark, store, "t")
      .as[(Long, String)].collect().toMap ==
      Map(2L -> "b2", 3L -> "c"))
    // keepVersions = 2: current + previous survive, older pruned
    assert(committedVersions(store, "t") ==
      Seq("_v_0000002", "_v_0000003"))
  }

  test("versioned store: a replayed batch is acknowledged without a " +
    "new version (exactly-once across crash-and-retry)") {
    val store = Files.createTempDirectory("graft-vs-replay").toString
    VersionedStore.commit(spark, Seq((1L, 10L)).toDF("id", "x"),
      store, "t", Some("b1"))
    VersionedStore.mergeUpsert(spark, Seq((1L, 11L)).toDF("id", "x"),
      store, "t", "id", Some("b2"))
    val before = committedVersions(store, "t")
    // an at-least-once driver re-delivers batch b2 after a crash: the
    // upsert must be a no-op ack, not a re-fold
    val n = VersionedStore.mergeUpsert(spark,
      Seq((1L, 11L)).toDF("id", "x"), store, "t", "id", Some("b2"))
    assert(n == 1)
    assert(committedVersions(store, "t") == before)
    assert(VersionedStore.readTable(spark, store, "t")
      .as[(Long, Long)].collect().toSeq == Seq(1L -> 11L))
    assert(VersionedStore.lastBatchId(spark, store, "t") == Some("b2"))
  }

  test("versioned store: a writer that died mid-write is invisible to " +
    "readers and cleared by the next commit") {
    val store = Files.createTempDirectory("graft-vs-crash").toString
    VersionedStore.commit(spark, Seq((1L, "a")).toDF("id", "v"),
      store, "t", Some("b1"))
    // simulate a crash during a later version's data write: the dir
    // exists, holds partial garbage, and has NO _COMMIT marker
    val dead = new java.io.File(s"$store/t/_v_0000009/data")
    dead.mkdirs()
    java.nio.file.Files.write(dead.toPath.resolve("part-garbage"),
      "not parquet".getBytes)
    // readers resolve the last COMMITTED version, never the corpse
    assert(VersionedStore.readTable(spark, store, "t")
      .as[(Long, String)].collect().toSeq == Seq(1L -> "a"))
    // the next commit clears the corpse and numbers itself above it
    VersionedStore.commit(spark, Seq((2L, "b")).toDF("id", "v"),
      store, "t", Some("b2"))
    assert(!new java.io.File(s"$store/t/_v_0000009").exists())
    assert(committedVersions(store, "t").last == "_v_0000010")
    assert(VersionedStore.readTable(spark, store, "t")
      .as[(Long, String)].collect().toSeq == Seq(2L -> "b"))
  }

  test("versioned store: death after the marker, before manifest/prune, " +
    "is a durable commit") {
    val store = Files.createTempDirectory("graft-vs-marker").toString
    VersionedStore.commit(spark, Seq((1L, "a")).toDF("id", "v"),
      store, "t", Some("b1"))
    VersionedStore.commit(spark, Seq((2L, "b")).toDF("id", "v"),
      store, "t", Some("b2"))
    // simulate the post-marker crash: advisory manifest is gone
    assert(new java.io.File(s"$store/t/_MANIFEST").delete())
    // resolution lists markers, so the commit is still visible
    assert(VersionedStore.readTable(spark, store, "t")
      .as[(Long, String)].collect().toSeq == Seq(2L -> "b"))
    assert(VersionedStore.lastBatchId(spark, store, "t") == Some("b2"))
    // the next commit restores the advisory pointer
    VersionedStore.commit(spark, Seq((3L, "c")).toDF("id", "v"),
      store, "t", Some("b3"))
    assert(new java.io.File(s"$store/t/_MANIFEST").exists())
  }

  // ---------------------------------------------------------------
  // Partition-granular versions: _PARTS manifests, carry-forward by
  // reference, owner-aware pruning, compaction
  // ---------------------------------------------------------------

  /** (name, length, mtime) of one partition's parquet files inside one
    * version dir — byte-identity proxy for "never rewritten". */
  private def vPartFiles(store: String, table: String, v: String,
                         part: String): Set[(String, Long, Long)] = {
    val dir = new java.io.File(s"$store/$table/$v/data/$part")
    if (!dir.exists()) Set.empty
    else dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length, f.lastModified)).toSet
  }

  test("partitioned versioned store: upsert writes only touched " +
    "partitions — untouched partition files carry forward byte-identical") {
    val store = Files.createTempDirectory("graft-vsp").toString
    VersionedStore.commitPartitioned(spark,
      Seq((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2"),
        (9L, "z", "d9")).toDF("id", "v", "dt"),
      store, "t", "dt", Some("b1"))
    val d2Before = vPartFiles(store, "t", "_v_0000001", "dt=d2")
    val d9Before = vPartFiles(store, "t", "_v_0000001", "dt=d9")
    assert(d2Before.nonEmpty && d9Before.nonEmpty)
    // update key 2 (partition d1) + new key 4 in brand-new d3
    val n = VersionedStore.mergeUpsertPartitioned(spark,
      Seq((2L, "b2", "d1"), (4L, "d", "d3")).toDF("id", "v", "dt"),
      store, "t", "id", "dt", Some("b2"))
    assert(n == 5)
    assert(VersionedStore.readTable(spark, store, "t")
      .select("id", "v").as[(Long, String)].collect().toMap ==
      Map(1L -> "a", 2L -> "b2", 3L -> "c", 4L -> "d", 9L -> "z"))
    // the new version's data dir holds ONLY the touched partitions
    val v2parts = new java.io.File(s"$store/t/_v_0000002/data")
      .listFiles().filter(_.getName.contains("=")).map(_.getName).toSet
    assert(v2parts == Set("dt=d1", "dt=d3"))
    // untouched partitions: the exact same files, in the OLD owner dir
    assert(vPartFiles(store, "t", "_v_0000001", "dt=d2") == d2Before,
      "untouched partition d2 was rewritten")
    assert(vPartFiles(store, "t", "_v_0000001", "dt=d9") == d9Before,
      "untouched partition d9 was rewritten")
  }

  test("partitioned versioned store: delete rewrites only partitions " +
    "holding a doomed key; an emptied partition drops from the " +
    "manifest; replay is an ack") {
    val store = Files.createTempDirectory("graft-vsp-del").toString
    VersionedStore.commitPartitioned(spark,
      Seq((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2"),
        (4L, "d", "d3")).toDF("id", "v", "dt"),
      store, "t", "dt", Some("b1"))
    val d3Before = vPartFiles(store, "t", "_v_0000001", "dt=d3")
    // key 2 (mixed d1) and key 3 (all of d2)
    val n = VersionedStore.deleteKeysPartitioned(spark,
      Seq(2L, 3L).toDF("id"), store, "t", "id", Some("b2"))
    assert(n == 2)
    assert(VersionedStore.readTable(spark, store, "t")
      .select("id", "v", "dt").as[(Long, String, String)]
      .collect().toSet == Set((1L, "a", "d1"), (4L, "d", "d3")))
    // only d1 was rewritten; d3 carried forward in place
    val v2parts = new java.io.File(s"$store/t/_v_0000002/data")
      .listFiles().filter(_.getName.contains("=")).map(_.getName).toSet
    assert(v2parts == Set("dt=d1"))
    assert(vPartFiles(store, "t", "_v_0000001", "dt=d3") == d3Before)
    // crash-retry replay of the delete batch: ack, no new version
    val before = committedVersions(store, "t")
    val nReplay = VersionedStore.deleteKeysPartitioned(spark,
      Seq(2L, 3L).toDF("id"), store, "t", "id", Some("b2"))
    assert(nReplay == 2 && committedVersions(store, "t") == before)
  }

  test("partitioned versioned store: pruning never deletes a version " +
    "dir still owning live partitions; compaction rebases and frees it") {
    val store = Files.createTempDirectory("graft-vsp-prune").toString
    VersionedStore.commitPartitioned(spark,
      Seq((1L, "a", "d1"), (3L, "c", "d2")).toDF("id", "v", "dt"),
      store, "t", "dt", Some("b1"))
    // two more versions touching ONLY d1: v1 ages past keepVersions=2
    // but still owns live d2 — it must survive the prune
    VersionedStore.mergeUpsertPartitioned(spark,
      Seq((1L, "a2", "d1")).toDF("id", "v", "dt"),
      store, "t", "id", "dt", Some("b2"))
    VersionedStore.mergeUpsertPartitioned(spark,
      Seq((1L, "a3", "d1")).toDF("id", "v", "dt"),
      store, "t", "id", "dt", Some("b3"))
    assert(committedVersions(store, "t")
      .contains("_v_0000001"), "live partition owner was pruned")
    assert(VersionedStore.readTable(spark, store, "t")
      .select("id", "v").as[(Long, String)].collect().toMap ==
      Map(1L -> "a3", 3L -> "c"))
    // compaction rebases every partition onto a fresh snapshot (v4);
    // after one more commit the v3 manifest ages out and v1 unprunes
    VersionedStore.compactPartitioned(spark, store, "t", Some("b4"))
    VersionedStore.mergeUpsertPartitioned(spark,
      Seq((1L, "a4", "d1")).toDF("id", "v", "dt"),
      store, "t", "id", "dt", Some("b5"))
    assert(!committedVersions(store, "t").contains("_v_0000001"),
      "compaction should have freed the aged owner dir")
    assert(VersionedStore.readTable(spark, store, "t")
      .select("id", "v").as[(Long, String)].collect().toMap ==
      Map(1L -> "a4", 3L -> "c"))
  }

  test("partitioned versioned store: NULL partition rows survive " +
    "partition-scoped operations (manifest dir-name rendering)") {
    val store = Files.createTempDirectory("graft-vsp-null").toString
    VersionedStore.commitPartitioned(spark,
      Seq((1L, "a", Some("d1")), (3L, "c", None), (4L, "d", None))
        .toDF("id", "v", "dt"),
      store, "t", "dt", Some("b1"))
    // delete a key living in the NULL partition: its survivor must be
    // re-emitted, the d1 partition carried forward untouched
    val n = VersionedStore.deleteKeysPartitioned(spark,
      Seq(3L).toDF("id"), store, "t", "id", Some("b2"))
    assert(n == 2)
    assert(VersionedStore.readTable(spark, store, "t")
      .select("id", "dt").as[(Long, Option[String])].collect().toSet ==
      Set((1L, Some("d1")), (4L, None)))
    val v2parts = new java.io.File(s"$store/t/_v_0000002/data")
      .listFiles().filter(_.getName.contains("=")).map(_.getName).toSet
    assert(v2parts == Set("dt=__HIVE_DEFAULT_PARTITION__"))
  }

  test("partitioned versioned store: a writer that died after data+" +
    "manifest but before the marker is invisible and swept; the " +
    "emptied-table edge keeps a readable schema") {
    val store = Files.createTempDirectory("graft-vsp-crash").toString
    VersionedStore.commitPartitioned(spark,
      Seq((1L, "a", "d1")).toDF("id", "v", "dt"),
      store, "t", "dt", Some("b1"))
    // corpse: data AND _PARTS landed, _COMMIT did not — the version
    // must be invisible (commit point not reached) and swept later
    val dead = new java.io.File(s"$store/t/_v_0000005/data/dt=d9")
    dead.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(dead.getParentFile.getParentFile, "_PARTS")
        .toPath, "#partcol=dt\tstring\n5\tdt=d9\n".getBytes)
    assert(VersionedStore.readTable(spark, store, "t")
      .select("id").as[Long].collect().toSeq == Seq(1L))
    // deleting every key empties the table: schema must survive
    val n = VersionedStore.deleteKeysPartitioned(spark,
      Seq(1L).toDF("id"), store, "t", "id", Some("b2"))
    assert(n == 0)
    assert(!new java.io.File(s"$store/t/_v_0000005").exists(),
      "uncommitted corpse not swept")
    val emptied = VersionedStore.readTable(spark, store, "t")
    assert(emptied.count() == 0)
    assert(emptied.columns.toSet == Set("id", "v", "dt"))
    // repopulating an emptied (plain) table re-snapshots partitioned
    VersionedStore.mergeUpsertPartitioned(spark,
      Seq((5L, "e", "d2")).toDF("id", "v", "dt"),
      store, "t", "id", "dt", Some("b3"))
    assert(VersionedStore.readTable(spark, store, "t")
      .select("id", "v", "dt").as[(Long, String, String)]
      .collect().toSeq == Seq((5L, "e", "d2")))
  }

  test("partitioned versioned store: full protocol on the copy+delete-" +
    "rename object-store simulation") {
    spark.sparkContext.hadoopConfiguration.set("fs.objsim.impl",
      classOf[ObjectStoreSimFs].getName)
    val local = Files.createTempDirectory("graft-vsp-objsim").toString
    val store = s"objsim://$local"
    ObjectStoreSimFs.renames.set(0)
    VersionedStore.commitPartitioned(spark,
      Seq((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2"))
        .toDF("id", "v", "dt"),
      store, "t", "dt", Some("b1"))
    VersionedStore.mergeUpsertPartitioned(spark,
      Seq((2L, "b2", "d1")).toDF("id", "v", "dt"),
      store, "t", "id", "dt", Some("b2"))
    VersionedStore.deleteKeysPartitioned(spark, Seq(1L).toDF("id"),
      store, "t", "id", Some("b3"))
    // replay after a simulated crash-and-retry
    val n = VersionedStore.deleteKeysPartitioned(spark,
      Seq(1L).toDF("id"), store, "t", "id", Some("b3"))
    assert(n == 2)
    assert(VersionedStore.readTable(spark, store, "t")
      .select("id", "v").as[(Long, String)].collect().toMap ==
      Map(2L -> "b2", 3L -> "c"))
    // untouched d2 still owned by (and physically inside) version 1
    assert(vPartFiles(local, "t", "_v_0000001", "dt=d2").nonEmpty)
    assert(ObjectStoreSimFs.renames.get() > 0,
      "no renames observed — the objsim scheme was not actually used")
  }

  test("versioned store: full protocol on a filesystem whose rename is " +
    "copy+delete (object-store simulation)") {
    spark.sparkContext.hadoopConfiguration.set("fs.objsim.impl",
      classOf[ObjectStoreSimFs].getName)
    val local = Files.createTempDirectory("graft-vs-objsim").toString
    val store = s"objsim://$local"
    ObjectStoreSimFs.renames.set(0)
    VersionedStore.commit(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), store, "t", Some("b1"))
    VersionedStore.mergeUpsert(spark,
      Seq((2L, "b2"), (3L, "c")).toDF("id", "v"), store, "t", "id",
      Some("b2"))
    VersionedStore.deleteKeys(spark, Seq(1L).toDF("id"), store, "t",
      "id", Some("b3"))
    // replay the delete after a simulated crash-and-retry
    val n = VersionedStore.deleteKeys(spark, Seq(1L).toDF("id"), store,
      "t", "id", Some("b3"))
    assert(n == 2)
    assert(VersionedStore.readTable(spark, store, "t")
      .as[(Long, String)].collect().toMap ==
      Map(2L -> "b2", 3L -> "c"))
    // the committer internals really did route through copy+delete —
    // the protocol was exercised on non-atomic rename, not around it
    assert(ObjectStoreSimFs.renames.get() > 0,
      "no renames observed — the objsim scheme was not actually used")
  }
}
