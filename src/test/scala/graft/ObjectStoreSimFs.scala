package graft

import java.net.URI

import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}

/** Object-store simulation filesystem for the VersionedStore drills:
  * local files under an `objsim://` scheme whose RENAME is literally
  * copy-then-delete (the S3-style semantics that break directory-
  * rename atomicity). Running the full commit protocol — including
  * Spark's FileOutputCommitter internals, which rename task files —
  * on this filesystem proves the protocol's correctness never rests
  * on an atomic rename. */
class ObjectStoreSimFs extends RawLocalFileSystem {
  override def getScheme: String = "objsim"
  override def getUri: URI = URI.create("objsim:///")

  override def rename(src: Path, dst: Path): Boolean = {
    ObjectStoreSimFs.renames.incrementAndGet()
    if (!exists(src)) return false
    // S3-style: a full copy of every byte, then a delete of the
    // source — two separately-failable steps, nothing atomic
    FileUtil.copy(this, src, this, dst, /*deleteSource=*/ true,
      /*overwrite=*/ true, getConf)
  }
}

object ObjectStoreSimFs {
  /** Count of rename calls — the drills assert it is positive, i.e.
    * the copy+delete path was genuinely exercised (by the committer
    * internals), not bypassed. */
  val renames = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Blind-PUT object store for the concurrent-publisher drills:
  * `create(path, overwrite = false)` silently overwrites — S3
  * PutObject semantics, where create-if-absent cannot be expressed
  * and the last writer wins. MartStore's post-PUT nonce verification
  * must catch what this filesystem refuses to. */
class BlindPutSimFs extends RawLocalFileSystem {
  override def getScheme: String = "objput"
  override def getUri: URI = URI.create("objput:///")

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(f, true, bufferSize, replication, blockSize, progress)

  override def create(f: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(f, permission, true, bufferSize, replication,
      blockSize, progress)
}
