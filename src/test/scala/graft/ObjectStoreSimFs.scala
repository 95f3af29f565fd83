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
