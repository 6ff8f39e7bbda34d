package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** STORAGE-ADAPTER SEAM for the commit protocol's two atomic primitives
  * — the only operations whose atomicity the [[VersionedTable]] publish
  * protocol depends on. Everything else (data writes, directory moves of
  * PRIVATE staging dirs, marker reads) is plain filesystem work; these
  * two decide races:
  *
  *  - [[StoreAdapter.claim]]: create-if-absent of an empty name — the
  *    version-NUMBER claim (two writers can never own the same number);
  *  - [[StoreAdapter.putIfAbsent]]: create-if-absent WITH CONTENT — the
  *    commit-marker publish, the protocol's linearization point (the
  *    marker's content names the winner's data dir).
  *
  * Which implementation is sound depends on what the store makes atomic:
  *
  *  - HDFS-semantics stores ([[RenameStoreAdapter]]): `create(overwrite
  *    = false)` and rename-onto-existing-file-fails are both NameNode
  *    decisions — publish = write a temp file, move it no-overwrite.
  *  - Local filesystems ([[LocalStoreAdapter]]): Hadoop's local create/
  *    rename are CHECK-THEN-ACT between processes, so drop to the
  *    genuinely atomic syscalls — O_CREAT|O_EXCL claims, link(2)
  *    markers (EEXIST loses), with a documented degraded road for
  *    mounts without hard links.
  *  - Object stores with conditional create
  *    ([[ConditionalPutStoreAdapter]]): rename is copy+delete and
  *    OVERWRITES — the rename adapter's arbitration is UNSOUND there.
  *    But S3-class stores now expose conditional PUT (If-None-Match):
  *    the object body lands atomically-if-absent in ONE operation, so
  *    the marker is published by writing the final object directly —
  *    no temp name, no move. Through Hadoop's FileSystem API that is
  *    `create(path, overwrite = false)` + write + close: on S3A the
  *    object materializes at close() as the conditional PUT, and a
  *    lost race surfaces as FileAlreadyExistsException at create or
  *    close. (S3A: fs.s3a.create.conditional.enabled.)
  *
  * Selection ([[StoreAdapter.forFs]]): per-scheme Hadoop conf
  * `graft.store.adapter.<scheme>` = `rename` | `local` |
  * `conditional-put` (reachable from Spark as
  * `spark.hadoop.graft.store.adapter.s3a=conditional-put`); defaults:
  * `file` → local, everything else → rename. The adapter gates ONLY the
  * two primitives — the rest of the protocol (claim-then-stage-then-
  * publish, dense winner-takes-N numbering) is store-independent. */
trait StoreAdapter {
  def name: String

  /** Atomically create `target` with `content` iff absent. True = this
    * caller published; false = the name was taken (lost race); any
    * other IO failure surfaces. */
  def putIfAbsent(f: FileSystem, target: Path, content: Array[Byte]): Boolean

  /** Atomically claim an empty name. True = owned; false = taken. */
  def claim(f: FileSystem, p: Path): Boolean
}

object StoreAdapter {
  /** Adapter for `f`, resolved from `graft.store.adapter.<scheme>` in
    * the filesystem's conf (absent → local for file://, rename
    * otherwise). */
  def forFs(f: FileSystem): StoreAdapter = {
    val configured = f.getConf.get("graft.store.adapter." + f.getScheme)
    if (configured != null) byName(configured)
    else if (f.getScheme == "file") LocalStoreAdapter
    else RenameStoreAdapter
  }

  def byName(name: String): StoreAdapter = name match {
    case RenameStoreAdapter.name => RenameStoreAdapter
    case LocalStoreAdapter.name => LocalStoreAdapter
    case ConditionalPutStoreAdapter.name => ConditionalPutStoreAdapter
    case other => throw new IllegalArgumentException(
      s"unknown store adapter '$other' — expected one of: " +
        s"${RenameStoreAdapter.name}, ${LocalStoreAdapter.name}, " +
        s"${ConditionalPutStoreAdapter.name}")
  }

  private[sources] def isAlreadyExists(t: Throwable): Boolean = t match {
    case _: org.apache.hadoop.fs.FileAlreadyExistsException => true
    case _: java.nio.file.FileAlreadyExistsException => true
    case _ => false
  }
}

/** HDFS-semantics arbitration: both primitives are NameNode-atomic.
  * Publish = temp file + rename-no-overwrite (rename onto an existing
  * file destination FAILS without overwriting). */
object RenameStoreAdapter extends StoreAdapter {
  val name = "rename"

  override def claim(f: FileSystem, p: Path): Boolean =
    try { f.create(p, false).close(); true }
    catch { case t: Throwable if StoreAdapter.isAlreadyExists(t) => false }

  override def putIfAbsent(
      f: FileSystem, target: Path, content: Array[Byte]): Boolean = {
    val tmp = new Path(target.getParent,
      ".m" + java.util.UUID.randomUUID().toString.take(12) + ".tmp")
    val o = f.create(tmp, true)
    try o.write(content) finally o.close()
    val won = !f.exists(target) &&
      (try f.rename(tmp, target)
       catch { case t: Throwable if StoreAdapter.isAlreadyExists(t) => false })
    if (!won) f.delete(tmp, false)
    won
  }
}

/** Local-filesystem arbitration: Hadoop's RawLocalFileSystem implements
  * create-exclusive and rename as exists-check + act, so two
  * monitor-disjoint SAME-HOST writers could both "win" — drop to the
  * genuinely atomic syscalls instead: O_CREAT|O_EXCL for claims,
  * link(2) for markers (EEXIST = lost; the tmp name is removed win or
  * lose). Mounts without hard-link support (FAT, some NFS/overlay)
  * degrade to exists-precheck + atomic move + CONTENT READBACK — the
  * survivor's content names the winner; a narrow two-writer window
  * remains on such mounts (documented caveat). */
object LocalStoreAdapter extends StoreAdapter {
  val name = "local"

  private def localPath(f: FileSystem, p: Path) =
    java.nio.file.Paths.get(f.makeQualified(p).toUri.getPath)

  override def claim(f: FileSystem, p: Path): Boolean = {
    f.mkdirs(p.getParent)
    try { java.nio.file.Files.createFile(localPath(f, p)); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
  }

  override def putIfAbsent(
      f: FileSystem, target: Path, content: Array[Byte]): Boolean = {
    val tmp = new Path(target.getParent,
      ".m" + java.util.UUID.randomUUID().toString.take(12) + ".tmp")
    val o = f.create(tmp, true)
    try o.write(content) finally o.close()
    val won =
      try {
        java.nio.file.Files.createLink(localPath(f, target), localPath(f, tmp))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException |
             _: java.nio.file.FileSystemException =>
          // link(2) unavailable, not lost: degraded road
          val lt = localPath(f, target)
          if (java.nio.file.Files.exists(lt)) false
          else
            try {
              java.nio.file.Files.move(localPath(f, tmp), lt,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              java.util.Arrays.equals(java.nio.file.Files.readAllBytes(lt), content)
            } catch { case _: java.io.IOException => false }
      }
    f.delete(tmp, false)
    won
  }
}

/** Conditional-create arbitration for stores where RENAME OVERWRITES
  * (object stores: S3-class copy+delete moves) but create-if-absent is
  * atomic WITH ITS CONTENT (S3 conditional PUT, If-None-Match; S3A
  * surfaces it through `create(path, overwrite = false)` with the PUT
  * issued at close()). The marker is written as the final object
  * directly — there is no temp name and no move, so broken rename
  * semantics cannot corrupt the arbitration. A lost race surfaces as
  * FileAlreadyExistsException at create() or at close(), both counted
  * as a clean loss.
  *
  * On plain filesystems this adapter is WEAKER than the rename/local
  * roads (the file exists empty between create and close — a
  * concurrent reader could glimpse a content-less marker, which
  * resolves to the identity dir name); use it only on stores whose
  * create-if-absent is genuinely one atomic operation with the body. */
object ConditionalPutStoreAdapter extends StoreAdapter {
  val name = "conditional-put"

  override def claim(f: FileSystem, p: Path): Boolean =
    putIfAbsent(f, p, Array.emptyByteArray)

  override def putIfAbsent(
      f: FileSystem, target: Path, content: Array[Byte]): Boolean = {
    val out =
      try f.create(target, false)
      catch { case t: Throwable if StoreAdapter.isAlreadyExists(t) => return false }
    try {
      out.write(content)
      out.close()
      true
    } catch {
      case t: Throwable if StoreAdapter.isAlreadyExists(t) => false
      case t: Throwable =>
        // a REAL IO failure mid-write: on an object store nothing
        // materialized (the body lands at close or not at all), but on a
        // plain filesystem the create already made the name — remove the
        // partial file so a torn marker can never be read, then surface
        try f.delete(target, false) catch { case _: Exception => () }
        throw t
    }
  }
}
