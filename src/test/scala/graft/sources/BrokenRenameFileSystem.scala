package graft.sources

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test-only `broken://` filesystem: an OBJECT-STORE-SHAPED local fs
  * that breaks exactly the primitives the rename-based commit
  * arbitration relies on, while providing the one primitive S3-class
  * stores do make atomic:
  *
  *  - `rename` ALWAYS OVERWRITES an existing destination (an object
  *    store's move is copy + delete — no rename-onto-file-fails
  *    semantics to arbitrate with);
  *  - `create(overwrite = false)` is a CONDITIONAL PUT: writes buffer
  *    privately and the object materializes ATOMICALLY WITH ITS CONTENT
  *    at `close()` iff the name is still absent —
  *    FileAlreadyExistsException at close = lost (the S3A
  *    If-None-Match surface).
  *
  * Registered via `fs.broken.impl`; paths are ordinary local paths under
  * the `broken://` scheme, so Spark's parquet IO runs through it
  * unchanged. */
class BrokenRenameFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "broken"
  override def getUri: java.net.URI = java.net.URI.create("broken:///")

  override def rename(src: Path, dst: Path): Boolean = {
    // object-store move semantics: clobber whatever is at the destination
    if (exists(dst)) delete(dst, true)
    super.rename(src, dst)
  }

  private def conditionalCreate(p: Path): FSDataOutputStream = {
    val local = pathToFile(p).toPath
    val buffered = new java.io.ByteArrayOutputStream() {
      override def close(): Unit = {
        super.close()
        if (local.getParent != null)
          java.nio.file.Files.createDirectories(local.getParent)
        // land the buffered body atomically-iff-absent: private temp +
        // link(2) — EEXIST = the conditional PUT lost
        val tmp = java.nio.file.Files.createTempFile(
          local.getParent, ".cput", ".tmp")
        java.nio.file.Files.write(tmp, toByteArray())
        try java.nio.file.Files.createLink(local, tmp)
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            java.nio.file.Files.deleteIfExists(tmp)
            throw new org.apache.hadoop.fs.FileAlreadyExistsException(
              s"conditional put lost: $p already exists")
        }
        java.nio.file.Files.deleteIfExists(tmp)
      }
    }
    new FSDataOutputStream(buffered, null)
  }

  // both public create chains must divert — FileSystem.create(Path,
  // boolean) resolves to the permission-less overload on RawLocal
  override def create(
      p: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    if (overwrite)
      super.create(p, permission, overwrite, bufferSize, replication,
        blockSize, progress)
    else conditionalCreate(p)

  override def create(
      p: Path, overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream =
    if (overwrite)
      super.create(p, overwrite, bufferSize, replication, blockSize, progress)
    else conditionalCreate(p)
}
