package graft.hadoop

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import java.nio.file.{Files, Paths}
import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

/** Local Hadoop FileSystem that never shells out.
  *
  * Without libhadoop, `RawLocalFileSystem.setPermission` execs `chmod` via
  * `org.apache.hadoop.util.Shell` for every file created with explicit
  * permissions — the streaming checkpoint path (HDFSMetadataLog, state store
  * delta files) does exactly that per micro-batch. In sandboxed or
  * container-constrained environments, forking from a large executor JVM is
  * slow-to-hanging, which stalls every streaming commit. This subclass
  * performs the chmod through java.nio instead (same semantics, no fork).
  *
  * Activate with:
  *   spark.hadoop.fs.file.impl = graft.hadoop.ShellFreeLocalFileSystem
  *   spark.sql.streaming.checkpointFileManagerClass =
  *     org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager
  * (the second avoids the FileContext rename path, which shells out for
  * `readlink`).
  */
class ShellFreeRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val perms = new java.util.HashSet[PosixFilePermission]()
    val m = permission.toShort.toInt
    // java.nio can express only the low 9 bits; silently dropping a
    // requested setuid/setgid/sticky bit would also CLEAR it on the target
    // where the chmod path would set it — fail loudly instead (nothing in
    // a Spark checkpoint/warehouse path ever asks for special bits)
    require((m & 0xE00) == 0,
      f"setPermission 0$m%o: setuid/setgid/sticky bits unsupported by the shell-free path")
    if ((m & 0x100) != 0) perms.add(OWNER_READ)
    if ((m & 0x080) != 0) perms.add(OWNER_WRITE)
    if ((m & 0x040) != 0) perms.add(OWNER_EXECUTE)
    if ((m & 0x020) != 0) perms.add(GROUP_READ)
    if ((m & 0x010) != 0) perms.add(GROUP_WRITE)
    if ((m & 0x008) != 0) perms.add(GROUP_EXECUTE)
    if ((m & 0x004) != 0) perms.add(OTHERS_READ)
    if ((m & 0x002) != 0) perms.add(OTHERS_WRITE)
    if ((m & 0x001) != 0) perms.add(OTHERS_EXECUTE)
    Files.setPosixFilePermissions(Paths.get(p.toUri.getPath), perms)
  }
}

class ShellFreeLocalFileSystem extends LocalFileSystem(new ShellFreeRawLocalFileSystem)
