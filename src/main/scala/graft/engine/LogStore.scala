package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}

/** The TxLog COMMIT-POINT PRIMITIVE, extracted behind a seam: publish a
  * fully-written temp manifest as the (immutable) manifest of version v
  * iff no other writer has committed that version — a create-exclusive
  * CAS. Everything else in the format (snapshot isolation, time travel,
  * optimistic retry, stats pruning) is filesystem-agnostic; this one
  * operation is not, which is why every log-structured table format
  * (Delta's LogStore, Iceberg's commit LockManager) isolates exactly
  * this interface.
  *
  * Contract: `commitExclusive` must (1) make `dest` exist with `tmp`'s
  * full content atomically — readers never observe a partial manifest;
  * (2) return true for EXACTLY ONE of any set of racing writers
  * targeting the same `dest`; (3) dispose of `tmp` in all outcomes.
  *
  * Shipped impls:
  *  - [[LogStore.LocalLink]] — POSIX local fs. `rename` silently
  *    overwrites an existing destination there (check-then-act would
  *    let two racers both "commit"), so the CAS is a HARD LINK: the
  *    kernel fails `link(2)` with EEXIST atomically, exactly one racer
  *    wins, and the published manifest shares the temp file's inode.
  *  - [[LogStore.AtomicRename]] — HDFS-semantics filesystems, where
  *    rename is an atomic namespace op that REFUSES an existing
  *    destination (the contract Delta's HDFSLogStore relies on).
  *
  * Object stores (S3-style) provide neither primitive — a conditional
  * PUT (If-None-Match) or an external lock/CAS service backs the
  * implementation there. Plug one in via [[TxLog.logStoreProvider]];
  * until then object-store roots are unsupported, now as a missing
  * impl of THIS interface rather than a rewrite of the commit path.
  */
trait LogStore {

  /** Publish `tmp` as `dest` iff `dest` does not already exist.
    * True = this writer won the version; false = a racer committed
    * first. `tmp` is consumed either way. */
  def commitExclusive(fs: FileSystem, tmp: Path, dest: Path): Boolean
}

object LogStore {

  /** POSIX local fs: hard-link create-exclusive (EEXIST in the kernel —
    * the only local-fs primitive that is both atomic and refusing). */
  object LocalLink extends LogStore {
    def commitExclusive(fs: FileSystem, tmp: Path, dest: Path): Boolean = {
      val linked =
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dest.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      fs.delete(tmp, false) // dest (if linked) shares the inode; tmp name goes
      linked
    }
  }

  /** HDFS-semantics rename: atomic, refuses an existing destination. */
  object AtomicRename extends LogStore {
    def commitExclusive(fs: FileSystem, tmp: Path, dest: Path): Boolean = {
      val ok = fs.rename(tmp, dest)
      if (!ok) fs.delete(tmp, false)
      ok
    }
  }

  /** Scheme-based default: local fs gets the hard-link CAS, everything
    * else the HDFS rename contract. */
  def forFs(fs: FileSystem): LogStore =
    if (fs.getScheme == "file") LocalLink else AtomicRename
}
