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

  /** Object-store conditional-PUT shape, modeled with local primitives:
    * the commit decomposes into exactly the two properties a
    * conditional PUT (S3 `If-None-Match: *`, GCS `ifGenerationMatch=0`)
    * provides in one call —
    *
    *   (a) an atomic CLAIM that exactly one racer wins: here
    *       `Files.createFile(dest + ".claim", CREATE_NEW)` — the kernel
    *       returns EEXIST to every loser, like the PUT's 412;
    *   (b) all-or-nothing CONTENT visibility: the winner publishes via
    *       `ATOMIC_MOVE`, so `dest` appears with full content in one
    *       namespace op — like an object becoming readable only once
    *       the PUT completes.
    *
    * A real object-store impl collapses (a)+(b) into the single
    * conditional PUT call and needs no claim file; this impl exists to
    * PROVE (TxLogSpec races all three LogStores) that TxLog's commit
    * contract is satisfiable by that primitive alone — the 100 TB
    * object-store story as tested code rather than prose. Claim files
    * carry no content, are invisible to manifest listing (`.manifest`
    * suffix filter), and are dropped with their manifest at vacuum.
    *
    * Mock-only liveness caveat (NOT present with a real PUT, where
    * claim and content are one call): a winner dying between claim and
    * move orphans the claim, and later committers of that version lose
    * forever. Safety is unaffected (no reader ever sees a partial
    * manifest; no two writers both win); un-wedging would mean clearing
    * stale claims by age, omitted because this impl exists to prove the
    * commit contract against the conditional-PUT primitive, not to be
    * deployed on a local disk (LocalLink is the deployment impl there). */
  object ConditionalPut extends LogStore {
    def commitExclusive(fs: FileSystem, tmp: Path, dest: Path): Boolean = {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val destNio = Paths.get(dest.toUri.getPath)
      val tmpNio = Paths.get(tmp.toUri.getPath)
      val claim = Paths.get(dest.toUri.getPath + ".claim")
      val won =
        if (Files.exists(destNio)) false
        else {
          val claimed =
            try { Files.createFile(claim); true }
            catch { case _: java.nio.file.FileAlreadyExistsException => false }
          if (claimed) {
            Files.move(tmpNio, destNio, StandardCopyOption.ATOMIC_MOVE)
            true
          } else false
        }
      if (!won) fs.delete(tmp, false)
      won
    }
  }

  /** Scheme-based default: local fs gets the hard-link CAS, everything
    * else the HDFS rename contract. */
  def forFs(fs: FileSystem): LogStore =
    if (fs.getScheme == "file") LocalLink else AtomicRename
}
