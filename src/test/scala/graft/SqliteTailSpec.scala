package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.engine.TxLog
import graft.sources.SqliteDataSourceV2
import graft.streaming.SqliteTail
import graft.streaming.SqliteTail.{NoChange, Resynced, Synced}

/** Continuous legacy-warehouse sync, driven as a TIME LAPSE: a WAL
  * prefix ending on a commit frame is itself a valid WAL (the checksum
  * chain is prefix-closed), so extending the sidecar file between
  * polls byte-for-byte replays what a live writer's commits look like
  * to a reader — main file untouched, prefix immutable, new frames
  * appended. The fixture's commit boundaries carve the tail into an
  * insert-heavy transaction and a delete+update transaction. */
class SqliteTailSpec extends SparkSpec {

  /** Forge a state file THROUGH the Hadoop FileSystem (the product's
    * write path): a raw java.nio write would leave the local
    * FileSystem's checksum sidecar stale and every subsequent product
    * read would see a ChecksumException instead of the forged state. */
  private def forgeState(root: String, line: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val p = new org.apache.hadoop.fs.Path(root, "_sqlite_tail_cursor")
    val out = fs.create(p, true)
    try out.write(line.getBytes("UTF-8")) finally out.close()
  }

  private def walFixture = SqliteDataSourceV2.fixtureWalPath

  test("tail a live WAL database into a TxLog table: initial sync, " +
    "two incremental polls, no-op poll, crash replay, restart, and a " +
    "loud resync — exactly-once throughout") {
    val conf = new org.apache.hadoop.conf.Configuration()
    val bounds = graft.sources.SqliteCdc.commitBoundaries(walFixture, conf)
    assert(bounds.size >= 3)
    val rawWal = Files.readAllBytes(Paths.get(walFixture + "-wal"))
    val pr = SqliteDataSourceV2.openReader(walFixture, conf)
    val frameSize = graft.sources.SqliteWal.FrameHeaderSize +
      pr.header.pageSize
    pr.close()
    def prefixLen(frames: Int) =
      graft.sources.SqliteWal.HeaderSize + frames.toLong * frameSize

    val dir = Files.createTempDirectory("graft_tail")
    val db = dir.resolve("live.db")
    val wal = dir.resolve("live.db-wal")
    Files.copy(Paths.get(walFixture), db)
    val root = dir.resolve("synced").toString

    def agg() = TxLog.read(spark, root)
      .agg(count(lit(1)), sum(col("id")),
        sum(when(col("status").startsWith("alert"), 1L).otherwise(0L)))
      .head

    // t0: writer has committed ONE WAL transaction so far
    Files.write(wal, rawWal.take(prefixLen(bounds(0)).toInt))
    val t1 = new SqliteTail(spark, db.toString, "readings", root)
    t1.pollOnce() match {
      case Resynced(rows, reason) =>
        assert(rows == 800L && reason.contains("initial"))
      case r => fail(s"expected initial Resynced, got $r")
    }
    assert(t1.pollOnce() == NoChange)

    // t1: the writer commits the 400-row insert transaction — the
    // tail applies EXACTLY those rows
    Files.write(wal, rawWal.take(prefixLen(bounds(1)).toInt))
    assert(t1.pollOnce() == Synced(400, 0, 0))
    assert(agg().getLong(0) == 1200L)
    val stateAfterInserts = Files.readAllBytes(
      Paths.get(root, "_sqlite_tail_cursor"))

    // t2: the remaining transactions land (another table's rows — the
    // attribution must ignore them — plus deletes and re-updates);
    // a FRESH instance proves restart-from-persisted-cursor
    Files.write(wal, rawWal)
    val t2 = new SqliteTail(spark, db.toString, "readings", root)
    assert(t2.pollOnce() == Synced(0, 12, 12))
    val head = agg()
    assert(head.getLong(0) == 1188L)
    // the synced table equals the full head view (q338's ground truth:
    // 1188 rows, 20 alert rows)
    assert(head.getLong(2) == 20L)
    assert(t2.pollOnce() == NoChange)

    // crash replay A — died after the apply, before the final state
    // write: the state still carries the INTENT; the replayed bounded
    // diff runs under the same epoch and the merge guard absorbs it
    val finalState = Files.readAllBytes(
      Paths.get(root, "_sqlite_tail_cursor"))
    val appliedTokens = new String(stateAfterInserts, "UTF-8").trim
      .split(" ") // cursor at bounds(1) + epoch 2
    val headTokens = new String(finalState, "UTF-8").trim.split(" ")
    forgeState(root, appliedTokens.take(6).mkString(" ") + " 2 " +
      headTokens.take(6).mkString(" "))
    val t3 = new SqliteTail(spark, db.toString, "readings", root)
    assert(t3.pollOnce() == Synced(0, 12, 12)) // re-reported, not re-applied
    val replayed = agg()
    assert(replayed.getLong(0) == 1188L &&
      replayed.getLong(1) == head.getLong(1) &&
      replayed.getLong(2) == 20L,
      "crash replay must not double-apply the epoch")

    // crash replay B — died after the intent write, before the apply,
    // and the LIVE WRITER has since committed past the intent target:
    // the replay must apply EXACTLY the intended slice (not the new
    // head — that would mark the in-between rows applied under an
    // already-committed epoch and silently drop them; review r11)
    val dirB = Files.createTempDirectory("graft_tail_b")
    Files.copy(Paths.get(walFixture), dirB.resolve("live.db"))
    Files.write(dirB.resolve("live.db-wal"),
      rawWal.take(prefixLen(bounds(0)).toInt))
    val rootB = dirB.resolve("synced").toString
    val tb = new SqliteTail(spark, dirB.resolve("live.db").toString,
      "readings", rootB)
    tb.pollOnce() match {
      case Resynced(800L, _) =>
      case r => fail(s"expected initial 800-row sync, got $r")
    }
    val stB = new String(Files.readAllBytes(
      Paths.get(rootB, "_sqlite_tail_cursor")), "UTF-8").trim.split(" ")
    // writer races ahead of the crashed poll's intent
    Files.write(dirB.resolve("live.db-wal"), rawWal)
    // forge the crashed state: applied at bounds(0), epoch 1, intent
    // pinned at bounds(1) (same salts + main pin, earlier frame count)
    val intent = Array(stB(0), stB(1), bounds(1).toString, stB(3),
      stB(4), stB(5))
    forgeState(rootB,
      stB.take(6).mkString(" ") + " 1 " + intent.mkString(" "))
    val tb2 = new SqliteTail(spark, dirB.resolve("live.db").toString,
      "readings", rootB)
    assert(tb2.pollOnce() == Synced(400, 0, 0),
      "the replay must apply the INTENDED slice only")
    assert(TxLog.read(spark, rootB).count() == 1200L)
    assert(tb2.pollOnce() == Synced(0, 12, 12)) // the writer's tail
    assert(TxLog.read(spark, rootB).count() == 1188L)

    // state-file loss: the TxLog table is the epoch authority — the
    // resync and every later apply must allocate epochs ABOVE the
    // table's lastEpoch, or the merge guard would silently skip real
    // changes (review r11)
    Files.write(wal, rawWal.take(prefixLen(bounds(1)).toInt))
    Files.delete(Paths.get(root, "_sqlite_tail_cursor"))
    val t4 = new SqliteTail(spark, db.toString, "readings", root)
    t4.pollOnce() match {
      case Resynced(1200L, reason) => assert(reason.contains("initial"))
      case r => fail(s"expected a 1200-row resync, got $r")
    }
    Files.write(wal, rawWal)
    assert(t4.pollOnce() == Synced(0, 12, 12))
    val resynced = TxLog.read(spark, root)
    assert(resynced.count() == 1188L)
    assert(resynced.filter(col("status") === "alert2").count() == 12L,
      "post-resync updates must not be epoch-skipped")

    // checkpoint TRUNCATE (sidecar gone) — loud full resync from the
    // main file's state, never a silent partial view
    Files.delete(wal)
    t4.pollOnce() match {
      case Resynced(rows, reason) =>
        assert(rows == 800L && reason.contains("checkpointed or removed"))
      case r => fail(s"expected Resynced after TRUNCATE, got $r")
    }
    assert(agg().getLong(0) == 800L)
  }

  test("guard rails: WITHOUT ROWID tables and alias-less tables are " +
    "rejected up front") {
    val fixture = SqliteDataSourceV2.fixturePath
    val e1 = intercept[Exception] {
      new SqliteTail(spark, fixture, "norowid", "/tmp/graft_tail_x1")
    }
    assert(e1.getMessage.contains("WITHOUT ROWID"))
    val e2 = intercept[Exception] {
      new SqliteTail(spark, fixture, "kv", "/tmp/graft_tail_x2")
    }
    assert(e2.getMessage.contains("rowid"))
  }
}
