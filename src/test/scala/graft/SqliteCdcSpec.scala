package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration

import graft.sources.{SqliteCdc, SqliteDataSourceV2}

/** WAL-tail CDC against the committed WAL fixture
  * (tools/make_sqlite_wal_fixture.py): the expected change sets are
  * engine-independent — tools/make_wal_cdc_oracle.py recomputes them
  * by replaying the pair with python's sqlite3 at a truncated-WAL
  * cursor vs the head (a WAL prefix ending on a commit frame is a
  * valid WAL; the checksum chain is prefix-closed). The fixture's
  * tail transactions: inserts 801-1200 (new pages), a wal_only table
  * (OTHER-table noise the attribution must reject), deletes of
  * id % 97 = 0 and re-updates of id % 100 = 0. */
class SqliteCdcSpec extends SparkSpec {

  private val conf = new Configuration()
  private def walFixture = SqliteDataSourceV2.fixtureWalPath

  test("exact row-level changes from a mid-stream cursor: deletes and " +
    "updates only, neighbors on rewritten pages NOT reported") {
    val head = SqliteCdc.currentCursor(walFixture, conf)
    val bounds = SqliteCdc.commitBoundaries(walFixture, conf)
    assert(bounds.size >= 2 && bounds.last == head.frames)
    val cur = head.copy(frames = bounds(1))
    SqliteCdc.changesSince(walFixture, conf, "readings", cur) match {
      case SqliteCdc.Changes(nc, ins, upd, del) =>
        assert(nc == head)
        // ground truth from the generator, revalidated by the sqlite3
        // replay in tools/make_wal_cdc_oracle.py: txn4 deletes
        // id % 97 = 0 and updates id % 100 = 0 (over 1..1200); txn3
        // touches only the wal_only table
        assert(ins == Nil, s"no inserts after this cursor: $ins")
        assert(del == (1 to 1200).filter(_ % 97 == 0).map(_.toLong),
          s"deleted = the id%%97 rows: $del")
        assert(upd == (1 to 1200).filter(_ % 100 == 0).map(_.toLong),
          s"updated = the id%%100 rows: $upd")
      case r => fail(s"expected Changes, got $r")
    }
  }

  test("a cursor at the first commit boundary sees the later inserts " +
    "too; the wal_only table's pages are attributed away") {
    val head = SqliteCdc.currentCursor(walFixture, conf)
    val cur = head.copy(
      frames = SqliteCdc.commitBoundaries(walFixture, conf).head)
    SqliteCdc.changesSince(walFixture, conf, "readings", cur) match {
      case SqliteCdc.Changes(_, ins, upd, del) =>
        // 400 inserts minus the 4 later-deleted (873/970/1067/1164)
        assert(ins.length == 396 && ins.head == 801L && ins.sum == 396126L)
        assert(del == (1 to 800).filter(_ % 97 == 0).map(_.toLong))
        assert(upd == (1 to 800).filter(_ % 100 == 0).map(_.toLong))
        // and the OTHER table diffs independently: wal_only was
        // created after this cursor — all its rows are inserts
        SqliteCdc.changesSince(walFixture, conf, "wal_only", cur) match {
          case SqliteCdc.Changes(_, wins, wupd, wdel) =>
            assert(wins.length == 120 && wupd == Nil && wdel == Nil)
          case r => fail(s"expected Changes for wal_only, got $r")
        }
      case r => fail(s"expected Changes, got $r")
    }
  }

  test("pinned-snapshot DSv2 read: walFrames/walSalt options read the " +
    "table AS OF a cursor; wrong-generation salts fail loudly") {
    val head = SqliteCdc.currentCursor(walFixture, conf)
    val c0 = head.copy(
      frames = SqliteCdc.commitBoundaries(walFixture, conf).head)
    def at(frames: Int, s1: Long, s2: Long) =
      spark.read.format("graft-sqlite").option("table", "readings")
        .option("walFrames", frames.toString)
        .option("walSalt1", s1.toString).option("walSalt2", s2.toString)
        .load(walFixture)
    // as of the first commit: the 400 tail inserts are not visible yet
    assert(at(c0.frames, c0.salt1, c0.salt2).count() == 800L)
    // head-equivalent pin
    assert(at(head.frames, head.salt1, head.salt2).count() == 1188L)
    // wrong generation: loud, not a silent different snapshot
    val e = intercept[Exception] {
      at(c0.frames, c0.salt1 + 1, c0.salt2).count()
    }
    assert(e.getMessage.contains("checkpointed mid-query") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("checkpointed mid-query"),
      s"got: ${e.getMessage}")
  }

  test("caller main-pin scan options: matching mainCounter/Len/Mtime " +
    "read fine; a mismatched pin — the checkpoint-backfill-between-" +
    "cursor-and-plan race — fails loudly; partial options are " +
    "rejected") {
    val head = SqliteCdc.currentCursor(walFixture, conf)
    def at(counter: Long, len: Long, mtime: Long) =
      spark.read.format("graft-sqlite").option("table", "readings")
        .option("walFrames", head.frames.toString)
        .option("walSalt1", head.salt1.toString)
        .option("walSalt2", head.salt2.toString)
        .option("mainCounter", counter.toString)
        .option("mainLen", len.toString)
        .option("mainMtime", mtime.toString)
        .load(walFixture)
    assert(at(head.mainCounter, head.mainLen, head.mainMtime)
      .count() == 1188L)
    val e = intercept[Exception] {
      at(head.mainCounter + 1, head.mainLen, head.mainMtime).count()
    }
    def mentionsBackfill(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("main file")) ||
        mentionsBackfill(t.getCause))
    assert(mentionsBackfill(e), s"got: ${e.getMessage}")
    val p = intercept[Exception] {
      spark.read.format("graft-sqlite").option("table", "readings")
        .option("mainCounter", head.mainCounter.toString)
        .load(walFixture).count()
    }
    def mentionsTogether(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("together")) ||
        mentionsTogether(t.getCause))
    assert(mentionsTogether(p), s"got: ${p.getMessage}")
  }

  test("head cursor yields empty changes; the new cursor round-trips") {
    val head = SqliteCdc.currentCursor(walFixture, conf)
    SqliteCdc.changesSince(walFixture, conf, "readings", head) match {
      case SqliteCdc.Changes(nc, ins, upd, del) =>
        assert(nc == head && ins.isEmpty && upd.isEmpty && del.isEmpty)
      case r => fail(s"expected empty Changes, got $r")
    }
  }

  test("loud degrades: re-salt, sidecar removal, and a changed main " +
    "file all demand a full resync — never a silent partial answer") {
    val head = SqliteCdc.currentCursor(walFixture, conf)
    // checkpoint RESTART simulation: generation salts changed
    val resalted = head.copy(salt1 = head.salt1 + 1,
      frames = SqliteCdc.commitBoundaries(walFixture, conf).head)
    SqliteCdc.changesSince(walFixture, conf, "readings", resalted) match {
      case SqliteCdc.ResyncRequired(msg) =>
        assert(msg.contains("salts changed"))
      case r => fail(s"expected ResyncRequired on re-salt, got $r")
    }
    // TRUNCATE/close simulation: main file only, cursor mid-WAL
    val dir = Files.createTempDirectory("graft_cdc")
    Files.copy(Paths.get(walFixture), dir.resolve("t.db"),
      StandardCopyOption.REPLACE_EXISTING)
    val mainOnly = dir.resolve("t.db").toString
    val headT = SqliteCdc.currentCursor(mainOnly, conf)
    assert(headT.frames == 0, "no sidecar -> frames 0")
    SqliteCdc.changesSince(mainOnly, conf, "readings",
      headT.copy(salt1 = head.salt1, salt2 = head.salt2,
        frames = head.frames)) match {
      case SqliteCdc.ResyncRequired(msg) =>
        assert(msg.contains("checkpointed or removed"))
      case r => fail(s"expected ResyncRequired, got $r")
    }
    // PASSIVE-checkpoint simulation: the pair intact but the main file
    // rewritten since the cursor (counter/len/mtime pin mismatch)
    Files.copy(Paths.get(walFixture + "-wal"), dir.resolve("p.db-wal"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get(walFixture), dir.resolve("p.db"),
      StandardCopyOption.REPLACE_EXISTING)
    val pPath = dir.resolve("p.db").toString
    val cur = SqliteCdc.currentCursor(pPath, conf)
      .copy(frames = SqliteCdc.commitBoundaries(pPath, conf).head)
    val raw = Files.readAllBytes(dir.resolve("p.db"))
    raw(27) = (raw(27) + 1).toByte // bump the change counter
    Files.write(dir.resolve("p.db"), raw)
    SqliteCdc.changesSince(pPath, conf, "readings", cur) match {
      case SqliteCdc.ResyncRequired(msg) =>
        assert(msg.contains("main file changed"))
      case r => fail(s"expected ResyncRequired on main change, got $r")
    }
    // dropped table
    SqliteCdc.changesSince(walFixture, conf, "no_such_table",
      head.copy(frames =
        SqliteCdc.commitBoundaries(walFixture, conf).head)) match {
      case SqliteCdc.ResyncRequired(msg) => assert(msg.contains("table"))
      case r => fail(s"expected ResyncRequired, got $r")
    }
  }
}
