package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{SqliteWal, SqliteWalWriter, SqliteWriter}
import graft.sources.SqliteFile._

/** WAL-append export (SqliteWalWriter): committed transactions appended
  * as salted, checksummed frames onto an existing main-file image, read
  * back through the repo's own WAL-overlay reader. The python-sqlite3
  * cross-validation (incl. PRAGMA integrity_check after a real
  * checkpoint) runs per round via tools/check_wal_roundtrip.py over the
  * files this spec leaves in the temp dir. */
class SqliteWalWriterSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), name)
    Files.deleteIfExists(p)
    Files.deleteIfExists(Paths.get(p.toString + "-wal"))
    Files.deleteIfExists(Paths.get(p.toString + "-shm"))
    p.toString
  }

  private def baseDb(path: String, n: Int): Unit =
    SqliteWriter.write(path, Seq(SqliteWriter.TableSpec("readings",
      "CREATE TABLE readings (id INTEGER PRIMARY KEY, sensor TEXT, " +
        "temp REAL)",
      (1 to n).map(i => (i.toLong,
        Seq(VNull, VText(s"s-${i % 5}"), VReal(i * 0.5)))))))

  private def readBack(path: String) =
    spark.read.format("graft-sqlite").option("table", "readings")
      .load(path)

  private def walFrames(path: String): SqliteWal.WalMap = {
    val wb = Files.readAllBytes(Paths.get(path + "-wal"))
    SqliteWal.parse(wb, 4096)
  }

  test("two appended transactions extend one salted checksum chain and " +
    "the WAL-overlay reader sees base + both batches") {
    val db = tmp("graft_walwriter_check.db")
    baseDb(db, 100)
    val n1 = SqliteWalWriter.appendCommit(db, "readings",
      (101 to 150).map(i => (i.toLong,
        Seq(VNull, VText(s"s-${i % 5}"), VReal(i * 0.5)))))
    val w1 = walFrames(db)
    assert(n1 >= 1 && w1.framesCommitted === n1 &&
      w1.commitFrames.size === 1)
    val n2 = SqliteWalWriter.appendCommit(db, "readings",
      (151 to 200).map(i => (i.toLong,
        Seq(VNull, VText(s"s-${i % 5}"), VReal(i * 0.5)))))
    val w2 = walFrames(db)
    assert(w2.framesCommitted === n1 + n2 && w2.commitFrames.size === 2)
    assert(w2.salt1 === w1.salt1 && w2.salt2 === w1.salt2,
      "second transaction must continue the same WAL generation")
    val got = readBack(db).agg(count(lit(1)), sum(col("id")),
      sum(col("temp"))).as[(Long, Long, Double)].head()
    assert(got._1 === 200L)
    assert(got._2 === (1 to 200).map(_.toLong).sum)
    assert(math.abs(got._3 - (1 to 200).map(_ * 0.5).sum) < 1e-9)
    // main file never grew — the append lives entirely in the -wal
    assert(Files.size(Paths.get(db)) % 4096 === 0L)
  }

  test("leaf splits, root deepening, interior growth and overflow " +
    "chains: a large-payload append grows the tree across levels and " +
    "reads back exactly") {
    val db = tmp("graft_walwriter_deep.db")
    // base: a SMALL root-leaf table — first append must deepen the root
    SqliteWriter.write(db, Seq(SqliteWriter.TableSpec("readings",
      "CREATE TABLE readings (id INTEGER PRIMARY KEY, sensor TEXT, " +
        "temp REAL)",
      (1 to 3).map(i => (i.toLong,
        Seq(VNull, VText("seed"), VReal(i.toDouble)))))))
    // ~1 KB payloads → ~3 cells/leaf → hundreds of leaves → the root
    // interior overflows too (non-root cascade + a second deepening)
    val big = "x" * 1000
    SqliteWalWriter.appendCommit(db, "readings",
      (4 to 2203).map(i => (i.toLong,
        Seq(VNull, VText(big + i), VReal(i.toDouble)))))
    // one jumbo payload exercises the overflow-chain path in the WAL
    SqliteWalWriter.appendCommit(db, "readings",
      Seq((9999L, Seq(VNull, VText("y" * 10000), VReal(0.0)))))
    val got = readBack(db)
      .agg(count(lit(1)), sum(col("id")), max(length(col("sensor"))))
      .as[(Long, Long, Int)].head()
    assert(got._1 === 2204L)
    assert(got._2 === (1 to 2203).map(_.toLong).sum + 9999L)
    assert(got._3 === 10000)
    // spot-check a mid-tree row decodes intact
    val row = readBack(db).filter(col("id") === 1000)
      .select(col("sensor")).as[String].head()
    assert(row === big + 1000)
  }

  test("a torn tail on the -wal is truncated, not corrupted: garbage " +
    "after the last commit disappears under the next append") {
    val db = tmp("graft_walwriter_torn.db")
    baseDb(db, 50)
    SqliteWalWriter.appendCommit(db, "readings",
      Seq((51L, Seq(VNull, VText("a"), VReal(1.0)))))
    val walPath = Paths.get(db + "-wal")
    val torn = Files.readAllBytes(walPath) ++ Array.fill(2000)(0x5a.toByte)
    Files.write(walPath, torn)
    SqliteWalWriter.appendCommit(db, "readings",
      Seq((52L, Seq(VNull, VText("b"), VReal(2.0)))))
    val w = walFrames(db)
    assert(w.commitFrames.size === 2, "both commits visible, tail gone")
    assert(readBack(db).count() === 52L)
  }

  test("sampled-page digest pin catches a backfill that preserves " +
    "length, mtime AND the change counter — the window the " +
    "counter/len/mtime triple cannot see") {
    import graft.sources.SqliteDataSourceV2
    val db = tmp("graft_walwriter_backfill.db")
    baseDb(db, 100) // single root leaf on page 2
    SqliteWalWriter.appendCommit(db, "readings",
      (101 to 110).map(i => (i.toLong,
        Seq(VNull, VText("x"), VReal(i * 1.0)))))
    val conf = new org.apache.hadoop.conf.Configuration()
    // plan-time pins
    val pr0 = SqliteDataSourceV2.openReader(db, conf)
    val frames = pr0.wal.framesCommitted
    val salts = Some((pr0.wal.salt1, pr0.wal.salt2))
    val mpin = Some(pr0.mainPinState)
    val ppin = Some((Seq(1, 2), pr0.rawPageHash(Seq(1, 2))))
    pr0.close()
    // forge the PASSIVE-checkpoint backfill: copy page 2's newest WAL
    // image into the main file, then restore the mtime — length and
    // the page-1 change counter are untouched, so the old triple is
    // blind to it
    val mtime0 = Files.getLastModifiedTime(Paths.get(db))
    val wb = Files.readAllBytes(Paths.get(db + "-wal"))
    val off2 = SqliteWal.parse(wb, 4096).frameOffsets(2)
    val img = java.util.Arrays.copyOfRange(wb, off2.toInt,
      off2.toInt + 4096)
    val raf = new java.io.RandomAccessFile(db, "rw")
    try { raf.seek(4096L); raf.write(img) } finally raf.close()
    Files.setLastModifiedTime(Paths.get(db), mtime0)
    // the documented residual window: the triple alone passes...
    SqliteDataSourceV2.openReader(db, conf, frames, salts, mpin).close()
    // ...the sampled-page digest fails loudly
    val e = intercept[IllegalArgumentException] {
      SqliteDataSourceV2.openReader(db, conf, frames, salts, mpin, ppin)
    }
    assert(e.getMessage.contains("sampled main-file pages"))
  }

  test("contract gates: non-monotone rowids, unknown tables and " +
    "indexed tables are rejected loudly") {
    val db = tmp("graft_walwriter_gates.db")
    baseDb(db, 10)
    val e1 = intercept[IllegalArgumentException] {
      SqliteWalWriter.appendCommit(db, "readings",
        Seq((5L, Seq(VNull, VText("x"), VReal(0.0)))))
    }
    assert(e1.getMessage.contains("monotone"))
    val e2 = intercept[RuntimeException] {
      SqliteWalWriter.appendCommit(db, "nope",
        Seq((99L, Seq(VNull, VText("x"), VReal(0.0)))))
    }
    assert(e2.getMessage.contains("no such table"))
  }
}
