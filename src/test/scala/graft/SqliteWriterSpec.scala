package graft

import org.apache.spark.sql.functions._

import graft.sources.SqliteFile._
import graft.sources.SqliteWriter

/** The native SQLite WRITER, verified through the native READER: a
  * written file must round-trip every value class (minimal-width ints,
  * 0/1 constants, reals, text, blobs, nulls, overflow chains, interior
  * levels, rowid aliases) and open as a normal graft-sqlite table.
  * Independent cross-engine validation: tools/check_sqlite_roundtrip.py
  * re-opens the same file with python's stdlib sqlite3 (run per round,
  * results recorded in SCALE.md §6k). */
class SqliteWriterSpec extends SparkSpec {

  private def tmpDb(): String =
    java.nio.file.Files.createTempDirectory("graft_sqw")
      .resolve("w.db").toString

  test("low-level: varint and record encoders invert the reader's decoders") {
    for (v <- Seq(0L, 1L, 127L, 128L, 16383L, 16384L, (1L << 40) + 7,
        (1L << 56) + 99, Long.MaxValue, -1L)) {
      val b = SqliteWriter.varintBytes(v)
      assert(varint(b, 0) == ((v, b.length)), s"varint roundtrip of $v")
    }
    val rec = SqliteWriter.encodeRecord(Seq(VNull, VInt(0), VInt(1),
      VInt(-7), VInt(300), VInt(1L << 34), VInt(-(1L << 50)),
      VReal(2.5), VText("héllo"), VBlob(Array[Byte](1, 2, 3))))
    val back = decodeRecord(rec, _ => true)
    assert(back(0) == VNull && back(1) == VInt(0) && back(2) == VInt(1))
    assert(back(3) == VInt(-7) && back(4) == VInt(300))
    assert(back(5) == VInt(1L << 34) && back(6) == VInt(-(1L << 50)))
    assert(back(7) == VReal(2.5) && back(8) == VText("héllo"))
    assert(back(9).asInstanceOf[VBlob].v.toSeq == Seq[Byte](1, 2, 3))
  }

  test("written file round-trips through the reader: multi-level tree, overflow, alias, empty table") {
    val db = tmpDb()
    val rows = (1 to 5000).map { i =>
      (i * 2L, Seq(VNull, // id: rowid alias
        VText(if (i % 500 == 0) ("ov-%04d " format i) * 1200
          else s"name-$i"),
        if (i % 7 == 0) VNull else VReal(i / 4.0),
        VInt(i % 2),
        if (i % 3 == 0) VBlob(Array.fill[Byte](i % 5 + 1)(i.toByte))
        else VNull))
    }
    SqliteWriter.write(db, Seq(
      SqliteWriter.TableSpec("t1",
        "CREATE TABLE t1 (id INTEGER PRIMARY KEY, name TEXT, " +
          "score REAL, flag INTEGER, payload BLOB)", rows),
      SqliteWriter.TableSpec("t2",
        "CREATE TABLE t2 (k TEXT, v INTEGER)", Nil)))
    def rd(t: String) = spark.read.format("graft-sqlite")
      .option("table", t).load(db)
    val t1 = rd("t1")
    assert(t1.count() == 5000)
    assert(t1.rdd.getNumPartitions > 1, "5000 rows must build interior levels")
    assert(t1.agg(sum(col("id"))).head.getLong(0) ==
      (1 to 5000).map(_ * 2L).sum) // alias carries the written rowids
    val ov = t1.filter(col("id") === 1000 * 2).head()
    assert(ov.getAs[String]("name").length == "ov-1000 ".length * 1200)
    assert(ov.getAs[String]("name").startsWith("ov-1000 ov-1000"))
    val r9 = t1.filter(col("id") === 18).head() // i=9
    assert(r9.getAs[String]("name") == "name-9")
    assert(r9.getAs[Double]("score") == 2.25)
    assert(r9.getAs[Long]("flag") == 1L)
    assert(r9.getAs[Array[Byte]]("payload").toSeq ==
      Array.fill[Byte](9 % 5 + 1)(9).toSeq)
    assert(t1.filter(col("score").isNull).count() == 5000 / 7)
    assert(rd("t2").count() == 0)
    assert(rd("t2").schema.fieldNames.toSeq == Seq("k", "v"))
    // rowid pushdown works against our own file too
    assert(rd("t1").filter(col("id").between(2000, 2100)).count() == 51)
    // leave a copy at a fixed path for the cross-engine validator
    // (tools/check_sqlite_roundtrip.py: python stdlib sqlite3 re-opens
    // the file, runs PRAGMA integrity_check and replays the aggregates)
    java.nio.file.Files.copy(java.nio.file.Paths.get(db),
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_writer_check.db"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  test("TRUE warehouse parity: graft writes a drwh.db with the reference's " +
    "verbatim DDL whose schemas the reader cannot tell apart from the " +
    "reference file's") {
    val refConf = new org.apache.hadoop.conf.Configuration()
    val refTables = graft.sources.SqliteDataSourceV2
      .listTables("/root/reference/drwh.db", refConf)
    val db = tmpDb()
    // re-emit the reference's own CREATE TABLE statements (read from
    // its sqlite_master via our parser's source file) with a few rows
    val refSql = {
      // pull the verbatim DDL strings back out of the reference file
      val pr = graft.sources.SqliteDataSourceV2.openReader(
        "/root/reference/drwh.db", refConf)
      try scanTable(pr, pr.header, 1).map { row =>
        val v = decodeRecord(row.payload, _ => true)
        (v(1).asInstanceOf[VText].v, v(4).asInstanceOf[VText].v)
      }.toMap finally pr.close()
    }
    val patientRows = (1 to 40).map { i =>
      (i.toLong, VNull +: Seq.tabulate(21) {
        case 0 => VText(s"LAST$i")
        case 1 => VText(s"FIRST$i")
        case 18 => VReal(48.0 + i / 100.0) // BIRTH_LATITUDE
        case 20 => VInt(1L)                // UPLOAD_ID
        case _ => VNull
      })
    }
    SqliteWriter.write(db, Seq(
      SqliteWriter.TableSpec("DWH_PATIENT", refSql("DWH_PATIENT"),
        patientRows),
      SqliteWriter.TableSpec("DWH_PATIENT_IPPHIST",
        refSql("DWH_PATIENT_IPPHIST"), Nil),
      SqliteWriter.TableSpec("DWH_DOCUMENT", refSql("DWH_DOCUMENT"), Nil)))
    val mine = graft.sources.SqliteDataSourceV2.listTables(db, refConf)
    // schema identity table-by-table: names, declared types, alias flags
    for (rt <- refTables) {
      val mt = mine.find(_.name == rt.name).get
      assert(mt.columns == rt.columns, s"${rt.name} schema must be " +
        "indistinguishable from the reference file's")
      assert(mt.withoutRowid == rt.withoutRowid)
    }
    val pat = spark.read.format("graft-sqlite")
      .option("table", "DWH_PATIENT").load(db)
    assert(pat.count() == 40)
    assert(pat.agg(sum(col("PATIENT_NUM"))).head.getLong(0) == (1 to 40).sum)
    assert(pat.filter(col("LASTNAME") === "LAST7").head()
      .getAs[Double]("BIRTH_LATITUDE") == 48.07)
    // leave a copy for the python cross-check (validated per round)
    java.nio.file.Files.copy(java.nio.file.Paths.get(db),
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_drwh_written.db"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  test("interior packing at the 1-mod-200 boundary: 201 one-cell leaves " +
    "rebalance into 100+101 children — no zero-cell interior page " +
    "(advisor r09)") {
    val db = tmpDb()
    // ~2500-byte cells: exactly one per 4 KB leaf, so 201 rows = 201
    // leaves = the exact boundary where the naive 200-grouping would
    // emit an interior page holding ONLY the right-most pointer
    val rows = (1 to 201).map(i =>
      (i.toLong, Seq(VText(("x%04d " format i) * 416), VInt(i.toLong))))
    SqliteWriter.write(db, Seq(SqliteWriter.TableSpec("b",
      "CREATE TABLE b (t TEXT, n INTEGER)", rows)))
    val back = spark.read.format("graft-sqlite").option("table", "b").load(db)
    assert(back.count() == 201)
    assert(back.agg(sum(col("n"))).head.getLong(0) == (1 to 201).sum.toLong)
    // structural assertion: every interior page in the file carries at
    // least one cell (the shape sqlite itself always produces)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(db))
    val pr = new BytesPageReader(bytes, SqliteWriter.PageSize)
    val pages = bytes.length / SqliteWriter.PageSize
    for (p <- 1 to pages) {
      val pg = pr.page(p)
      val off = if (p == 1) 100 else 0
      if ((pg(off) & 0xff) == 0x05) {
        val ncells = ((pg(off + 3) & 0xff) << 8) | (pg(off + 4) & 0xff)
        assert(ncells >= 1, s"interior page $p has zero cells")
      }
    }
    // leave a copy for the python integrity_check cross-validation
    java.nio.file.Files.copy(java.nio.file.Paths.get(db),
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_writer_boundary.db"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  test("writer guards: unsorted/duplicate rowids and null export keys " +
    "fail fast; oversized exports point at the parquet path (advisor r09)") {
    import spark.implicits._
    val db = tmpDb()
    // duplicate rowids through the low-level writer
    val dup = intercept[IllegalArgumentException] {
      SqliteWriter.write(db, Seq(SqliteWriter.TableSpec("d",
        "CREATE TABLE d (n INTEGER)",
        Seq((1L, Seq(VInt(1))), (1L, Seq(VInt(2)))))))
    }
    assert(dup.getMessage.contains("strictly increasing"))
    // unsorted rowids
    val uns = intercept[IllegalArgumentException] {
      SqliteWriter.write(db, Seq(SqliteWriter.TableSpec("d",
        "CREATE TABLE d (n INTEGER)",
        Seq((5L, Seq(VInt(1))), (2L, Seq(VInt(2)))))))
    }
    assert(uns.getMessage.contains("strictly increasing"))
    // null rowid column in export
    val withNull = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"))
      .toDF("id", "v")
    val nul = intercept[IllegalArgumentException] {
      SqliteWriter.export(withNull, db, "e", rowidCol = Some("id"))
    }
    assert(nul.getMessage.contains("non-null"))
    // duplicate rowid column in export (sorted, so buildTree catches it)
    val withDup = Seq((1L, "a"), (1L, "b")).toDF("id", "v")
    val dup2 = intercept[IllegalArgumentException] {
      SqliteWriter.export(withDup, db, "e", rowidCol = Some("id"))
    }
    assert(dup2.getMessage.contains("strictly increasing"))
    // export size guard names the override and the scale path
    val big = intercept[IllegalArgumentException] {
      SqliteWriter.export(spark.range(100).toDF("id"), db, "e",
        maxExportRows = 10L)
    }
    assert(big.getMessage.contains("maxExportRows") &&
      big.getMessage.contains("parquet"))
  }

  test("DataFrame export: engine table -> .db -> engine table equality") {
    import spark.implicits._
    val src = (1 to 300).map(i => (i.toLong, s"row $i", i * 0.25,
        if (i % 4 == 0) null else s"note-$i"))
      .toDF("id", "name", "score", "note")
    val db = tmpDb()
    SqliteWriter.export(src, db, "exported", rowidCol = Some("id"))
    val back = spark.read.format("graft-sqlite")
      .option("table", "exported").load(db)
    assert(back.schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
    val a = src.orderBy("id").collect().map(_.toSeq).toSeq
    val b = back.orderBy("id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
