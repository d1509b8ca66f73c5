package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DoubleType, LongType, StringType}

import graft.sources.{SqliteDataSourceV2, SqliteFile}

/** The native SQLite source against BOTH targets it exists for: the
  * reference's actual `drwh.db` (schema golden — the true
  * reference-parity gate) and the generated fixture
  * (tools/make_sqlite_fixture.py), which exercises every parser
  * feature: multi-level B-tree, overflow chains, all serial types,
  * rowid alias, ALTER-TABLE-short records, affinity coercion, column
  * pruning, subtree partitioning, WITHOUT ROWID rejection. */
class SqliteSourceSpec extends SparkSpec {

  private val drwh = "/root/reference/drwh.db"
  private def fixture = SqliteDataSourceV2.fixturePath
  private def read(path: String, table: String) =
    spark.read.format("graft-sqlite").option("table", table).load(path)

  // ---- drwh.db: the reference warehouse file ----------------------------

  test("drwh.db: catalog lists the three DWH tables") {
    val conf = new org.apache.hadoop.conf.Configuration()
    val ts = SqliteDataSourceV2.listTables(drwh, conf)
    assert(ts.map(_.name).sorted ==
      Seq("DWH_DOCUMENT", "DWH_PATIENT", "DWH_PATIENT_IPPHIST"))
    assert(ts.find(_.name == "DWH_PATIENT").get.columns.size == 22)
    assert(ts.find(_.name == "DWH_PATIENT_IPPHIST").get.columns.size == 5)
    assert(ts.find(_.name == "DWH_DOCUMENT").get.columns.size == 19)
  }

  test("drwh.db: DWH_PATIENT schema golden — affinities and rowid alias") {
    val df = read(drwh, "DWH_PATIENT")
    val s = df.schema
    assert(s.fieldNames.take(5).toSeq ==
      Seq("PATIENT_NUM", "LASTNAME", "FIRSTNAME", "BIRTH_DATE", "SEX"))
    assert(s("PATIENT_NUM").dataType == LongType)    // INTEGER
    assert(s("LASTNAME").dataType == StringType)     // VARCHAR2 -> TEXT
    assert(s("BIRTH_DATE").dataType == StringType)   // DATE -> NUMERIC -> str
    assert(s("BIRTH_LATITUDE").dataType == DoubleType) // FLOAT(126) -> REAL
    assert(s("UPLOAD_ID").dataType == LongType)
    assert(df.count() == 0) // the committed reference file ships empty
    // PRIMARY KEY (PATIENT_NUM) in table-constraint form over INTEGER:
    // a rowid alias — the read path must source it from the rowid
    val conf = new org.apache.hadoop.conf.Configuration()
    val pat = SqliteDataSourceV2.listTables(drwh, conf)
      .find(_.name == "DWH_PATIENT").get
    assert(pat.columns.find(_.name == "PATIENT_NUM").get.rowidAlias)
    assert(!pat.columns.find(_.name == "LASTNAME").get.rowidAlias)
  }

  test("drwh.db: DWH_DOCUMENT schema golden") {
    val df = read(drwh, "DWH_DOCUMENT")
    val s = df.schema
    assert(s("DOCUMENT_NUM").dataType == LongType)
    assert(s("DISPLAYED_TEXT").dataType == StringType) // CLOB -> TEXT
    assert(s("ENCOUNTER_NUM").dataType == StringType)  // VARCHAR2(30)
    assert(s("DOCUMENT_DATE").dataType == StringType)  // DATE
    assert(s("UNIT_NUM").dataType == LongType)
    assert(df.count() == 0)
    assert(read(drwh, "DWH_PATIENT_IPPHIST").count() == 0)
  }

  // ---- fixture: every parser feature -------------------------------------

  test("fixture docs: row count, rowid-alias ids, gaps preserved") {
    val df = read(fixture, "docs")
    assert(df.count() == 1501)
    val ids = df.select("id").orderBy("id").limit(4)
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(3L, 6L, 9L, 12L)) // i*3 — alias carries real keys
    assert(df.agg(max("id")).head.getLong(0) == (1L << 40)) // 6-byte serial
  }

  test("fixture docs: overflow chains reassemble byte-exactly") {
    val df = read(fixture, "docs")
    // i=97: ("overflow-00097 " x 900) = 13.5 KB -> 3+ overflow pages
    val big = df.filter(col("id") === 97 * 3).select("body").head.getString(0)
    assert(big.length == 13500)
    assert(big.startsWith("overflow-00097 overflow-00097 "))
    assert(big.endsWith("overflow-00097 "))
    // i=40: one overflow page
    val mid = df.filter(col("id") === 40 * 3).select("body").head.getString(0)
    assert(mid.length == "long-body-00040 ".length * 220)
    // inline rows untouched
    val small = df.filter(col("id") === 3).select("body").head.getString(0)
    assert(small == "body of document 00001 in beta")
  }

  test("fixture docs: serial types — 0/1 constants, negatives, reals, blobs, nulls") {
    val df = read(fixture, "docs")
    assert(df.filter(col("flag") === 1).count() +
      df.filter(col("flag") === 0).count() == 1500) // serials 8/9
    val bigRow = df.filter(col("cat") === "bigint").head()
    assert(bigRow.getAs[Long]("flag") == -(1L << 50)) // 8-byte negative
    assert(bigRow.getAs[Double]("score") == -12345.5)
    assert(bigRow.getAs[Array[Byte]]("payload").toSeq == Seq(0xff.toByte))
    // score nulls every 11th i; payload null when i%5==0
    assert(df.filter(col("score").isNull).count() == 136) // 1500/11
    val p3 = df.filter(col("id") === 9).head.getAs[Array[Byte]]("payload")
    assert(p3.toSeq == Seq[Byte](0, 1, 0, 1, 0, 1, 0, 1)) // i=3 -> 4 reps
  }

  test("fixture docs: rows inserted before ALTER TABLE ADD COLUMN read null note") {
    val df = read(fixture, "docs")
    // first 700 inserted rows predate the ADD COLUMN -> record is one
    // column short on disk -> null; later rows carry values on i%3==0
    assert(df.filter(col("id") <= 700 * 3 && col("note").isNotNull)
      .count() == 0)
    assert(df.filter(col("note").isNotNull).count() > 0)
  }

  test("fixture: non-alias TEXT-pk table and type-fluid affinity coercion") {
    val kv = read(fixture, "kv")
    assert(kv.count() == 200)
    assert(kv.filter(col("k") === "key-007").head.getLong(1) == 49L)
    // weird.x declared INTEGER: stores 42 (int), 2.75 (real -> 2),
    // 'abc' (text -> unparseable -> null), NULL
    val w = read(fixture, "weird").orderBy("id")
      .select("x").collect().map(r => if (r.isNullAt(0)) null
        else java.lang.Long.valueOf(r.getLong(0))).toSeq
    assert(w == Seq(42L, 2L, null, null))
  }

  test("fixture: WITHOUT ROWID tables read through the index B-tree") {
    // simple TEXT-pk WITHOUT ROWID (single leaf)
    val nr = read(fixture, "norowid").collect()
    assert(nr.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("x", 1L)))
    // composite-PK, multi-level index B-tree, PK columns NOT declared
    // first: stored order is (grp, id, val, note) but the reader must
    // return DECLARED order (val, grp, note, id)
    val wr = read(fixture, "wr_metrics")
    assert(wr.schema.fieldNames.toSeq == Seq("val", "grp", "note", "id"))
    assert(wr.count() == 360)
    val r137 = wr.filter(col("id") === 137).head()
    assert(r137.getAs[String]("grp") == "g2")
    assert(r137.getAs[Double]("val") == (137 * 13 % 400) / 4.0)
    // index-overflow row: note = "wr-note-0137 " x 500 = 6.5 KB
    assert(r137.getAs[String]("note").length == "wr-note-0137 ".length * 500)
    assert(r137.getAs[String]("note").startsWith("wr-note-0137 wr-note-"))
    // interior index pages carry ENTRIES: no row may be lost or doubled
    assert(wr.select("id", "grp").distinct().count() == 360)
    assert(wr.agg(sum(col("id"))).head.getLong(0) == (0L until 360L).sum)
    // single-partition contract for index-btree storage
    assert(wr.rdd.getNumPartitions == 1)
    val e2 = intercept[Exception] { read(fixture, "nope").count() }
    assert(e2.getMessage.contains("no table 'nope'"))
  }

  test("fixture docs: subtree partitioning and maxPartitions") {
    val df = read(fixture, "docs")
    assert(df.rdd.getNumPartitions > 1,
      "interior root must split into parallel subtree partitions")
    val one = spark.read.format("graft-sqlite").option("table", "docs")
      .option("maxPartitions", 1).load(fixture)
    assert(one.rdd.getNumPartitions == 1)
    assert(one.count() == 1501) // grouping loses no rows
    // partition split is disjoint + complete: ids identical either way
    assert(df.select("id").except(one.select("id")).count() == 0)
    assert(one.select("id").except(df.select("id")).count() == 0)
  }

  test("fixture docs: column pruning reaches the scan") {
    val df = read(fixture, "docs").select("id", "cat")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scan.isDefined)
    assert(scan.get.scan.description().contains("[id,cat]"),
      s"pruned scan should read only [id,cat]: ${scan.get.scan.description()}")
    assert(df.count() == 1501)
  }

  // ---- rowid-range pushdown ----------------------------------------------

  test("pushdown: point lookup plans one pruned partition and reads O(depth) pages") {
    import SqliteFile._
    val df = read(fixture, "docs").filter(col("id") === 300)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan.scan.description().contains("rowid in [300,300]"),
      s"pushed range missing: ${scan.scan.description()}")
    assert(df.rdd.getNumPartitions == 1,
      "point lookup must prune to a single root subtree")
    val row = df.head()
    assert(row.getAs[String]("title") == "doc 00100") // id = i*3
    // page-count proof on the raw B-tree: a counting reader shows the
    // range scan touches a tiny fraction of the full-scan page set
    class CountingReader(inner: PageReader) extends PageReader {
      val seen = scala.collection.mutable.Set.empty[Int]
      def pageSize: Int = inner.pageSize
      def page(n: Int): Array[Byte] = { seen += n; inner.page(n) }
      def close(): Unit = inner.close()
    }
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture))
    val hdr = parseHeader(bytes.take(100))
    def freshCounter() = new CountingReader(
      new BytesPageReader(bytes, hdr.pageSize))
    val full = freshCounter()
    val docsRoot = tables(full, hdr).find(_.name == "docs").get.rootPage
    val nFull = { scanTable(full, hdr, docsRoot).size; full.seen.size }
    val point = freshCounter()
    val got = scanTable(point, hdr, docsRoot, 300, 300).toSeq
    assert(got.map(_.rowid) == Seq(300L))
    assert(point.seen.size <= 4, // root + one leaf (+ overflow if any)
      s"point lookup read ${point.seen.size} pages vs $nFull full-scan")
    assert(nFull > 50, s"fixture should be multi-page, got $nFull")
  }

  test("pushdown: range results equal the unpushed filter; empty window plans zero work") {
    val all = read(fixture, "docs").collect()
      .filter(r => { val id = r.getAs[Long]("id"); id >= 3000 && id <= 3300 })
    val pushed = read(fixture, "docs")
      .filter(col("id") >= 3000 && col("id") <= 3300).collect()
    assert(pushed.map(_.getAs[Long]("id")).sorted.toSeq ==
      all.map(_.getAs[Long]("id")).sorted.toSeq)
    // window entirely outside the table: zero partitions, zero rows
    val none = read(fixture, "docs").filter(col("id") === 99999999L)
    assert(none.count() == 0)
    // IN-list narrows to [min,max]; values inside re-filtered by Spark
    val in3 = read(fixture, "docs")
      .filter(col("id").isin(30L, 3000L, 60L)).collect()
    assert(in3.map(_.getAs[Long]("id")).sorted.toSeq == Seq(30L, 60L, 3000L))
    // non-alias filters are untouched (kv has a TEXT pk, no alias);
    // v = i*i, i in 0..199 -> v > 38000 keeps i in 195..199
    assert(read(fixture, "kv").filter(col("v") > 38000).count() == 5)
  }

  test("pushdown: ChildRange overlap algebra") {
    import SqliteFile.ChildRange
    val c = ChildRange(100, 10, 20) // rowids in (10, 20]
    assert(c.overlaps(20, 25) && c.overlaps(11, 11) && c.overlaps(5, 11))
    assert(!c.overlaps(21, 30) && !c.overlaps(5, 10))
    assert(ChildRange(1, Long.MinValue, 5).overlaps(Long.MinValue, Long.MaxValue))
  }

  // ---- secondary-index eq pushdown ---------------------------------

  test("index catalog: CREATE INDEX and autoindex rows parse; DESC / " +
    "partial / expression shapes are cataloged but unusable") {
    import SqliteFile._
    val conf = new org.apache.hadoop.conf.Configuration()
    val pr = SqliteDataSourceV2.openReader(fixture, conf)
    try {
      val ix = indexes(pr, pr.header)
      val byName = ix.map(i => i.name -> i).toMap
      assert(byName("idx_docs_cat").usable &&
        byName("idx_docs_cat").columns == Seq("cat"))
      assert(byName("idx_docs_flag_score").usable &&
        byName("idx_docs_flag_score").columns == Seq("flag", "score"))
      assert(!byName("idx_docs_score_desc").usable, "DESC key: no probes")
      assert(!byName("idx_docs_partial").usable, "partial index: no probes")
      // kv's TEXT PRIMARY KEY autoindex (DDL-less) is recovered
      val auto = byName("sqlite_autoindex_kv_1")
      assert(auto.usable && auto.unique && auto.columns == Seq("k") &&
        auto.table == "kv")
      // parse unit: expression keys are unusable
      assert(!parseCreateIndex("e", "t", 9,
        "CREATE INDEX e ON t (lower(cat))").get.usable)
      assert(parseCreateIndex("u", "t", 9,
        "CREATE UNIQUE INDEX u ON t (a ASC, b)").get.unique)
    } finally pr.close()
  }

  test("collation safety: an index over a COLLATE NOCASE column is " +
    "cataloged but never probed (its B-tree is not BINARY-ordered); a " +
    "filter on it falls back to the scan and returns exactly the rows " +
    "sqlite returns; DESC/COLLATE primary keys disable the autoindex") {
    import SqliteFile._
    val conf = new org.apache.hadoop.conf.Configuration()
    val pr = SqliteDataSourceV2.openReader(fixture, conf)
    try {
      val ix = indexes(pr, pr.header).map(i => i.name -> i).toMap
      assert(!ix("idx_ci_name").usable,
        "a NOCASE-collated column's index must not be probed")
    } finally pr.close()
    // parse units: the collated flag and PK plainness
    val ct = parseCreateTable("t", 2,
      "CREATE TABLE t (name TEXT COLLATE NOCASE, v INT)")
    assert(ct.columns.head.collated && !ct.columns(1).collated)
    assert(!parseCreateTable("t", 2,
      "CREATE TABLE t (k TEXT PRIMARY KEY DESC, v INT)").pkPlain)
    assert(!parseCreateTable("t", 2,
      "CREATE TABLE t (k TEXT PRIMARY KEY COLLATE NOCASE, v INT)").pkPlain)
    assert(!parseCreateTable("t", 2,
      "CREATE TABLE t (a TEXT, b INT, PRIMARY KEY (a DESC, b))").pkPlain)
    assert(parseCreateTable("t", 2,
      "CREATE TABLE t (a TEXT, b INT, PRIMARY KEY (a ASC, b))").pkPlain)
    // end-to-end: the filter still answers CORRECTLY via the scan path
    SqliteDataSourceV2.lastIndexProbe = None
    val got = read(fixture, "ci").filter(col("name") === "banana")
      .collect().map(_.getAs[Long]("id")).sorted.toSeq
    assert(got == Seq(2L), s"binary equality keeps exactly 'banana': $got")
    assert(SqliteDataSourceV2.lastIndexProbe == None,
      "no probe may run against a collated index")
    // and the mixed-case family is all there via the scan
    assert(read(fixture, "ci").count() == 5)
  }

  test("probe edge cases: a NaN literal falls back to the scan with " +
    "Spark's NaN==NaN semantics intact; a REAL-column index probes " +
    "normally; a sub-header main file without a sidecar fails loudly") {
    // NaN: sqlite stores none, Spark's EqualTo(NaN, NaN) is TRUE — only
    // the scan fallback preserves that; must not throw at plan time
    SqliteDataSourceV2.lastIndexProbe = None
    assert(read(fixture, "docs")
      .filter(col("score") === Double.NaN).count() == 0)
    assert(SqliteDataSourceV2.lastIndexProbe == None,
      "NaN must not be probed through the index")
    // a normal REAL probe through idx_docs_score: exact dyadic match
    val viaIdx = read(fixture, "docs").filter(col("score") === 2.25)
      .collect().map(_.getAs[Long]("id")).sorted.toSeq
    val viaScan = read(fixture, "docs").collect()
      .filter(r => !r.isNullAt(r.fieldIndex("score")) &&
        r.getAs[Double]("score") == 2.25)
      .map(_.getAs[Long]("id")).sorted.toSeq
    assert(viaIdx == viaScan && viaIdx.nonEmpty)
    assert(SqliteDataSourceV2.lastIndexProbe.exists(_._1 ==
      "idx_docs_score"))
    // short main file, no sidecar: a specific message, not a bare EOF
    val dir = java.nio.file.Files.createTempDirectory("graft_short")
    val stub = dir.resolve("s.db")
    java.nio.file.Files.write(stub, Array.fill[Byte](50)(0))
    val e = intercept[IllegalArgumentException] {
      SqliteDataSourceV2.openReader(stub.toString,
        new org.apache.hadoop.conf.Configuration())
    }
    assert(e.getMessage.contains("-wal sidecar"))
  }

  test("mid-query checkpoint detection: a reader pinned to plan-time " +
    "generation salts fails loudly when the sidecar was re-salted " +
    "(RESTART) or vanished (TRUNCATE), never silently serves a " +
    "different generation") {
    val conf = new org.apache.hadoop.conf.Configuration()
    // the true salts of the committed fixture
    val pr = SqliteDataSourceV2.openReader(walFixture, conf)
    val (s1, s2, frames) = (pr.wal.salt1, pr.wal.salt2,
      pr.wal.framesCommitted)
    pr.close()
    assert(frames > 0)
    // correct pin: reads fine
    val ok = SqliteDataSourceV2.openReader(walFixture, conf, frames,
      Some((s1, s2)))
    try assert(ok.wal.framesCommitted == frames) finally ok.close()
    // RESTART simulation: pin salts that do not match the sidecar's
    val e1 = intercept[IllegalArgumentException] {
      SqliteDataSourceV2.openReader(walFixture, conf, frames,
        Some((s1 + 1, s2)))
    }
    assert(e1.getMessage.contains("checkpointed mid-query"))
    // TRUNCATE simulation: pinned snapshot but the sidecar is gone
    val dir = java.nio.file.Files.createTempDirectory("graft_trunc")
    java.nio.file.Files.copy(java.nio.file.Paths.get(walFixture),
      dir.resolve("t.db"))
    val e2 = intercept[IllegalArgumentException] {
      SqliteDataSourceV2.openReader(dir.resolve("t.db").toString, conf,
        frames, Some((s1, s2)))
    }
    assert(e2.getMessage.contains("vanished mid-query"))
  }

  test("index eq lookup: results equal the unpushed filter, for TEXT " +
    "(explicit index), TEXT pk (autoindex), and the numeric leading " +
    "column of a composite index") {
    // explicit index on cat — and PROOF the index path (not the
    // equally-correct scan fallback) served it
    SqliteDataSourceV2.lastIndexProbe = None
    val viaIdx = read(fixture, "docs").filter(col("cat") === "delta")
      .agg(count(lit(1)), sum(col("id"))).head
    val all = read(fixture, "docs").collect()
      .filter(r => r.getAs[String]("cat") == "delta")
    assert(viaIdx.getLong(0) == all.length)
    assert(viaIdx.getLong(1) == all.map(_.getAs[Long]("id")).sum)
    assert(SqliteDataSourceV2.lastIndexProbe ==
      Some(("idx_docs_cat", all.length)),
      s"expected an idx_docs_cat probe, got " +
        s"${SqliteDataSourceV2.lastIndexProbe}")
    // IN list
    val inRows = read(fixture, "docs")
      .filter(col("cat").isin("alpha", "theta")).count()
    assert(inRows == read(fixture, "docs").collect()
      .count(r => Set("alpha", "theta")(r.getAs[String]("cat"))))
    // autoindex on kv's TEXT pk: v = i*i for key-%03d
    val kvRow = read(fixture, "kv").filter(col("k") === "key-017").head
    assert(kvRow.getAs[Long]("v") == 289L)
    // composite index leading column (flag INTEGER)
    val flag1 = read(fixture, "docs").filter(col("flag") === 1L).count()
    assert(flag1 == read(fixture, "docs").collect()
      .count(r => !r.isNullAt(r.fieldIndex("flag")) &&
        r.getAs[Long]("flag") == 1L))
    // no matching rows: zero partitions, zero rows, no error
    assert(read(fixture, "docs").filter(col("cat") === "nope").count() == 0)
  }

  test("index eq lookup: pages touched scale with matches, not table " +
    "size (CountingReader proof on the raw B-trees)") {
    import SqliteFile._
    class CountingReader(inner: PageReader) extends PageReader {
      val seen = scala.collection.mutable.Set.empty[Int]
      def pageSize: Int = inner.pageSize
      def page(n: Int): Array[Byte] = { seen += n; inner.page(n) }
      def close(): Unit = inner.close()
    }
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture))
    val hdr = parseHeader(bytes.take(100))
    def freshCounter() = new CountingReader(
      new BytesPageReader(bytes, hdr.pageSize))
    val full = freshCounter()
    val docsRoot = tables(full, hdr).find(_.name == "docs").get.rootPage
    val nFull = { scanTable(full, hdr, docsRoot).size; full.seen.size }
    // kv pk probe: unique key -> O(depth_index + depth_table) pages
    val c1 = freshCounter()
    val kvIdx = indexes(c1, hdr).find(_.name == "sqlite_autoindex_kv_1").get
    c1.seen.clear()
    val rowids = indexRowidsEq(c1, hdr, kvIdx, VText("key-017"))
    assert(rowids.length == 1)
    assert(c1.seen.size <= 3,
      s"unique index probe read ${c1.seen.size} pages")
    // docs cat probe: ~187 matches out of 1501 rows; the index descent
    // must touch far fewer pages than the full table scan
    val c2 = freshCounter()
    val catIdx = indexes(c2, hdr).find(_.name == "idx_docs_cat").get
    c2.seen.clear()
    val catRowids = indexRowidsEq(c2, hdr, catIdx, VText("zeta"))
    assert(catRowids.length == 187)
    assert(c2.seen.size * 5 < nFull,
      s"index probe read ${c2.seen.size} pages vs $nFull full-scan")
    // cmpValues ordering unit: class ranks and numeric cross-type
    assert(cmpValues(VNull, VInt(-999)) < 0)
    assert(cmpValues(VInt(5), VReal(5.0)) == 0)
    assert(cmpValues(VInt(5), VReal(5.5)) < 0)
    assert(cmpValues(VReal(6.1), VInt(6)) > 0)
    assert(cmpValues(VText("abc"), VBlob(Array[Byte](0))) < 0)
    assert(cmpValues(VText("ab"), VText("abc")) < 0)
    // above 2^53 the comparison must stay exact (ulp at 2^60 is 256)
    assert(cmpValues(VInt(1L << 60), VReal((1L << 60).toDouble + 512)) < 0)
    assert(cmpValues(VInt((1L << 60) + 1), VReal((1L << 60).toDouble)) > 0)
  }

  test("aggregate pushdown: ungrouped unfiltered count(*)/min/max of the " +
    "rowid alias compute inside the source (decode-free leaf counts, " +
    "O(depth) descents); grouped/filtered/other-column shapes fall back") {
    val docs = read(fixture, "docs")
    val pushed = docs.agg(count(lit(1)), min(col("id")), max(col("id")))
    assert(pushed.queryExecution.executedPlan.toString
      .contains("pushed aggregates"),
      "count/min/max on the alias must push")
    val r = pushed.head
    assert(r.getLong(0) == 1501L)
    assert(r.getLong(1) == 3L)            // smallest id (i=1 -> 3)
    assert(r.getLong(2) == (1L << 40))    // the bigint row
    // WITHOUT ROWID count: interior index entries are rows too
    val wr = read(fixture, "wr_metrics").agg(count(lit(1)))
    assert(wr.queryExecution.executedPlan.toString
      .contains("pushed aggregates"))
    assert(wr.head.getLong(0) == 360L)
    // fallbacks: grouped, filtered, and non-alias min must NOT push
    for (df <- Seq(
        docs.groupBy("cat").agg(count(lit(1))),
        docs.filter(col("cat") === "delta").agg(count(lit(1))),
        docs.agg(min(col("score"))))) {
      assert(!df.queryExecution.executedPlan.toString
        .contains("pushed aggregates"), df.queryExecution.toString)
    }
    assert(docs.filter(col("cat") === "delta").agg(count(lit(1)))
      .head.getLong(0) == 188L)
    // empty table: count 0, min/max null (writer-made empty table)
    val db = java.nio.file.Files.createTempDirectory("graft_aggp")
      .resolve("e.db").toString
    graft.sources.SqliteWriter.write(db, Seq(graft.sources.SqliteWriter
      .TableSpec("e", "CREATE TABLE e (id INTEGER PRIMARY KEY, v TEXT)",
        Nil)))
    val er = read(db, "e").agg(count(lit(1)), min(col("id"))).head
    assert(er.getLong(0) == 0L && er.isNullAt(1))
  }

  // ---- WAL mode: live-database reads through the sidecar overlay -----

  private def walFixture = SqliteDataSourceV2.fixtureWalPath

  test("WAL mode: absent/empty -wal (fully checkpointed) reads the main " +
    "file normally") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wal")
    val db = dir.resolve("w.db")
    java.nio.file.Files.copy(java.nio.file.Paths.get(fixture), db)
    // flip the header's read/write version bytes to 2 (WAL)
    val ch = java.nio.channels.FileChannel.open(db,
      java.nio.file.StandardOpenOption.WRITE)
    try ch.write(java.nio.ByteBuffer.wrap(Array[Byte](2, 2)), 18L)
    finally ch.close()
    assert(read(db.toString, "kv").count() == 200)
    // an empty sidecar (header-less) is a checkpointed WAL: same reads
    java.nio.file.Files.write(dir.resolve("w.db-wal"), Array.empty[Byte])
    assert(read(db.toString, "kv").count() == 200)
  }

  test("WAL fixture: committed transactions in the un-checkpointed -wal " +
    "are visible — updates, growth past the main file, deletes — and a " +
    "main-file-only read WOULD have returned the stale pre-WAL state") {
    val readings = read(walFixture, "readings")
    // committed view (sqlite3-computed at fixture time): 1200 rows
    // inserted minus the id%97 deletes
    val expectTotal = 1200 - (1 to 1200).count(_ % 97 == 0)
    assert(readings.count() == expectTotal)
    // txn-1/4 updates are visible, newest wins (alert2 over alert).
    // txn 1 ran BEFORE the inserts (alerts only on id<=800); txn 4's
    // alert2 ran after (ids to 1200) — matching sqlite3's own view
    assert(readings.filter(col("status").startsWith("alert")).count() ==
      ((1 to 800).count(i => i % 50 == 0 && i % 97 != 0) +
        (801 to 1200).count(i => i % 100 == 0 && i % 97 != 0)))
    assert(readings.filter(col("status") === "alert2").count() ==
      (1 to 1200).count(i => i % 100 == 0 && i % 97 != 0))
    // growth: rows 801+ live on pages past the main file's last page
    assert(readings.agg(max(col("id"))).head.getLong(0) == 1200L)
    // THE STALE-READ PROOF: the same main file WITHOUT the overlay (a
    // BytesPageReader sees no sidecar) returns the frozen pre-WAL state
    import SqliteFile._
    val mainBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(walFixture))
    val hdr = parseHeader(mainBytes.take(100))
    val pr = new BytesPageReader(mainBytes, hdr.pageSize)
    val staleDocs = tables(pr, hdr).find(_.name == "readings").get
    val staleRows = scanTable(pr, hdr, staleDocs.rootPage).size
    assert(staleRows == 800, "main-file-only read must see the stale " +
      s"pre-WAL 800 rows, got $staleRows")
    assert(staleRows != expectTotal)
  }

  test("WAL fixture: a table CREATED after the WAL switch is visible " +
    "(page-1/sqlite_master override) and fully readable") {
    val conf = new org.apache.hadoop.conf.Configuration()
    val names = SqliteDataSourceV2.listTables(walFixture, conf).map(_.name)
    assert(names.contains("wal_only"),
      s"catalog through the overlay must list wal_only, got $names")
    val wo = read(walFixture, "wal_only")
    assert(wo.count() == 120)
    assert(wo.agg(sum(col("n"))).head.getLong(0) ==
      (0 until 120).map(i => i.toLong * i).sum)
    // ... while the main-file-only catalog does NOT know the table
    import SqliteFile._
    val mainBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(walFixture))
    val hdr = parseHeader(mainBytes.take(100))
    val pr = new BytesPageReader(mainBytes, hdr.pageSize)
    assert(!tables(pr, hdr).map(_.name).contains("wal_only"))
  }

  test("WAL torn tail: frames after the last valid commit — bad salts, " +
    "bad checksum, or a truncated frame — are dropped like sqlite's own " +
    "recovery; the committed prefix still reads") {
    val walBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(walFixture + "-wal"))
    val mainBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(walFixture))
    val ps = SqliteFile.parseHeader(mainBytes.take(100)).pageSize
    val clean = graft.sources.SqliteWal.parse(walBytes, ps)
    assert(!clean.isEmpty && clean.framesCommitted == clean.framesSeen)
    // torn tail: append a full frame of garbage (salt mismatch)
    val torn = walBytes ++ Array.fill[Byte](24 + ps)(0x5a)
    val t = graft.sources.SqliteWal.parse(torn, ps)
    assert(t.frameOffsets == clean.frameOffsets && t.dbSizePages ==
      clean.dbSizePages, "garbage tail must not change the committed view")
    // truncated mid-frame: same committed view
    val trunc = walBytes.take(walBytes.length - ps / 2)
    val tr = graft.sources.SqliteWal.parse(trunc, ps)
    assert(tr.dbSizePages == clean.dbSizePages)
    // a VALID-looking frame with corrupted content fails the checksum
    // chain and is dropped along with everything after it
    val corrupt = walBytes.clone()
    val lastFrameContent = 32 + (clean.framesSeen - 1) * (24 + ps) + 24
    corrupt(lastFrameContent + 100) =
      (corrupt(lastFrameContent + 100) ^ 0xff).toByte
    val c = graft.sources.SqliteWal.parse(corrupt, ps)
    assert(c.framesCommitted < clean.framesCommitted,
      "a corrupted final commit must fall back to the previous commit")
    // the whole-file reads still work end-to-end on the torn sidecar
    val dir = java.nio.file.Files.createTempDirectory("graft_wal_torn")
    java.nio.file.Files.copy(java.nio.file.Paths.get(walFixture),
      dir.resolve("t.db"))
    java.nio.file.Files.write(dir.resolve("t.db-wal"), torn)
    assert(read(dir.resolve("t.db").toString, "readings").count() ==
      1200 - (1 to 1200).count(_ % 97 == 0))
  }

  test("UTF-16 files (both byte orders): text serials, non-ASCII DDL, " +
    "surrogate pairs and overflow bodies read identically to sqlite3's " +
    "view") {
    val expect = Seq(
      (1L, "plain ascii", 10L),
      (2L, "café naïve résumé", 20L),
      (3L, "日本語テスト", 30L),
      (4L, "emoji 😀🚀 pair", 40L),
      (5L, "mixed é日😀z", 50L),
      (6L, "", 60L))
    for (name <- Seq("fixture_utf16le.db", "fixture_utf16be.db")) {
      val res = getClass.getClassLoader.getResource(s"graft/$name")
      assert(res != null, s"missing test resource graft/$name — run " +
        "tools/make_sqlite_utf16_fixture.py")
      val path = java.nio.file.Paths.get(res.toURI).toString
      val df = read(path, "msgs")
      // the DDL itself is UTF-16: the accented column name must parse
      assert(df.schema.fieldNames.toSeq == Seq("id", "téxt", "n"),
        s"$name schema: ${df.schema.fieldNames.toSeq}")
      val got = df.filter(col("id") <= 6)
        .select(col("id"), col("téxt"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(got == expect, s"$name rows mismatch")
      // the overflowing UTF-16 body reassembles to the exact string
      val ov = df.filter(col("id") === 7).head.getString(1)
      assert(ov == "ovérflow " * 700, s"$name overflow length " +
        ov.length)
      assert(df.count() == 7)
    }
  }

  test("WAL snapshot pinning: a frame-count prefix parses identically to " +
    "the physically truncated sidecar, and a reader pinned at an earlier " +
    "commit serves exactly that commit's view (live-writer consistency: " +
    "partitions planned together read the same snapshot)") {
    import SqliteFile._
    val walBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(walFixture + "-wal"))
    val mainBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(walFixture))
    val ps = parseHeader(mainBytes.take(100)).pageSize
    val full = graft.sources.SqliteWal.parse(walBytes, ps)
    // the fixture has 4 committed transactions: find their boundaries
    val boundaries = (1 to full.framesSeen)
      .map(k => graft.sources.SqliteWal.parse(walBytes, ps, k)
        .framesCommitted)
      .distinct.filter(_ > 0)
    // 4 scripted transactions; python's sqlite3 may auto-commit before
    // the DDL, splitting txn 3 — at least 4 boundaries either way
    assert(boundaries.length >= 4, s"expected >=4 commits, $boundaries")
    for (b <- boundaries) {
      val viaLimit = graft.sources.SqliteWal.parse(walBytes, ps, b)
      val viaTrunc = graft.sources.SqliteWal.parse(
        walBytes.take(32 + b * (24 + ps)), ps)
      assert(viaLimit.frameOffsets == viaTrunc.frameOffsets &&
        viaLimit.dbSizePages == viaTrunc.dbSizePages,
        s"prefix-pin at $b frames must equal the truncated sidecar")
    }
    // end-to-end: pinned at the FIRST commit = txn 1's view — still
    // 800 rows (updates only), 16 alerts, and wal_only doesn't exist
    val conf = new org.apache.hadoop.conf.Configuration()
    val pr1 = SqliteDataSourceV2.openReader(walFixture, conf,
      boundaries.head)
    try {
      val names = tables(pr1, pr1.header).map(_.name)
      assert(!names.contains("wal_only"), "txn-3's table is the future")
      val rt = tables(pr1, pr1.header).find(_.name == "readings").get
      val rows = scanTable(pr1, pr1.header, rt.rootPage)
        .map(r => decodeRecord(r.payload, _ => true)).toSeq
      assert(rows.size == 800)
      assert(rows.count(_.lift(3).contains(VText("alert"))) == 16)
    } finally pr1.close()
    // pinned at 0 = the pre-WAL main file: 800 rows, NO alerts
    val pr0 = SqliteDataSourceV2.openReader(walFixture, conf, 0)
    try {
      val rt = tables(pr0, pr0.header).find(_.name == "readings").get
      val rows = scanTable(pr0, pr0.header, rt.rootPage)
        .map(r => decodeRecord(r.payload, _ => true)).toSeq
      assert(rows.size == 800)
      assert(rows.count(_.lift(3).contains(VText("alert"))) == 0)
    } finally pr0.close()
  }

  test("index probe THROUGH the WAL overlay: wal_only's PK autoindex " +
    "pages exist only as WAL frames, and the eq lookup descends them " +
    "correctly") {
    SqliteDataSourceV2.lastIndexProbe = None
    val row = read(walFixture, "wal_only").filter(col("k") === "wk-050")
      .head
    assert(row.getAs[Long]("n") == 2500L) // n = i*i at i=50
    assert(SqliteDataSourceV2.lastIndexProbe.exists(_._1 ==
      "sqlite_autoindex_wal_only_1"),
      s"expected an autoindex probe, got " +
        s"${SqliteDataSourceV2.lastIndexProbe}")
    // no match: zero partitions through the overlay too
    assert(read(walFixture, "wal_only").filter(col("k") === "zz").count()
      == 0)
  }

  test("WAL checksum unit: both word orders round-trip the spec algebra") {
    import graft.sources.SqliteWal
    val data = Array.tabulate[Byte](16)(i => (i * 17 + 3).toByte)
    val (a0, a1) = SqliteWal.checksum(0, 0, data, 0, 16,
      bigEndianWords = true)
    val (b0, b1) = SqliteWal.checksum(0, 0, data, 0, 16,
      bigEndianWords = false)
    assert((a0, a1) != (b0, b1), "word order must matter")
    // cumulative = one pass over the concatenation
    val (c0, c1) = SqliteWal.checksum(0, 0, data, 0, 8,
      bigEndianWords = true)
    val (d0, d1) = SqliteWal.checksum(c0, c1, data, 8, 8,
      bigEndianWords = true)
    assert((d0, d1) == ((a0, a1)), "chained == single-pass")
  }

  test("SQL DDL surface: CREATE TABLE ... USING graft-sqlite composes with spark.sql") {
    spark.sql("DROP TABLE IF EXISTS sqlite_docs_sql")
    spark.sql(s"""CREATE TABLE sqlite_docs_sql USING `graft-sqlite`
      OPTIONS (path '$fixture', table 'docs')""")
    val n = spark.sql(
      "SELECT count(*) FROM sqlite_docs_sql WHERE id BETWEEN 900 AND 2400")
      .head.getLong(0)
    assert(n == 501) // ids 900..2400 step 3
    spark.sql("DROP TABLE sqlite_docs_sql")
  }

  test("corruption guard: a cyclic child pointer fails fast instead of hanging") {
    import SqliteFile._
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture))
    val hdr = parseHeader(bytes.take(100))
    val pr = new BytesPageReader(bytes, hdr.pageSize)
    val docsRoot = tables(pr, hdr).find(_.name == "docs").get.rootPage
    // fabricate an interior page whose first child points BACK AT the
    // root: traversal must trip the visited-pages cap, not loop forever
    val rootBytes = pr.page(docsRoot)
    assert((rootBytes(0) & 0xff) == 0x05, "docs root should be interior")
    val cellOff = ((rootBytes(12) & 0xff) << 8) | (rootBytes(13) & 0xff)
    val evil = rootBytes.clone()
    evil(cellOff) = ((docsRoot >> 24) & 0xff).toByte
    evil(cellOff + 1) = ((docsRoot >> 16) & 0xff).toByte
    evil(cellOff + 2) = ((docsRoot >> 8) & 0xff).toByte
    evil(cellOff + 3) = (docsRoot & 0xff).toByte
    val evilReader = new PageReader {
      def pageSize: Int = pr.pageSize
      def page(n: Int): Array[Byte] =
        if (n == docsRoot) evil.clone() else pr.page(n)
      def close(): Unit = ()
    }
    val e = intercept[Exception] {
      scanTable(evilReader, hdr, docsRoot).size
    }
    assert(e.getMessage.contains("cyclic"))
  }

  test("DDL parsing: PRIMARY\\s+KEY spellings set the rowid alias; " +
    "the keyword inside a DEFAULT literal or comment does not " +
    "(advisor r09)") {
    import SqliteFile._
    // newline/multi-space spellings sqlite itself accepts
    val nl = parseCreateTable("t", 2,
      "CREATE TABLE t (id INTEGER PRIMARY\n  KEY, v TEXT)")
    assert(nl.columns.head.rowidAlias, "PRIMARY\\nKEY must set the alias")
    val ms = parseCreateTable("t", 2,
      "CREATE TABLE t (id INTEGER  PRIMARY   KEY, v TEXT)")
    assert(ms.columns.head.rowidAlias)
    // DESC with newline still disables the alias (descending-key rule)
    val desc = parseCreateTable("t", 2,
      "CREATE TABLE t (id INTEGER PRIMARY\nKEY\nDESC, v TEXT)")
    assert(!desc.columns.head.rowidAlias)
    // the words inside a DEFAULT string literal must NOT set the flag
    val lit = parseCreateTable("t", 2,
      "CREATE TABLE t (id INTEGER DEFAULT 'primary key stuff', v TEXT)")
    assert(!lit.columns.head.rowidAlias)
    // ... nor inside a comment
    val cmt = parseCreateTable("t", 2,
      "CREATE TABLE t (id INTEGER /* primary key? no */, v TEXT)")
    assert(!cmt.columns.head.rowidAlias)
    val dash = parseCreateTable("t", 2,
      "CREATE TABLE t (id INTEGER -- primary key\n, v TEXT)")
    assert(!dash.columns.head.rowidAlias)
    // WITHOUT ROWID with embedded newline is still recognized
    val wr = parseCreateTable("t", 2,
      "CREATE TABLE t (k TEXT PRIMARY KEY, v INTEGER) WITHOUT\nROWID")
    assert(wr.withoutRowid)
  }

  test("header validation: stale in-header size (change counter != " +
    "version-valid-for, legacy mode) is distrusted instead of tripping " +
    "the cycle guard; read-version > 2 is rejected (advisor r09)") {
    import SqliteFile._
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture))
    val good = parseHeader(bytes.take(100))
    assert(good.pageCount > 0)
    // stale legacy size: bump the change counter so it no longer
    // matches version-valid-for, and shrink the declared size to 1 page
    // — a valid multi-page file a pre-size-field writer touched last
    val stale = bytes.take(100).clone()
    stale(24) = 0x7f; stale(25) = 0; stale(26) = 0; stale(27) = 9
    stale(28) = 0; stale(29) = 0; stale(30) = 0; stale(31) = 1
    val h = parseHeader(stale)
    assert(h.pageCount == 0L,
      "mismatched counters must zero the size (legacy fallback)")
    // the full file still scans fine with the cap disabled
    val pr = new BytesPageReader(bytes, h.pageSize)
    val docs = tables(pr, h).find(_.name == "docs").get
    assert(scanTable(pr, h, docs.rootPage).size > 0)
    // read-version above 2: reject loudly
    val rv = bytes.take(100).clone()
    rv(19) = 3
    val e = intercept[IllegalArgumentException](parseHeader(rv))
    assert(e.getMessage.contains("read version"))
  }

  test("low-level: varint and serial-type decode round corners") {
    import SqliteFile._
    assert(varint(Array(0x7f.toByte), 0) == (127L, 1))
    assert(varint(Array(0x81.toByte, 0x00), 0) == (128L, 2))
    // 9-byte varint: all-ones = -1
    assert(varint(Array.fill(9)(0xff.toByte), 0)._1 == -1L)
    assert(serialValue(1, Array(0x80.toByte), 0) == VInt(-128L))
    assert(serialValue(8, Array.empty, 0) == VInt(0L))
    assert(serialValue(9, Array.empty, 0) == VInt(1L))
    val pi = java.lang.Double.doubleToLongBits(3.5)
    val b = (0 until 8).map(i => ((pi >>> (56 - 8 * i)) & 0xff).toByte).toArray
    assert(serialValue(7, b, 0) == VReal(3.5))
  }

  // ---- r11: index range / composite-prefix / partial pushdown ----------

  test("index range pushdown: score bounds walk idx_docs_score and " +
    "match the scan; pages touched scale with matches (CountingReader)") {
    import SqliteFile._
    // end-to-end via the DSv2 path, with probe proof
    SqliteDataSourceV2.lastIndexProbe = None
    val viaIdx = read(fixture, "docs")
      .filter(col("score") >= 100.0 && col("score") < 110.0)
      .collect().map(_.getAs[Long]("id")).sorted.toSeq
    val viaScan = read(fixture, "docs").collect()
      .filter(r => !r.isNullAt(r.fieldIndex("score")) && {
        val v = r.getAs[Double]("score"); v >= 100.0 && v < 110.0 })
      .map(_.getAs[Long]("id")).sorted.toSeq
    assert(viaIdx == viaScan && viaIdx.length == 110)
    assert(SqliteDataSourceV2.lastIndexProbe ==
      Some(("idx_docs_score", 110)),
      s"expected idx_docs_score, got ${SqliteDataSourceV2.lastIndexProbe}")
    // exclusive vs inclusive bounds differ exactly at the endpoints
    SqliteDataSourceV2.lastIndexProbe = None
    val excl = read(fixture, "docs")
      .filter(col("score") > 100.0 && col("score") <= 110.0).count()
    val exclScan = read(fixture, "docs").collect().count(r =>
      !r.isNullAt(r.fieldIndex("score")) && {
        val v = r.getAs[Double]("score"); v > 100.0 && v <= 110.0 })
    assert(excl == exclScan)
    assert(SqliteDataSourceV2.lastIndexProbe.exists(_._1 ==
      "idx_docs_score"))
    // one-sided range still probes (lo-only); NULL scores stay out
    SqliteDataSourceV2.lastIndexProbe = None
    val hiOnly = read(fixture, "docs").filter(col("score") >= 124.0)
      .collect().map(_.getAs[Long]("id")).sorted.toSeq
    val hiScan = read(fixture, "docs").collect()
      .filter(r => !r.isNullAt(r.fieldIndex("score")) &&
        r.getAs[Double]("score") >= 124.0)
      .map(_.getAs[Long]("id")).sorted.toSeq
    assert(hiOnly == hiScan && hiOnly.nonEmpty)
    assert(SqliteDataSourceV2.lastIndexProbe.exists(_._1 ==
      "idx_docs_score"))
    // raw-B-tree page proof: the range descent reads far fewer pages
    // than the table holds
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture))
    val hdr = parseHeader(bytes.take(100))
    class CountingReader(inner: PageReader) extends PageReader {
      val seen = scala.collection.mutable.Set.empty[Int]
      def pageSize: Int = inner.pageSize
      def page(n: Int): Array[Byte] = { seen += n; inner.page(n) }
      def close(): Unit = inner.close()
    }
    val full = new CountingReader(new BytesPageReader(bytes, hdr.pageSize))
    val docsRoot = tables(full, hdr).find(_.name == "docs").get.rootPage
    val nFull = { scanTable(full, hdr, docsRoot).size; full.seen.size }
    val c = new CountingReader(new BytesPageReader(bytes, hdr.pageSize))
    val scoreIdx = indexes(c, hdr).find(_.name == "idx_docs_score").get
    c.seen.clear()
    val got = searchIndexRowids(c, hdr, scoreIdx.rootPage,
      IndexProbe(Nil, Some((VReal(100.0), true)),
        Some((VReal(110.0), false))), Long.MaxValue)
    assert(got.exists(_.length == 110))
    assert(c.seen.size * 5 < nFull,
      s"range probe read ${c.seen.size} pages vs $nFull full-scan")
    // hi-only probe: the index holds 136 NULL-score entries, which
    // rank BELOW every value — they must NOT be collected (Spark's
    // comparison can never match NULL; an unguarded hi-only descent
    // would buffer them all and trip the budget abort, review r11)
    val pr2 = new BytesPageReader(bytes, hdr.pageSize)
    val hiOnlyIdx = searchIndexRowids(pr2, hdr, scoreIdx.rootPage,
      IndexProbe(Nil, None, Some((VReal(5.0), true))), Long.MaxValue)
      .get.toSeq.sorted
    val hiOnlyScan = read(fixture, "docs").collect()
      .filter(r => !r.isNullAt(r.fieldIndex("score")) &&
        r.getAs[Double]("score") <= 5.0)
      .map(_.getAs[Long]("id")).sorted.toSeq
    assert(hiOnlyIdx == hiOnlyScan && hiOnlyIdx.nonEmpty,
      s"NULL keys leaked into a hi-only range: ${hiOnlyIdx.length} vs " +
        s"${hiOnlyScan.length}")
  }

  test("composite-prefix pushdown: eq on the leading column + range " +
    "on the next walks idx_docs_flag_score; a deeper prefix beats a " +
    "shorter one") {
    SqliteDataSourceV2.lastIndexProbe = None
    val viaIdx = read(fixture, "docs")
      .filter(col("flag") === 0 && col("score") > 20.0 &&
        col("score") <= 30.0)
      .collect().map(_.getAs[Long]("id")).sorted.toSeq
    val viaScan = read(fixture, "docs").collect()
      .filter { r =>
        !r.isNullAt(r.fieldIndex("flag")) &&
        r.getAs[Long]("flag") == 0L &&
        !r.isNullAt(r.fieldIndex("score")) && {
          val v = r.getAs[Double]("score"); v > 20.0 && v <= 30.0 }
      }.map(_.getAs[Long]("id")).sorted.toSeq
    assert(viaIdx == viaScan && viaIdx.length == 54)
    assert(SqliteDataSourceV2.lastIndexProbe ==
      Some(("idx_docs_flag_score", 54)),
      s"expected the composite index, got " +
        s"${SqliteDataSourceV2.lastIndexProbe}")
    // eq on BOTH columns of the composite: a two-column prefix probe
    SqliteDataSourceV2.lastIndexProbe = None
    val both = read(fixture, "docs")
      .filter(col("flag") === 1 && col("score") === 2.25)
      .collect().map(_.getAs[Long]("id")).sorted.toSeq
    val bothScan = read(fixture, "docs").collect()
      .filter(r => !r.isNullAt(r.fieldIndex("flag")) &&
        r.getAs[Long]("flag") == 1L &&
        !r.isNullAt(r.fieldIndex("score")) &&
        r.getAs[Double]("score") == 2.25)
      .map(_.getAs[Long]("id")).sorted.toSeq
    assert(both == bothScan)
    assert(SqliteDataSourceV2.lastIndexProbe.exists(_._1 ==
      "idx_docs_flag_score"))
  }

  test("partial-index implication: flag = 1 AND title = ? probes " +
    "idx_docs_partial; without the implying conjunct it never does") {
    import SqliteFile._
    // catalog: the partial index carries its WHERE conjunct
    val conf = new org.apache.hadoop.conf.Configuration()
    val pr = SqliteDataSourceV2.openReader(fixture, conf)
    val partial = try indexes(pr, pr.header)
      .find(_.name == "idx_docs_partial").get finally pr.close()
    assert(!partial.usable)
    assert(partial.usableIf == Some(("flag", VInt(1L))))
    // implied: the probe runs through the partial index
    SqliteDataSourceV2.lastIndexProbe = None
    val got = read(fixture, "docs")
      .filter(col("flag") === 1 && col("title") === "doc 00123")
      .collect()
    assert(got.length == 1 && got.head.getAs[Long]("id") == 369L)
    assert(SqliteDataSourceV2.lastIndexProbe ==
      Some(("idx_docs_partial", 1)),
      s"expected idx_docs_partial, got " +
        s"${SqliteDataSourceV2.lastIndexProbe}")
    // NOT implied (flag = 0): the partial index omits those rows — it
    // must not serve the probe; answers stay correct either way
    SqliteDataSourceV2.lastIndexProbe = None
    val none = read(fixture, "docs")
      .filter(col("flag") === 0 && col("title") === "doc 00123").count()
    assert(none == 0)
    assert(!SqliteDataSourceV2.lastIndexProbe.exists(_._1 ==
      "idx_docs_partial"),
      "a flag=0 probe must never use the flag=1 partial index")
    // NOT implied (IN, not single eq): same
    SqliteDataSourceV2.lastIndexProbe = None
    read(fixture, "docs")
      .filter(col("flag").isin(0, 1) && col("title") === "doc 00123")
      .count()
    assert(!SqliteDataSourceV2.lastIndexProbe.exists(_._1 ==
      "idx_docs_partial"),
      "IN(0,1) does not imply flag=1")
    // parse units: only the trivially-provable WHERE form qualifies
    assert(parsePartialWhere(" WHERE flag = 1 ") == Some(("flag",
      VInt(1L))))
    assert(parsePartialWhere(" WHERE \"flag\" = 1") == Some(("flag",
      VInt(1L))))
    assert(parsePartialWhere(" WHERE kind = 'a''b'") == Some(("kind",
      VText("a'b"))))
    assert(parsePartialWhere(" WHERE flag = 1 AND x = 2") == None)
    assert(parsePartialWhere(" WHERE flag IS NULL") == None)
    assert(parsePartialWhere(" WHERE flag > 1") == None)
  }

  test("index probe budget: an unselective probe aborts DURING the " +
    "descent (rowids-only buffering) and falls back to the scan") {
    import SqliteFile._
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture))
    val hdr = parseHeader(bytes.take(100))
    val pr = new BytesPageReader(bytes, hdr.pageSize)
    val flagIdx = indexes(pr, hdr).find(_.name == "idx_docs_flag_score").get
    // flag=1 matches ~750 rows; a 100-row budget must abort mid-descent
    val aborted = searchIndexRowids(pr, hdr, flagIdx.rootPage,
      IndexProbe(Seq(VInt(1L))), 100L)
    assert(aborted.isEmpty, "over-budget probe must return None")
    // and an unlimited run confirms the true count exceeds the budget
    val fullRun = searchIndexRowids(pr, hdr, flagIdx.rootPage,
      IndexProbe(Seq(VInt(1L))), Long.MaxValue)
    assert(fullRun.exists(_.length > 100))
    // DSv2 end-to-end: the capped option falls back and stays CORRECT
    SqliteDataSourceV2.lastIndexProbe = None
    val n = spark.read.format("graft-sqlite").option("table", "docs")
      .option("maxIndexLookupRows", "100")
      .load(fixture).filter(col("flag") === 1).count()
    assert(n == read(fixture, "docs").collect()
      .count(r => !r.isNullAt(r.fieldIndex("flag")) &&
        r.getAs[Long]("flag") == 1L))
    assert(SqliteDataSourceV2.lastIndexProbe == None,
      "a capped probe must fall back to the scan, not record a probe")
  }

  test("raw-byte text ordering: an indexed TEXT key holding invalid " +
    "UTF-8 still compares in stored-byte order (no U+FFFD mangling)") {
    import SqliteFile._
    // craft a single-leaf index page with keys that decode-then-
    // re-encode would REORDER: 0xC3 (invalid alone, decodes to U+FFFD
    // = 0xEF 0xBF 0xBD) sorts BELOW 0xE0 in raw bytes but ABOVE it
    // after mangling. Records: (text key, rowid int).
    val ps = 512
    def rec(key: Array[Byte], rowid: Long): Array[Byte] = {
      val st = 13 + 2 * key.length
      Array[Byte](3, st.toByte, 1) ++ key ++ Array(rowid.toByte)
    }
    // the leaf in RAW-BYTE (BINARY collation) order: zz < C3 < E0 —
    // after U+FFFD mangling the two invalid keys would both decode to
    // EF BF BD and compare ABOVE 'zz' AND equal to each other
    val ordered = Seq(rec("zz".getBytes("UTF-8"), 3L),
      rec(Array(0xC3.toByte), 1L), rec(Array(0xE0.toByte), 2L))
    val pg = new Array[Byte](ps)
    pg(0) = 0x0a // index leaf
    var content = ps
    val offs = ordered.map { r =>
      val cell = Array[Byte](r.length.toByte) ++ r // payload-len varint
      content -= cell.length
      System.arraycopy(cell, 0, pg, content, cell.length)
      content
    }
    pg(3) = 0; pg(4) = ordered.length.toByte
    pg(5) = ((content >> 8) & 0xff).toByte; pg(6) = (content & 0xff).toByte
    offs.zipWithIndex.foreach { case (o, i) =>
      pg(8 + 2 * i) = ((o >> 8) & 0xff).toByte
      pg(9 + 2 * i) = (o & 0xff).toByte
    }
    val hdr = Header(ps, 0, 1L, 1)
    val pr = new PageReader {
      def pageSize: Int = ps
      def page(n: Int): Array[Byte] = pg
      def close(): Unit = ()
    }
    // a Spark probe can never EQUAL an invalid-UTF-8 stored key (its
    // UTF-8 re-encoding is always valid), so the guarantee under test
    // is SKIP-NOT-MISS: probing the valid neighbor 'zz' and ranging
    // across the invalid keys must order by STORED bytes — the mangled
    // order (both invalid keys = U+FFFD, above 'zz', equal to each
    // other) would derail the descent on a multi-level tree
    val got = searchIndexRowids(pr, hdr, 2, // page 1 = header offset
      IndexProbe(Seq(VText("zz"))), Long.MaxValue)
    assert(got.exists(_.toSeq == Seq(3L)),
      s"probe for 'zz' among invalid-UTF-8 keys: $got")
    // and a RANGE over everything >= "z" returns only the valid row
    // without tripping on the invalid keys
    val rng = searchIndexRowids(pr, hdr, 2,
      IndexProbe(Nil, Some((VText("z"), true)), None), Long.MaxValue)
    assert(rng.exists(_.toSeq.sorted == Seq(1L, 2L, 3L)),
      s"raw-byte order keeps invalid keys ABOVE 'z': $rng")
  }

  test("quote-aware DDL parsing: '(' inside a quoted identifier does " +
    "not open the column list") {
    import SqliteFile._
    val ix = parseCreateIndex("i(x", "t", 5,
      "CREATE INDEX \"i(x\" ON t (a, b)").get
    assert(ix.columns == Seq("a", "b") && ix.usable)
    val ct = parseCreateTable("t(1", 2,
      "CREATE TABLE \"t(1\" (a INTEGER PRIMARY KEY, b TEXT)")
    assert(ct.columns.map(_.name) == Seq("a", "b"))
    assert(ct.columns.head.rowidAlias)
  }

  test("main-file pin: a reader opened with a stale main pin fails " +
    "loudly (PASSIVE/FULL checkpoint backfill detection)") {
    val conf = new org.apache.hadoop.conf.Configuration()
    val pr = SqliteDataSourceV2.openReader(walFixture, conf)
    val pin = pr.mainPinState
    pr.close()
    // correct pin opens fine
    val ok = SqliteDataSourceV2.openReader(walFixture, conf,
      mainPin = Some(pin))
    ok.close()
    // stale pin (as if a checkpoint backfilled since planning): loud
    val e = intercept[IllegalArgumentException] {
      SqliteDataSourceV2.openReader(walFixture, conf,
        mainPin = Some((pin._1 + 1, pin._2, pin._3)))
    }
    assert(e.getMessage.contains("backfilled"))
    val e2 = intercept[IllegalArgumentException] {
      SqliteDataSourceV2.openReader(walFixture, conf,
        mainPin = Some((pin._1, pin._2 + 4096, pin._3)))
    }
    assert(e2.getMessage.contains("backfilled"))
  }
}
