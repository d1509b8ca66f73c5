package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns, SupportsReportStatistics, Statistics}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import SqliteFile._

/** DataSourceV2 connector for SQLite 3 database files —
  * `spark.read.format("graft-sqlite").option("table", "DWH_DOCUMENT")
  * .load("/path/to/drwh.db")` — native read of the reference's actual
  * warehouse storage (`script.py:125`), no JDBC driver involved
  * (sqlite-jdbc is unvendorable offline, SCALE.md §6i; the JDBC
  * *upsert* surface is proven separately against embedded Derby).
  *
  * Schema comes from the file's own `sqlite_master` DDL via SQLite's
  * documented affinity rules: INTEGER→long, TEXT (CHAR/CLOB/TEXT)→
  * string, REAL (REAL/FLOA/DOUB)→double, BLOB→binary, NUMERIC (e.g.
  * the reference's DATE columns, which SQLite stores as ISO text)→
  * string. Cells are dynamically typed on disk; each value is coerced
  * to the column's affinity type (unparseable coercions yield null,
  * never a throw — a type-fluid SQLite file is data, not an error).
  * An INTEGER PRIMARY KEY column is a ROWID ALIAS: the record stores
  * NULL and the B-tree rowid carries the value — the reader
  * substitutes it, so `DWH_PATIENT.PATIENT_NUM` reads back real keys.
  *
  * Scale: the table B-tree root's children become the InputPartitions
  * (disjoint page subtrees in rowid order, ~pageSize/16 fan-out per
  * interior level), grouped to `maxPartitions` (default 32) — a
  * multi-GB warehouse file scans with executor parallelism and NO
  * driver materialization; each reader positioned-reads only its
  * subtree's pages. Column pruning reaches the record decoder: unneeded
  * cell bodies are length-skipped, not decoded.
  *
  * Options: `table` (required — table name, case-insensitive),
  * `maxPartitions` (default 32). The path must be a single .db file.
  */
class SqliteDataSourceV2 extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-sqlite"

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SqliteDataSourceV2.sparkSchema(SqliteDataSourceV2.resolveTable(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SqliteTable(schema, new CaseInsensitiveStringMap(properties))
}

object SqliteDataSourceV2 {

  /** Hadoop-positioned page reader: opens the file once, `readFully`
    * per page. Works for any Hadoop filesystem (file://, hdfs://,
    * s3a:// …); object stores serve the positioned reads as ranged
    * GETs.
    *
    * WAL-AWARE: a journal_mode=WAL database (read/write version 2,
    * header bytes 18/19) keeps committed transactions as page images in
    * a `-wal` sidecar until checkpoint — a LIVE warehouse (the
    * reference keeps one long-lived connection open, `script.py:123`)
    * is exactly this shape. When a non-empty sidecar is present its
    * committed frames are parsed ([[SqliteWal]], salt+checksum chain
    * respected, torn tails dropped like sqlite's own recovery) and
    * OVERLAY the main file: `page(n)` serves the newest committed WAL
    * image when one exists, the main-file page otherwise. The header
    * itself is re-read through the overlay (page 1 may live in the
    * WAL) and the page count comes from the last commit frame's dbSize
    * (the database may have GROWN inside the WAL). A checkpointed or
    * absent sidecar degrades to a plain main-file read. */
  final class HadoopPageReader(path: String, conf: Configuration,
                               walFrameLimit: Int = -1,
                               walSalts: Option[(Long, Long)] = None,
                               mainPin: Option[(Long, Long, Long)] = None,
                               pagePin: Option[(Seq[Int], Long)] = None)
      extends PageReader {
    private val p = new Path(path)
    private val fs = p.getFileSystem(conf)
    private val in: FSDataInputStream = fs.open(p)
    private var walIn: FSDataInputStream = _
    /** The committed WAL view this reader serves. Executors receive
      * `walFrameLimit` AND the plan-time generation salts pinned by
      * the scan, so a live writer appending frames mid-query cannot
      * give two partitions different views (the written prefix is
      * immutable within a generation), and a checkpoint RESTART /
      * TRUNCATE between planning and execution — which re-salts or
      * removes the sidecar — fails LOUDLY instead of silently serving
      * frames from a different generation. */
    private val mainStatus = fs.getFileStatus(p)
    private val mainLen: Long = mainStatus.getLen
    /** Raw main-file state for MID-QUERY BACKFILL detection: (change
      * counter at header bytes 24-27 read from the RAW main file — not
      * the overlay — or -1 for a WAL-born db with no main header yet;
      * main byte length; main mtime). A PASSIVE/FULL checkpoint —
      * what the default wal_autocheckpoint runs — backfills committed
      * frames into the main file WITHOUT re-salting the sidecar, so an
      * executor pinned at frame count N could read post-pin pages from
      * the backfilled main file while serving others from the pinned
      * WAL prefix: a torn snapshot. The salts pin cannot see it
      * (advisor r10); this triple can — any backfill rewrites main
      * pages (mtime), usually page 1 (counter), and a grown db (len).
      * Executors verify it at open. Residual risk, documented: a
      * backfill that lands within the filesystem's mtime granularity
      * without touching page 1 or the length is still undetected —
      * local/HDFS mtimes are millisecond-grained, so in practice this
      * needs a sub-ms plan-to-execute window. */
    val mainPinState: (Long, Long, Long) = {
      val counter =
        if (mainLen >= 100) {
          val hb = new Array[Byte](4)
          in.readFully(24L, hb)
          ((hb(0) & 0xffL) << 24) | ((hb(1) & 0xffL) << 16) |
            ((hb(2) & 0xffL) << 8) | (hb(3) & 0xffL)
        } else -1L
      (counter, mainLen, mainStatus.getModificationTime)
    }
    mainPin.foreach { case (c, l, m) =>
      require(mainPinState == ((c, l, m)),
        s"sqlite: the main file of $path changed since the scan was " +
          s"planned (counter/len/mtime $mainPinState vs pinned " +
          s"($c,$l,$m)) — a checkpoint backfilled WAL frames " +
          "mid-query (PASSIVE/FULL checkpoints do not re-salt the " +
          "sidecar); re-run the query")
    }
    /** xxhash64 over the RAW main-file images of `pages` (not the WAL
      * overlay), chained page to page; a page at or beyond the main
      * file's end contributes a marker hash of its number instead, so
      * a backfill that MATERIALIZES it also changes the digest. This
      * closes the counter/len/mtime pin's residual window (a backfill
      * landing within mtime granularity that touches neither page 1
      * nor the length, advisor r11): the scan pins page 1 + the
      * scanned table's root at plan time and every executor recomputes
      * the digest at open. Sampled, not total — a backfill confined to
      * un-sampled leaf pages within the mtime tick remains possible in
      * principle; the sampled set catches every growth and every
      * spine/root rewrite at O(pages) cost instead of O(db). */
    def rawPageHash(pages: Seq[Int]): Long = {
      val psz = if (rawPageSize > 0) rawPageSize else 4096
      var h = 42L
      val buf = new Array[Byte](psz)
      for (pg <- pages.sorted.distinct) {
        val off = (pg - 1).toLong * psz
        if (off >= 0 && off + psz <= mainLen) {
          in.readFully(off, buf)
          h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(buf,
              org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, psz, h)
        } else {
          h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashLong(pg.toLong, h)
        }
      }
      h
    }
    // the page size every read needs: from the main header when one
    // exists; a database BORN in WAL mode (sqlite materializes the
    // main file lazily — page 1 and everything else live only in the
    // sidecar until the first checkpoint) carries it in the WAL header
    private var rawPageSize: Int = 0
    val wal: SqliteWal.WalMap = {
      val walPath = new Path(path + "-wal")
      val walLen0 = try {
        if (fs.exists(walPath)) fs.getFileStatus(walPath).getLen else 0L
      } catch { case _: Exception => 0L }
      val isWal =
        if (mainLen >= 100) {
          val h = new Array[Byte](100)
          in.readFully(0L, h)
          rawPageSize = parseHeader(h).pageSize // fixed at creation: safe
          (h(18) & 0xff) == 2 || (h(19) & 0xff) == 2
        } else {
          require(walLen0 >= SqliteWal.HeaderSize,
            s"sqlite: $path is only $mainLen bytes and has no usable " +
              "-wal sidecar — not a readable database (a WAL-born " +
              "database keeps every page in the -wal until its first " +
              "checkpoint; is the sidecar missing?)")
          true
        }
      val walLen = if (!isWal) 0L else walLen0
      if (walLen < SqliteWal.HeaderSize) {
        require(walFrameLimit <= 0 || walSalts.isEmpty,
          s"sqlite: the -wal sidecar of $path vanished mid-query (the " +
            s"plan pinned a $walFrameLimit-frame snapshot) — a " +
            "checkpoint TRUNCATE ran between planning and execution; " +
            "re-run the query")
        SqliteWal.WalMap(Map.empty, 0, 0, 0)
      } else {
        walIn = fs.open(walPath)
        // the committed-frame map is checksum-verified over the WHOLE
        // sidecar — an O(walLen) cost per reader open that a 32-reader
        // scan would pay 32×. Cached; the GENERATION SALTS are part of
        // the key (read cheaply from the 32-byte header first): a
        // checkpoint RESTART can refill the sidecar to the same length
        // within mtime granularity, and serving the old generation's
        // offsets against the new bytes would silently corrupt rows.
        val mtime = try fs.getFileStatus(walPath).getModificationTime
          catch { case _: Exception => 0L }
        val wh = new Array[Byte](SqliteWal.HeaderSize)
        walIn.readFully(0L, wh)
        def u32(o: Int): Long =
          ((wh(o) & 0xffL) << 24) | ((wh(o + 1) & 0xffL) << 16) |
            ((wh(o + 2) & 0xffL) << 8) | (wh(o + 3) & 0xffL)
        if (rawPageSize == 0) rawPageSize = u32(8).toInt // WAL-born
        val (s1, s2) = (u32(16), u32(20))
        val parsed = SqliteDataSourceV2.walMapCache.computeIfAbsent(
          (s"$path#$walFrameLimit#$s1#$s2", walLen, mtime),
          _ => SqliteWal.parse((pos, buf) => walIn.readFully(pos, buf),
            walLen, rawPageSize, walFrameLimit))
        walSalts.foreach { case (e1, e2) =>
          require(parsed.salt1 == e1 && parsed.salt2 == e2,
            s"sqlite: the -wal of $path was checkpointed mid-query " +
              "(generation salts changed since the scan was planned) " +
              "— re-run the query")
          require(walFrameLimit < 0 ||
            parsed.framesCommitted == walFrameLimit,
            s"sqlite: pinned WAL snapshot of $path no longer parses to " +
              s"$walFrameLimit committed frames " +
              s"(got ${parsed.framesCommitted}) — sidecar rewritten " +
              "mid-query; re-run the query")
        }
        require(mainLen >= 100 || parsed.frameOffsets.contains(1),
          s"sqlite: $path is WAL-born ($mainLen-byte main file) but the " +
            "sidecar holds no committed page 1 — no committed " +
            "transactions to read yet")
        parsed
      }
    }
    val header: Header = {
      // the EFFECTIVE page 1: the file header travels on it, and a
      // schema change since the last checkpoint lives in the WAL
      val h = java.util.Arrays.copyOf(page1ViaOverlay(), 100)
      val parsed0 = parseHeader(h)
      if (!wal.isEmpty)
        parsed0.copy(pageCount = wal.dbSizePages) // commit-frame size wins
      else if (parsed0.pageCount != 0L) parsed0
      // legacy/stale in-header size (parseHeader zeroes it): recover the
      // page count from the file length so the cycle guard and the
      // statistics estimate both keep working
      else parsed0.copy(pageCount =
        fs.getFileStatus(p).getLen / parsed0.pageSize)
    }
    // sampled-page digest verify — AFTER the wal block so rawPageSize
    // is known for any page size
    pagePin.foreach { case (pages, expect) =>
      val got = rawPageHash(pages)
      require(got == expect,
        s"sqlite: sampled main-file pages ${pages.mkString(",")} of " +
          s"$path changed since the scan was planned (digest $got vs " +
          s"pinned $expect) — a checkpoint backfilled WAL frames " +
          "mid-query inside the mtime granularity window; re-run the " +
          "query")
    }
    private def page1ViaOverlay(): Array[Byte] = {
      val buf = new Array[Byte](rawPageSize)
      wal.frameOffsets.get(1) match {
        case Some(off) => walIn.readFully(off, buf)
        case None => in.readFully(0L, buf)
      }
      buf
    }
    def pageSize: Int = header.pageSize
    def page(n: Int): Array[Byte] = {
      require(n >= 1, s"sqlite: page numbers are 1-based, got $n")
      val buf = new Array[Byte](header.pageSize)
      wal.frameOffsets.get(n) match {
        case Some(off) => walIn.readFully(off, buf)
        case None => in.readFully((n.toLong - 1) * header.pageSize, buf)
      }
      buf
    }
    def close(): Unit = {
      in.close()
      if (walIn != null) walIn.close()
    }
  }

  def openReader(path: String, conf: Configuration,
                 walFrameLimit: Int = -1,
                 walSalts: Option[(Long, Long)] = None,
                 mainPin: Option[(Long, Long, Long)] = None,
                 pagePin: Option[(Seq[Int], Long)] = None)
      : HadoopPageReader =
    new HadoopPageReader(path, conf, walFrameLimit, walSalts, mainPin,
      pagePin)

  /** Spark literal -> sqlite stored-value probe. The probe is in the
    * column's AFFINITY class (the filter value's Spark type IS the
    * affinity type), and sqlite's INSERT-time affinity conversion makes
    * stored values canonical in that class — so one probe per class is
    * complete for sqlite-written files (cmpValues already treats
    * VInt/VReal as one numeric class). */
  private[sources] def asProbeValue(v: Any): Option[Value] = v match {
    case s: String => Some(VText(s))
    case s: UTF8String => Some(VText(s.toString))
    case l: Long => Some(VInt(l))
    case i: Int => Some(VInt(i.toLong))
    case s: Short => Some(VInt(s.toLong))
    case b: Byte => Some(VInt(b.toLong))
    // NaN is unprobeable: sqlite stores NaN as NULL so no key equals
    // it under record order, but Spark's EqualTo treats NaN = NaN as
    // TRUE — only the scan fallback preserves those semantics (and
    // cmpValues' BigDecimal branch would throw on it)
    case d: Double => if (d.isNaN) None else Some(VReal(d))
    case f: Float => if (f.isNaN) None else Some(VReal(f.toDouble))
    case _ => None
  }

  /** Per-JVM cache of parsed WAL committed-frame maps, keyed by
    * (db path, -wal length, -wal mtime) — see HadoopPageReader. Bounded:
    * cleared wholesale past 64 entries (maps are offsets-only, small;
    * a long-lived executor reading many different live .db files is
    * the only way to grow it). */
  private[sources] val walMapCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long),
      SqliteWal.WalMap]() {
      override def computeIfAbsent(k: (String, Long, Long),
          f: java.util.function.Function[_ >: (String, Long, Long),
            _ <: SqliteWal.WalMap]): SqliteWal.WalMap = {
        if (size() > 64) clear()
        super.computeIfAbsent(k, f)
      }
    }

  /** Driver-side observability: the last successful index-eq
    * resolution as (indexName, nRowids) — written by
    * [[SqliteScan.planInputPartitions]], read by specs to prove a
    * query took the index path rather than silently falling back to
    * the (equally correct) parallel scan. */
  @volatile var lastIndexProbe: Option[(String, Int)] = None

  /** Filesystem path of the committed read-fixture
    * (tools/make_sqlite_fixture.py → classpath graft/fixture.db) — the
    * q321 oracle input. Resolves in place when the classpath entry is a
    * directory; extracts once to the JVM temp dir when jarred. */
  lazy val fixturePath: String = {
    val res = getClass.getClassLoader.getResource("graft/fixture.db")
    require(res != null, "graft-sqlite: fixture graft/fixture.db not on " +
      "classpath — run tools/make_sqlite_fixture.py")
    if (res.getProtocol == "file")
      java.nio.file.Paths.get(res.toURI).toString
    else {
      val tmp = java.nio.file.Files.createTempFile("graft-fixture", ".db")
      val in = res.openStream()
      try java.nio.file.Files.copy(in, tmp,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
      tmp.toFile.deleteOnExit()
      tmp.toString
    }
  }

  /** Filesystem path of the committed WAL-mode fixture
    * (tools/make_sqlite_wal_fixture.py → classpath
    * graft/fixture_wal.db + graft/fixture_wal.db-wal) — the q338
    * oracle input. The -wal sidecar must sit NEXT TO the main file, so
    * when the classpath entry is jarred BOTH are extracted into one
    * temp directory. */
  lazy val fixtureWalPath: String = {
    val cl = getClass.getClassLoader
    val res = cl.getResource("graft/fixture_wal.db")
    require(res != null, "graft-sqlite: fixture graft/fixture_wal.db not " +
      "on classpath — run tools/make_sqlite_wal_fixture.py")
    if (res.getProtocol == "file")
      java.nio.file.Paths.get(res.toURI).toString
    else {
      val dir = java.nio.file.Files.createTempDirectory("graft-walfix")
      dir.toFile.deleteOnExit()
      for (name <- Seq("fixture_wal.db", "fixture_wal.db-wal")) {
        val r = cl.getResource(s"graft/$name")
        require(r != null, s"graft-sqlite: classpath missing graft/$name")
        val in = r.openStream()
        val tgt = dir.resolve(name)
        try java.nio.file.Files.copy(in, tgt,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        finally in.close()
        tgt.toFile.deleteOnExit()
      }
      dir.resolve("fixture_wal.db").toString
    }
  }

  /** All ordinary tables in a .db file (driver-side catalog listing). */
  def listTables(path: String, conf: Configuration): Seq[SqliteTableDef] = {
    val pr = openReader(path, conf)
    try tables(pr, pr.header) finally pr.close()
  }

  private[sources] def resolveTable(options: CaseInsensitiveStringMap)
      : SqliteTableDef = {
    val path = Option(options.get("path")).getOrElse(throw
      new IllegalArgumentException("graft-sqlite: .load(path) is required " +
        "(a single .db file)"))
    val tableName = Option(options.get("table")).getOrElse(throw
      new IllegalArgumentException("graft-sqlite: option 'table' is " +
        "required — one of: " +
        listTables(path, XlsxDataSourceV2.sessionConf()).map(_.name)
          .mkString(", ")))
    val all = listTables(path, XlsxDataSourceV2.sessionConf())
    val t = all.find(_.name.equalsIgnoreCase(tableName)).getOrElse(
      throw new IllegalArgumentException(
        s"graft-sqlite: no table '$tableName' in $path — found: " +
          all.map(_.name).mkString(", ")))
    t
  }

  def affinityType(c: SqliteColumn): DataType = c.affinity match {
    case "INTEGER" => LongType
    case "TEXT"    => StringType
    case "REAL"    => DoubleType
    case "BLOB"    => BinaryType
    case "NUMERIC" => StringType // reference DATE columns: ISO text on disk
  }

  def sparkSchema(t: SqliteTableDef): StructType =
    StructType(t.columns.map(c => StructField(c.name, affinityType(c))))

  /** One-pass record decode straight to Spark internal values for the
    * requested stored positions — the reader hot path. The record
    * header is walked once (serial type + body offset per column, two
    * int arrays, no boxing); matched-affinity cells convert DIRECTLY
    * (TEXT→`UTF8String.fromBytes` with NO intermediate `String`,
    * ints/reals from the wire bytes). Mismatched-affinity cells take
    * the [[coerce]] slow path, so dynamic-typing semantics are
    * IDENTICAL to the boxed decoder — this is an allocation cut, not a
    * semantics fork (measured 2M-row scan: see SCALE.md §6k).
    * `out(i)` is null when the record is shorter than the schema. */
  def decodeSpark(payload: Array[Byte], positions: Array[Int],
                  dts: Array[DataType],
                  charset: String = "UTF-8"): Array[Any] = {
    val utf8 = charset == "UTF-8"
    val (hdrLen, n0) = varint(payload, 0)
    val maxOrd = if (positions.isEmpty) -1 else positions.max
    val sts = new Array[Long](maxOrd + 1)
    val offs = new Array[Int](maxOrd + 1)
    java.util.Arrays.fill(sts, -1L)
    var ho = n0
    var bo = hdrLen.toInt
    var i = 0
    while (ho < hdrLen && i <= maxOrd) {
      val (t, n) = varint(payload, ho)
      ho += n
      sts(i) = t
      offs(i) = bo
      bo += serialLen(t)
      i += 1
    }
    val out = new Array[Any](positions.length)
    var j = 0
    while (j < positions.length) {
      val p = positions(j)
      val st = if (p <= maxOrd) sts(p) else -1L
      out(j) =
        if (st < 0) null // record predates an ALTER TABLE ADD COLUMN
        else (st, dts(j)) match {
          case (0, _) => null
          case (8, LongType) => 0L
          case (9, LongType) => 1L
          case (t0, LongType) if t0 >= 1 && t0 <= 6 =>
            serialValue(t0, payload, offs(p)).asInstanceOf[VInt].v
          case (7, DoubleType) =>
            serialValue(7, payload, offs(p)).asInstanceOf[VReal].v
          case (t0, StringType) if t0 >= 13 && t0 % 2 == 1 =>
            if (utf8) UTF8String.fromBytes(payload, offs(p), serialLen(t0))
            else UTF8String.fromString(
              new String(payload, offs(p), serialLen(t0), charset))
          case (t0, BinaryType) if t0 >= 12 && t0 % 2 == 0 =>
            java.util.Arrays.copyOfRange(payload, offs(p),
              offs(p) + serialLen(t0))
          case (t0, dt) =>
            coerce(serialValue(t0, payload, offs(p), charset), dt)
        }
      j += 1
    }
    out
  }

  /** Affinity coercion: dynamic on-disk value → the column's static
    * Spark type. Lossless where SQLite itself round-trips; otherwise
    * null (documented: a TEXT cell in an INTEGER column that does not
    * parse is null here, where SQLite would surface the raw text —
    * Spark columns are statically typed, so the honest options are
    * null or throw, and a reader must not throw on data). */
  def coerce(v: Value, dt: DataType): Any = (v, dt) match {
    case (VNull, _) => null
    case (VInt(x), LongType) => x
    case (VReal(x), LongType) => x.toLong
    case (VText(s), LongType) =>
      s.trim.toLongOption.orElse(s.trim.toDoubleOption.map(_.toLong)).orNull
    case (VInt(x), DoubleType) => x.toDouble
    case (VReal(x), DoubleType) => x
    case (VText(s), DoubleType) => s.trim.toDoubleOption.orNull
    case (VText(s), StringType) => UTF8String.fromString(s)
    case (VInt(x), StringType) => UTF8String.fromString(x.toString)
    case (VReal(x), StringType) => UTF8String.fromString(
      if (x == x.floor && !x.isInfinite && math.abs(x) < 1e15)
        f"$x%.1f" // SQLite renders integral reals with one decimal
      else x.toString)
    case (VBlob(b), BinaryType) => b
    case (VText(s), BinaryType) => s.getBytes("UTF-8")
    case _ => null
  }
}

private[sources] class SqliteTable(tableSchema: StructType,
                                   options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  override def name(): String =
    s"graft-sqlite(${Option(options.get("path")).getOrElse("?")}#" +
      s"${Option(options.get("table")).getOrElse("?")})"

  override def schema(): StructType = tableSchema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    // merge load-time options (path/table live there) with scan options
    val merged = new java.util.HashMap[String, String](options)
    merged.putAll(o)
    new SqliteScanBuilder(tableSchema, new CaseInsensitiveStringMap(merged))
  }
}

private[sources] class SqliteScanBuilder(fullSchema: StructType,
                                         options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  // resolved ONCE per builder: each resolveTable opens the file and
  // scans the sqlite_master catalog (ranged GETs on an object store),
  // and pushFilters/pushAggregation/build would otherwise each pay it
  private lazy val resolved: SqliteTableDef =
    SqliteDataSourceV2.resolveTable(options)

  private var required: StructType = fullSchema
  private var accepted: Array[org.apache.spark.sql.sources.Filter] =
    Array.empty
  private var lo: Long = Long.MinValue
  private var hi: Long = Long.MaxValue
  // eq/IN literals on NON-rowid columns — resolved against a usable
  // secondary index at plan time (column name -> probe literals)
  private var eqCandidates: Map[String, Seq[Any]] = Map.empty
  // range comparisons on NON-rowid columns (column -> (op, literal)):
  // resolved at plan time to an index RANGE walk when a usable index
  // leads with that column (ops: "gt"/"ge"/"lt"/"le")
  private var rangeCandidates: Map[String, Seq[(String, Any)]] = Map.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** ROWID-RANGE pushdown: comparisons/equality/IN on the table's
    * rowid-alias column tighten a single [lo, hi] rowid window that
    * the B-tree scan prunes against — a key point lookup on a huge .db
    * reads O(depth) pages instead of every page (the set-at-a-time
    * form of the reference's per-document `WHERE HOSPITAL_PATIENT_ID
    * = ?`, S3/`exo_2.py:204-217`). ALL filters are returned as
    * residual: the range prune is exact by B-tree invariant, but
    * letting Spark re-evaluate keeps the connector's correctness
    * independent of it (belt and braces, zero extra I/O). */
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources._
    val t = resolved
    val aliasCol = t.columns.find(_.rowidAlias).map(_.name)
    def isAlias(attr: String) = aliasCol.exists(_.equalsIgnoreCase(attr))
    def asLong(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case _ => None
    }
    accepted = filters.filter {
      case EqualTo(a, v) if isAlias(a) => asLong(v).exists { l =>
        lo = math.max(lo, l); hi = math.min(hi, l); true }
      case GreaterThan(a, v) if isAlias(a) => asLong(v).exists { l =>
        lo = math.max(lo, if (l == Long.MaxValue) l else l + 1); true }
      case GreaterThanOrEqual(a, v) if isAlias(a) => asLong(v).exists { l =>
        lo = math.max(lo, l); true }
      case LessThan(a, v) if isAlias(a) => asLong(v).exists { l =>
        hi = math.min(hi, if (l == Long.MinValue) l else l - 1); true }
      case LessThanOrEqual(a, v) if isAlias(a) => asLong(v).exists { l =>
        hi = math.min(hi, l); true }
      case In(a, vs) if isAlias(a) && vs.nonEmpty =>
        val ls = vs.flatMap(asLong)
        ls.length == vs.length && {
          lo = math.max(lo, ls.min); hi = math.min(hi, ls.max); true }
      // SECONDARY-INDEX eq pushdown: remember the literal(s); build()
      // routes them through a usable index B-tree to a rowid set (the
      // reference's own hot lookup is `WHERE HOSPITAL_PATIENT_ID = ?`,
      // a TEXT column — exo_2.py:204-217). Null literals match nothing
      // under Spark's EqualTo, so they are simply not candidates.
      case EqualTo(a, v) if !isAlias(a) && v != null =>
        eqCandidates += (a -> Seq(v)); true
      case In(a, vs) if !isAlias(a) && vs.nonEmpty =>
        eqCandidates += (a -> vs.toSeq.filter(_ != null)); true
      // SECONDARY-INDEX range pushdown: remember comparison bounds on
      // non-rowid columns; build() routes them through a usable index
      // as a B-tree RANGE WALK when one leads with the column (the
      // `WHERE UPDATE_DATE >= ?` incremental-pull shape — the
      // reference's watcher mtime gate, script.py:74-95, done
      // storage-side). Null bounds match nothing under Spark's
      // comparison semantics, so they are not candidates.
      case GreaterThan(a, v) if !isAlias(a) && v != null =>
        rangeCandidates += (a ->
          (rangeCandidates.getOrElse(a, Nil) :+ ("gt", v))); true
      case GreaterThanOrEqual(a, v) if !isAlias(a) && v != null =>
        rangeCandidates += (a ->
          (rangeCandidates.getOrElse(a, Nil) :+ ("ge", v))); true
      case LessThan(a, v) if !isAlias(a) && v != null =>
        rangeCandidates += (a ->
          (rangeCandidates.getOrElse(a, Nil) :+ ("lt", v))); true
      case LessThanOrEqual(a, v) if !isAlias(a) && v != null =>
        rangeCandidates += (a ->
          (rangeCandidates.getOrElse(a, Nil) :+ ("le", v))); true
      case _ => false
    }
    filters // everything residual — Spark re-evaluates, prune is I/O-only
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    accepted

  /** AGGREGATE PUSHDOWN (partial — Spark merges per-partition rows):
    * ungrouped, unfiltered COUNT(*) walks the B-tree counting leaf
    * cells straight from page headers (same pages, NONE of the record
    * decode — the dominant cost of a count over a wide table), and
    * MIN/MAX of the rowid-alias column become O(depth) leftmost/
    * rightmost descents. Anything else — group-bys, other columns,
    * filtered plans (Spark only offers aggregates when no residual
    * filters remain, and this source keeps every filter residual) —
    * declines, and the ordinary scan path answers it. */
  private var pushedAggSpecs: Option[Seq[SqliteAggSpec]] = None

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate._
    if (agg.groupByExpressions.nonEmpty) return false
    if (lo != Long.MinValue || hi != Long.MaxValue ||
        eqCandidates.nonEmpty || rangeCandidates.nonEmpty)
      return false
    val t = resolved
    val alias = t.columns.find(_.rowidAlias).map(_.name)
    def isAliasRef(e: org.apache.spark.sql.connector.expressions.Expression)
        : Boolean = e match {
      case nr: NamedReference => nr.fieldNames.length == 1 &&
        alias.exists(_.equalsIgnoreCase(nr.fieldNames()(0)))
      case _ => false
    }
    val specs: Seq[Option[SqliteAggSpec]] =
      agg.aggregateExpressions.toSeq.map {
        case _: CountStar => Some(SqliteAggSpec.CountStar)
        case m: Min if !t.withoutRowid && isAliasRef(m.column) =>
          Some(SqliteAggSpec.MinAlias)
        case m: Max if !t.withoutRowid && isAliasRef(m.column) =>
          Some(SqliteAggSpec.MaxAlias)
        case _ => None
      }
    if (specs.exists(_.isEmpty)) false
    else { pushedAggSpecs = Some(specs.flatten); true }
  }

  override def build(): Scan = {
    val t = resolved
    // PINNED-SNAPSHOT READ (time travel to a WAL point): options
    // `walFrames` (committed-frame cursor, e.g. a SqliteCdc.Cursor's
    // `frames`) + `walSalt1`/`walSalt2` (its generation) read the
    // table AS OF that snapshot — the written prefix of a -wal is
    // immutable within a generation, and the existing pin machinery
    // verifies the salts loudly. Default (-1) reads the head.
    val reqFrames = options.getInt("walFrames", -1)
    val reqSalts =
      if (options.containsKey("walSalt1") && options.containsKey("walSalt2"))
        Some((options.getLong("walSalt1", 0L), options.getLong("walSalt2", 0L)))
      else None
    // MAIN-FILE PIN (options `mainCounter`/`mainLen`/`mainMtime`, all
    // three or none): the caller's view of the main file, verified at
    // plan time AND at every executor open. Closes the window a
    // plan-time-captured pin cannot: a non-resetting checkpoint
    // backfilling between the caller's cursor (e.g. a SqliteCdc diff)
    // and this plan would otherwise serve a torn "AS OF" snapshot
    // (review r11).
    val pinKeys = Seq("mainCounter", "mainLen", "mainMtime")
      .map(options.containsKey)
    require(pinKeys.forall(identity) || !pinKeys.exists(identity),
      "graft-sqlite: mainCounter/mainLen/mainMtime must be set together")
    val reqMainPin =
      if (pinKeys.forall(identity))
        Some((options.getLong("mainCounter", 0L),
          options.getLong("mainLen", 0L),
          options.getLong("mainMtime", 0L)))
      else None
    pushedAggSpecs match {
      case Some(specs) =>
        new SqliteAggScan(specs, t, options.get("path"),
          options.getInt("maxPartitions", 32),
          new SerializableHadoopConf(XlsxDataSourceV2.sessionConf()),
          reqFrames, reqSalts, reqMainPin)
      case None =>
        new SqliteScan(required, t, options.get("path"),
          options.getInt("maxPartitions", 32),
          new SerializableHadoopConf(XlsxDataSourceV2.sessionConf()), lo, hi,
          eqCandidates, rangeCandidates,
          options.getLong("maxIndexLookupRows", 1000000L),
          reqFrames, reqSalts, reqMainPin)
    }
  }
}

/** The three aggregate shapes the source computes natively. */
private[sources] sealed trait SqliteAggSpec
private[sources] object SqliteAggSpec {
  case object CountStar extends SqliteAggSpec
  case object MinAlias extends SqliteAggSpec
  case object MaxAlias extends SqliteAggSpec
}

/** Pushed-aggregate scan: each partition emits ONE row of partial
  * values over its page subtrees (decode-free counts from leaf
  * headers, O(depth) min/max descents); Spark's final aggregation
  * merges the partials. */
private[sources] class SqliteAggScan(specs: Seq[SqliteAggSpec],
                                     t: SqliteTableDef, path: String,
                                     maxPartitions: Int,
                                     conf: SerializableHadoopConf,
                                     reqFrames: Int = -1,
                                     reqSalts: Option[(Long, Long)] = None,
                                     reqMainPin: Option[(Long, Long, Long)] =
                                       None)
    extends Scan with Batch {

  override def readSchema(): StructType = StructType(
    specs.zipWithIndex.map {
      case (SqliteAggSpec.CountStar, i) =>
        StructField(s"count_star_$i", LongType, nullable = false)
      case (SqliteAggSpec.MinAlias, i) =>
        StructField(s"min_rowid_$i", LongType)
      case (SqliteAggSpec.MaxAlias, i) =>
        StructField(s"max_rowid_$i", LongType)
    })

  override def description(): String =
    s"graft-sqlite ${t.name}, pushed aggregates " +
      specs.mkString("[", ",", "]")

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val pr = SqliteDataSourceV2.openReader(path, conf.value, reqFrames,
      reqSalts, reqMainPin)
    try {
      val pin = pr.wal.framesCommitted // same snapshot pin as SqliteScan
      val salts = if (pin > 0) Some((pr.wal.salt1, pr.wal.salt2)) else None
      // backfill pin: caller-pinned main state wins (see SqliteScan)
      val mpin = reqMainPin.orElse(
        if (pin > 0) Some(pr.mainPinState) else None)
      // sampled-page digest: page 1 + the scanned table's root — the
      // in-mtime-granularity backfill detector (advisor r11)
      val ppin = mpin.map(_ => (Seq(1, t.rootPage),
        pr.rawPageHash(Seq(1, t.rootPage))))
      if (t.withoutRowid)
        return Array(SqlitePartition(Seq(t.rootPage), walFrames = pin,
          walSalts = salts, mainPin = mpin, pagePin = ppin))
      val kids = childRanges(pr, t.rootPage).map(_.page)
      if (kids.isEmpty)
        Array(SqlitePartition(Seq(t.rootPage), walFrames = pin,
          walSalts = salts, mainPin = mpin, pagePin = ppin))
      else {
        val groups = math.max(1, math.min(maxPartitions, kids.size))
        kids.grouped(math.ceil(kids.size.toDouble / groups).toInt)
          .map(g => SqlitePartition(g, walFrames = pin,
            walSalts = salts, mainPin = mpin, pagePin = ppin): InputPartition)
          .toArray
      }
    } finally pr.close()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SqliteAggReaderFactory(specs, path, conf)
}

private[sources] class SqliteAggReaderFactory(specs: Seq[SqliteAggSpec],
                                              path: String,
                                              conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] =
    new SqliteAggPartitionReader(p.asInstanceOf[SqlitePartition],
      specs, path, conf)
}

private[sources] class SqliteAggPartitionReader(part: SqlitePartition,
                                                specs: Seq[SqliteAggSpec],
                                                path: String,
                                                conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val pr = SqliteDataSourceV2.openReader(path, conf.value,
    part.walFrames, part.walSalts, part.mainPin, part.pagePin)
  private var emitted = false

  override def next(): Boolean = !emitted

  override def get(): InternalRow = {
    emitted = true
    lazy val count = part.roots.map(r =>
      countTable(pr, pr.header, r)).sum
    // roots are in rowid order: the partition min lives under the
    // first subtree, the max under the last
    lazy val mn = minRowid(pr, pr.header, part.roots.head)
    lazy val mx = maxRowid(pr, pr.header, part.roots.last)
    InternalRow.fromSeq(specs.map {
      case SqliteAggSpec.CountStar => count
      case SqliteAggSpec.MinAlias => mn.map(Long.box).orNull
      case SqliteAggSpec.MaxAlias => mx.map(Long.box).orNull
    })
  }

  override def close(): Unit = pr.close()
}

/** Partition planning: the root B-tree page's children, grouped into at
  * most `maxPartitions` contiguous runs — each InputPartition owns a
  * disjoint set of page subtrees. A leaf root (small table) is one
  * partition scanning the root itself. */
private[sources] class SqliteScan(required: StructType, t: SqliteTableDef,
                                  path: String, maxPartitions: Int,
                                  conf: SerializableHadoopConf,
                                  lo: Long = Long.MinValue,
                                  hi: Long = Long.MaxValue,
                                  eqCandidates: Map[String, Seq[Any]] =
                                    Map.empty,
                                  rangeCandidates:
                                    Map[String, Seq[(String, Any)]] =
                                    Map.empty,
                                  maxIndexLookupRows: Long = 1000000L,
                                  reqFrames: Int = -1,
                                  reqSalts: Option[(Long, Long)] = None,
                                  reqMainPin: Option[(Long, Long, Long)] =
                                    None)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required

  override def description(): String = {
    val range =
      if (lo == Long.MinValue && hi == Long.MaxValue) ""
      else s", rowid in [$lo,$hi]"
    val idx = if (eqCandidates.isEmpty) ""
      else eqCandidates.keys.toSeq.sorted
        .mkString(", indexable eq on [", ",", "]")
    val rng = if (rangeCandidates.isEmpty) ""
      else rangeCandidates.keys.toSeq.sorted
        .mkString(", indexable range on [", ",", "]")
    s"graft-sqlite ${t.name}, columns " +
      required.fieldNames.mkString("[", ",", "]") + range + idx + rng
  }

  override def toBatch: Batch = this

  private def asValue(v: Any): Option[Value] =
    SqliteDataSourceV2.asProbeValue(v)

  /** How an indexed eq/range filter resolved. */
  private sealed trait IndexResolution
  private case object NoIndexPath extends IndexResolution
  private case class SparseRowids(rowids: Seq[Long]) extends IndexResolution
  /** Matches are DENSE in rowid space: per-rowid point descents would
    * re-read the same leaf/interior pages over and over (measured: a
    * 250k-match probe on a 2M-row file took 45 s of point descents vs
    * 12 s scanned) — so the resolution degrades to the [min,max] rowid
    * WINDOW over the ordinary subtree scan, which still prunes
    * everything outside the matched span. */
  private case class DenseWindow(min: Long, max: Long)
      extends IndexResolution

  /** Case-insensitive candidate lookup (sqlite identifiers are). */
  private def eqOn(col: String): Option[Seq[Any]] =
    eqCandidates.collectFirst {
      case (c, vs) if c.equalsIgnoreCase(col) => vs }
  private def rangeOn(col: String): Option[Seq[(String, Any)]] =
    rangeCandidates.collectFirst {
      case (c, vs) if c.equalsIgnoreCase(col) => vs }

  /** Fold a column's pushed comparison bounds into the TIGHTEST
    * (lo, hi) pair under sqlite record order. None when any bound is
    * unconvertible (the scan fallback serves it). */
  private def foldBounds(ops: Seq[(String, Any)])
      : Option[(Option[(Value, Boolean)], Option[(Value, Boolean)])] = {
    var lob: Option[(Value, Boolean)] = None
    var hib: Option[(Value, Boolean)] = None
    for ((op, raw) <- ops) {
      val v = asValue(raw).getOrElse(return None)
      op match {
        case "gt" | "ge" =>
          val inc = op == "ge"
          lob = lob match {
            case Some((cur, curInc)) =>
              val c = cmpValues(v, cur)
              if (c > 0 || (c == 0 && !inc)) Some((v, inc))
              else Some((cur, curInc))
            case None => Some((v, inc))
          }
        case _ =>
          val inc = op == "le"
          hib = hib match {
            case Some((cur, curInc)) =>
              val c = cmpValues(v, cur)
              if (c < 0 || (c == 0 && !inc)) Some((v, inc))
              else Some((cur, curInc))
            case None => Some((v, inc))
          }
      }
    }
    Some((lob, hib))
  }

  /** The probes a given index can serve, or None when it serves
    * nothing: consume single-value eq candidates down the index's
    * leading columns (an IN fans out — one probe per value, capped),
    * then an optional RANGE on the next column. Partial indexes
    * qualify only under predicate implication (`usableIf` conjunct
    * present verbatim among the pushed eq filters). */
  private def probesFor(ix: SqliteIndexDef): Option[Seq[IndexProbe]] = {
    val impliedOk = ix.usable || ix.usableIf.exists { case (c, v) =>
      eqOn(c).exists(vs => vs.length == 1 &&
        asValue(vs.head).exists(pv => cmpValues(pv, v) == 0))
    }
    if (!impliedOk) return None
    var prefixes: Seq[Seq[Value]] = Seq(Nil)
    var k = 0
    var halted = false
    while (!halted && k < ix.columns.length) {
      eqOn(ix.columns(k)) match {
        case Some(vals) if vals.nonEmpty =>
          val conv = vals.map(asValue)
          if (conv.exists(_.isEmpty) ||
              prefixes.length * conv.length > 64) halted = true
          else {
            prefixes = for (p <- prefixes; v <- conv.flatten) yield p :+ v
            k += 1
          }
        case _ => halted = true
      }
    }
    val bounds =
      if (k < ix.columns.length)
        rangeOn(ix.columns(k)).flatMap(foldBounds)
      else None
    val (lob, hib) = bounds.getOrElse((None, None))
    if (k == 0 && lob.isEmpty && hib.isEmpty) None
    else {
      // TEXT probes only on UTF-8 files: sqlite's BINARY collation is
      // memcmp over the STORED encoding, and UTF-16(LE) byte order is
      // not UTF-8/code-point order — descending with the wrong order
      // could miss rows. Numeric probes are encoding-independent.
      val anyText = (prefixes.flatten ++ lob.map(_._1) ++ hib.map(_._1))
        .exists(_.isInstanceOf[VText])
      if (anyText && textEnc > 1) None
      else Some(prefixes.map(p => IndexProbe(p, lob, hib)))
    }
  }
  private var textEnc = 1

  /** Resolve the pushed eq/range candidates through a usable secondary
    * index. Preference: longest consumed eq prefix, then a range
    * bound, then unique. Sparse matches (average rowid gap above ~a
    * leaf's worth of rows) become explicit rowid ranges; dense matches
    * degrade to a window scan; a probe past `maxIndexLookupRows`
    * ABORTS DURING THE DESCENT (searchIndexRowids buffers rowids only,
    * advisor r10) and falls back entirely. */
  private def resolveIndex(pr: SqliteDataSourceV2.HadoopPageReader)
      : IndexResolution = {
    if ((eqCandidates.isEmpty && rangeCandidates.isEmpty) || t.withoutRowid)
      return NoIndexPath
    textEnc = pr.header.textEncoding
    val candidates = indexes(pr, pr.header)
      .filter(_.table.equalsIgnoreCase(t.name))
      .flatMap(ix => probesFor(ix).map(ps => (ix, ps)))
    if (candidates.isEmpty) return NoIndexPath
    // selectivity proxy: how many pushed filter columns the index
    // consumes — eq prefix columns, a range bound, AND a partial
    // index's implied WHERE conjunct (idx_docs_partial consuming
    // flag=1 + title=? must beat idx_docs_flag_score consuming only
    // the unselective flag=1)
    val (ix, probes) = candidates.maxBy { case (i, ps) =>
      (ps.headOption.map(_.prefix.length).getOrElse(0) +
        (if (ps.exists(p => p.lo.isDefined || p.hi.isDefined)) 1 else 0) +
        (if (!i.usable) 1 else 0), // usableIf path: implication consumed
        i.unique)
    }
    // the per-probe limit is a shared budget: the UNION must stay
    // within maxIndexLookupRows, and each descent aborts in-flight
    // the moment its share of the budget is exhausted
    val collected = ArrayBuffer.empty[Long]
    var aborted = false
    for (p <- probes if !aborted) {
      searchIndexRowids(pr, pr.header, ix.rootPage, p,
        maxIndexLookupRows - collected.length) match {
        case Some(rs) => collected ++= rs
        case None => aborted = true
      }
    }
    if (aborted) return NoIndexPath
    val rowids = collected.toSeq
      .filter(r => r >= lo && r <= hi)
      .distinct.sorted
    if (rowids.isEmpty) {
      SqliteDataSourceV2.lastIndexProbe = Some((ix.name, 0))
      SparseRowids(Nil)
    } else {
      SqliteDataSourceV2.lastIndexProbe = Some((ix.name, rowids.length))
      val span = rowids.last - rowids.head + 1
      // ~16 rows share a leaf on typical row shapes: below that
      // average gap, neighboring descents hit the same pages
      if (rowids.length > 64 && rowids.length * 16 >= span)
        DenseWindow(rowids.head, rowids.last)
      else SparseRowids(rowids)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val pr = SqliteDataSourceV2.openReader(path, conf.value, reqFrames,
      reqSalts, reqMainPin)
    try {
      // SNAPSHOT PIN: every partition reader re-parses the -wal, so a
      // live writer committing mid-query could otherwise give two
      // partitions different views — pin the committed frame count
      // seen HERE, at plan time (the written prefix is immutable).
      // 0 when no sidecar exists yet: a -wal APPEARING mid-query is
      // ignored just like frames appended to one. The generation
      // salts travel with the pin so a mid-query checkpoint fails
      // loudly on the executors.
      val pin = pr.wal.framesCommitted
      val salts = if (pin > 0) Some((pr.wal.salt1, pr.wal.salt2)) else None
      // backfill pin: a CALLER-pinned main state (mainCounter/Len/Mtime
      // options — the CDC sync path) wins, verified above at plan time
      // and again at every executor open; otherwise only meaningful
      // while a WAL snapshot is pinned — without a sidecar the main
      // file is assumed static, like any file-based source (advisor
      // r10). Plan-time capture alone cannot see a checkpoint backfill
      // that happened BETWEEN the caller's cursor and this plan
      // (review r11).
      val mpin = reqMainPin.orElse(
        if (pin > 0) Some(pr.mainPinState) else None)
      // sampled-page digest: page 1 + the scanned table's root — the
      // in-mtime-granularity backfill detector (advisor r11)
      val ppin = mpin.map(_ => (Seq(1, t.rootPage),
        pr.rawPageHash(Seq(1, t.rootPage))))
      // WITHOUT ROWID rows live in an index B-tree whose interior pages
      // carry entries; subtree splits would drop them — one in-order
      // partition (these are PK-lookup tables; the parallel-scan story
      // belongs to the rowid tables)
      if (t.withoutRowid)
        return Array(SqlitePartition(Seq(t.rootPage), walFrames = pin,
          walSalts = salts, mainPin = mpin, pagePin = ppin))
      // an indexed eq filter resolves to explicit rowids: partitions
      // carry coalesced rowid RANGES (adjacent ids merge), each read by
      // an O(depth) B-tree descent — pages touched scale with matches,
      // not table size. Dense matches tighten the window instead.
      var (effLo, effHi) = (lo, hi)
      resolveIndex(pr) match {
        case SparseRowids(rowids) =>
          if (rowids.isEmpty) return Array.empty[InputPartition]
          val ranges = ArrayBuffer.empty[(Long, Long)]
          for (r <- rowids) ranges.lastOption match {
            case Some((a, b)) if r == b + 1 =>
              ranges(ranges.length - 1) = (a, r)
            case _ => ranges += ((r, r))
          }
          val groups = math.max(1,
            math.min(maxPartitions, ranges.length))
          return ranges.grouped(
            math.ceil(ranges.length.toDouble / groups).toInt)
            .map(g => SqlitePartition(Seq(t.rootPage),
              rowidRanges = Some(g.toSeq),
              walFrames = pin, walSalts = salts, mainPin = mpin, pagePin = ppin): InputPartition)
            .toArray
        case DenseWindow(mn, mx) =>
          effLo = math.max(effLo, mn); effHi = math.min(effHi, mx)
        case NoIndexPath =>
      }
      // root children pruned by the pushed rowid window FIRST — a point
      // lookup plans exactly one single-subtree partition, and a window
      // outside the table plans ZERO partitions
      val all = childRanges(pr, t.rootPage)
      val kids = all.filter(_.overlaps(effLo, effHi)).map(_.page)
      if (all.isEmpty) // leaf root: the whole table is one page
        Array(SqlitePartition(Seq(t.rootPage), walFrames = pin,
          walSalts = salts, mainPin = mpin, pagePin = ppin))
      else if (kids.isEmpty) Array.empty[InputPartition]
      else {
        val groups = math.max(1, math.min(maxPartitions, kids.size))
        // contiguous grouping keeps each partition's pages clustered on
        // disk (sequential-ish reads) and rowid-ordered within itself
        kids.grouped(math.ceil(kids.size.toDouble / groups).toInt)
          .map(g => SqlitePartition(g, walFrames = pin,
            walSalts = salts, mainPin = mpin, pagePin = ppin): InputPartition)
          .toArray
      }
    } finally pr.close()
  }

  override def estimateStatistics(): Statistics = new Statistics {
    // page-count geometry is in the header — free and honest enough for
    // the broadcast-threshold decision the optimizer makes with it
    override def sizeInBytes(): util.OptionalLong = {
      // pinned-snapshot scans estimate the PINNED view's size, not the
      // head's — a time-traveled small as-of view must not lose its
      // broadcast eligibility to later growth (review r11)
      val pr = SqliteDataSourceV2.openReader(path, conf.value, reqFrames,
        reqSalts)
      try util.OptionalLong.of(pr.header.pageCount * pr.header.pageSize)
      finally pr.close()
    }
    override def numRows(): util.OptionalLong = util.OptionalLong.empty()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SqliteReaderFactory(required, t, path, conf, lo, hi)
}

/** Either a set of disjoint page subtrees (`roots`, the parallel-scan
  * path) or, when `rowidRanges` is set, a list of coalesced rowid
  * ranges point-descended from the table root (the index-lookup
  * path — `roots` then holds just the table root page). `walFrames`
  * pins the WAL snapshot every reader of this scan must serve
  * (committed frame count at plan time; -1 = no sidecar); `mainPin`
  * pins the raw MAIN-file state (change counter, length, mtime) so a
  * non-resetting checkpoint backfilling frames mid-query fails loudly
  * (see [[SqliteDataSourceV2.HadoopPageReader.mainPinState]]);
  * `pagePin` pins an xxhash64 digest of sampled RAW main pages
  * (page 1 + the scanned table's root), closing the backfill window
  * inside mtime granularity that the triple cannot see (advisor
  * r11). */
private[sources] case class SqlitePartition(roots: Seq[Int],
    rowidRanges: Option[Seq[(Long, Long)]] = None,
    walFrames: Int = -1,
    walSalts: Option[(Long, Long)] = None,
    mainPin: Option[(Long, Long, Long)] = None,
    pagePin: Option[(Seq[Int], Long)] = None)
    extends InputPartition

private[sources] class SqliteReaderFactory(required: StructType,
                                           t: SqliteTableDef, path: String,
                                           conf: SerializableHadoopConf,
                                           lo: Long, hi: Long)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new SqlitePartitionReader(p.asInstanceOf[SqlitePartition], required, t,
      path, conf, lo, hi)
}

private[sources] class SqlitePartitionReader(part: SqlitePartition,
                                             required: StructType,
                                             t: SqliteTableDef, path: String,
                                             conf: SerializableHadoopConf,
                                             lo: Long = Long.MinValue,
                                             hi: Long = Long.MaxValue)
    extends PartitionReader[InternalRow] {

  private val pr = SqliteDataSourceV2.openReader(path, conf.value,
    part.walFrames, part.walSalts, part.mainPin, part.pagePin)
  private val charset = textCharset(pr.header.textEncoding)
  // required field -> (table ordinal, spark type, is rowid alias)
  private val fields: Array[(Int, DataType, Boolean)] =
    required.fields.map { f =>
      val ord = t.columns.indexWhere(_.name.equalsIgnoreCase(f.name))
      require(ord >= 0, s"graft-sqlite: no column ${f.name} in ${t.name}")
      (ord, f.dataType, t.columns(ord).rowidAlias)
    }
  private val rows: Iterator[InternalRow] =
    if (t.withoutRowid) {
      // index-btree storage: record columns are PK-first — map each
      // required DECLARED ordinal to its stored position
      val storedPos = t.storedOrder.zipWithIndex.toMap // declared -> stored
      val positions = fields.map(f => storedPos(f._1))
      val dts = fields.map(_._2)
      part.roots.iterator.flatMap(root => scanIndex(pr, pr.header, root))
        .map { payload =>
          InternalRow.fromSeq(scala.collection.immutable.ArraySeq
            .unsafeWrapArray(SqliteDataSourceV2.decodeSpark(payload,
              positions, dts, charset)))
        }
    } else {
      // rowid aliases come from the rowid, not the record: split the
      // required fields into decoded positions and alias slots
      val decIdx = fields.zipWithIndex.collect {
        case ((_, _, false), fi) => fi }
      val positions = decIdx.map(fi => fields(fi)._1)
      val dts = decIdx.map(fi => fields(fi)._2)
      val raws: Iterator[RawRow] = part.rowidRanges match {
        // index-lookup path: one O(depth) descent per coalesced range
        case Some(ranges) => ranges.iterator.flatMap { case (a, b) =>
          scanTable(pr, pr.header, part.roots.head, a, b) }
        case None => part.roots.iterator.flatMap(root =>
          scanTable(pr, pr.header, root, lo, hi))
      }
      raws
        .map { raw =>
          val dec = SqliteDataSourceV2.decodeSpark(raw.payload, positions,
            dts, charset)
          val all = new Array[Any](fields.length)
          var k = 0
          while (k < decIdx.length) { all(decIdx(k)) = dec(k); k += 1 }
          var fi = 0
          while (fi < fields.length) {
            if (fields(fi)._3) // rowid alias
              all(fi) =
                if (fields(fi)._2 == LongType) raw.rowid
                else SqliteDataSourceV2.coerce(VInt(raw.rowid),
                  fields(fi)._2)
            fi += 1
          }
          InternalRow.fromSeq(scala.collection.immutable.ArraySeq
            .unsafeWrapArray(all))
        }
    }

  private var cur: InternalRow = _

  override def next(): Boolean =
    if (rows.hasNext) { cur = rows.next(); true } else false

  override def get(): InternalRow = cur

  override def close(): Unit = pr.close()
}
