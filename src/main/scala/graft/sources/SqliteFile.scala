package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Read-only parser for the SQLite 3 main database file format — the
  * storage engine behind the reference warehouse (`script.py:125`
  * connects to `drwh.db`; every reference exo reads/writes it through
  * `sqlite3.Connection`, `exo_1.py:141`, `exo_2.py:209`). The wire
  * format is public and stable (16-byte-header + fixed-size B-tree
  * pages, documented at sqlite.org/fileformat2): this file implements
  * exactly the read path — header, table B-tree traversal, cell/record
  * decoding, overflow chains, and enough `CREATE TABLE` parsing to
  * recover column names, affinities, and the rowid-alias column.
  *
  * Same move as the repo's other hand-rolled binary sources
  * (PDF/DOCX/XLSX/BMP/WAV/AVI): a dependency-free decoder behind a
  * Spark-native connector, because sqlite-jdbc is unvendorable offline
  * (SCALE.md §6i).
  *
  * Scale design: nothing here loads the file — all access goes through
  * a caller-supplied positioned `PageReader`, and the B-tree exposes
  * its root's child subtrees so the DSv2 layer can hand each executor
  * a disjoint page-subtree to traverse independently (a multi-GB .db
  * splits into root-fanout ≈ pageSize/16 parallel scans, no driver
  * materialization).
  *
  * Out of scope, checked and rejected loudly: UTF-16 encodings and WAL
  * files with un-checkpointed -wal frames (reading only the main file
  * would silently miss committed transactions). WITHOUT ROWID tables
  * ARE supported: their rows live in an index B-tree ([[scanIndex]],
  * entries in interior pages too, index overflow geometry) with PK
  * columns stored first ([[SqliteTableDef.storedOrder]] un-permutes).
  */
object SqliteFile {

  /** Positioned page access: `page(n)` returns the full bytes of
    * 1-based page `n`. Implementations: local/Hadoop positioned reads
    * (executor side) or an in-memory array (tests). */
  trait PageReader extends AutoCloseable {
    def pageSize: Int
    def page(n: Int): Array[Byte]
  }

  final class BytesPageReader(bytes: Array[Byte], val pageSize: Int)
      extends PageReader {
    def page(n: Int): Array[Byte] = {
      val off = (n.toLong - 1) * pageSize
      require(off >= 0 && off + pageSize <= bytes.length,
        s"sqlite: page $n out of range (${bytes.length} bytes)")
      java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + pageSize)
    }
    def close(): Unit = ()
  }

  // ---- header ----------------------------------------------------------

  /** Parsed 100-byte file header: the geometry every page read needs. */
  case class Header(pageSize: Int, reservedPerPage: Int, pageCount: Long,
                    textEncoding: Int) {
    /** usable bytes per page (U in the format doc) */
    def usable: Int = pageSize - reservedPerPage
  }

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** Parse and validate the first 100 bytes. Fails with the CAUSE for
    * every unsupported variant rather than mis-decoding. */
  def parseHeader(h: Array[Byte]): Header = {
    require(h.length >= 100, s"sqlite: file shorter than the 100-byte header")
    val magic = "SQLite format 3\u0000".getBytes("ISO-8859-1")
    require(h.slice(0, 16).sameElements(magic),
      "sqlite: bad magic — not a SQLite 3 database file")
    val rawPs = u16(h, 16)
    val pageSize = if (rawPs == 1) 65536 else rawPs
    require(pageSize >= 512 && (pageSize & (pageSize - 1)) == 0,
      s"sqlite: invalid page size $pageSize")
    val enc = u32(h, 56).toInt
    // encoding 0 appears only in a zero-schema file created and never
    // written; treat as UTF-8 (there is no text to decode anyway).
    // 2/3 are UTF-16le/be — decoded via [[textCharset]].
    require(enc >= 0 && enc <= 3,
      s"sqlite: unknown text encoding $enc (1=UTF-8, 2=UTF-16le, " +
        "3=UTF-16be)")
    // a read-version above 2 means the file uses a format this reader
    // (and released sqlite3 libraries) cannot decode — reject loudly
    val readVersion = h(19) & 0xff
    require(readVersion <= 2,
      s"sqlite: file read version $readVersion is newer than this reader " +
        "understands (1=legacy, 2=WAL)")
    // the in-header database size (offset 28) is only trustworthy when
    // the change counter (24) matches version-valid-for (92) — a legacy
    // writer that predates the size field leaves it stale. A stale
    // SMALLER count would falsely trip the cycle guard on a valid file;
    // treat it like the pageCount==0 legacy case (callers fall back to
    // fileLen/pageSize or disable the cap). In WAL mode (read version
    // 2) sqlite keeps the size field current, so it stays trusted.
    val sizeValid = readVersion == 2 || u32(h, 24) == u32(h, 92)
    val pageCount = if (sizeValid) u32(h, 28) else 0L
    Header(pageSize, h(20) & 0xff, pageCount, enc)
  }

  // ---- varints and serial values ----------------------------------------

  /** Decode the big-endian 7-bit varint at `off`; returns (value,
    * bytesConsumed). Bytes 1-8 contribute 7 bits, a 9th byte all 8. */
  def varint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L; var i = 0
    while (i < 8) {
      val x = b(off + i)
      v = (v << 7) | (x & 0x7fL)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    ((v << 8) | (b(off + 8) & 0xffL), 9)
  }

  /** One decoded record value — the dynamic type a SQLite cell actually
    * stores, before affinity coercion. */
  sealed trait Value
  case object VNull extends Value
  case class VInt(v: Long) extends Value
  case class VReal(v: Double) extends Value
  case class VText(v: String) extends Value
  case class VBlob(v: Array[Byte]) extends Value

  /** Content byte length of serial type `t`. */
  def serialLen(t: Long): Int = t match {
    case 0 | 8 | 9 => 0
    case 1 => 1; case 2 => 2; case 3 => 3; case 4 => 4; case 5 => 6
    case 6 | 7 => 8
    case n if n >= 12 => ((n - 12) / 2).toInt
    case n => sys.error(s"sqlite: reserved serial type $n")
  }

  /** Charset name for the header's text-encoding code. */
  def textCharset(enc: Int): String = enc match {
    case 0 | 1 => "UTF-8"
    case 2 => "UTF-16LE"
    case 3 => "UTF-16BE"
    case n => sys.error(s"sqlite: unknown text encoding $n")
  }

  /** Decode the value of serial type `t` at `off` (caller guarantees
    * `serialLen(t)` bytes are available). `charset` is the FILE's text
    * encoding ([[Header.textEncoding]] via [[textCharset]]) — UTF-16
    * databases store text serials as UTF-16 code units. */
  def serialValue(t: Long, b: Array[Byte], off: Int,
                  charset: String = "UTF-8"): Value = t match {
    case 0 => VNull
    case 8 => VInt(0L)
    case 9 => VInt(1L)
    case 1 | 2 | 3 | 4 | 5 | 6 =>
      val n = serialLen(t)
      var v = (b(off).toLong << 56) >> 56 // sign-extend first byte
      var i = 1
      while (i < n) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
      VInt(v)
    case 7 =>
      var bits = 0L; var i = 0
      while (i < 8) { bits = (bits << 8) | (b(off + i) & 0xffL); i += 1 }
      VReal(java.lang.Double.longBitsToDouble(bits))
    case n if n >= 12 && n % 2 == 0 =>
      VBlob(java.util.Arrays.copyOfRange(b, off, off + serialLen(n)))
    case n if n >= 13 =>
      VText(new String(b, off, serialLen(n), charset))
    case n => sys.error(s"sqlite: reserved serial type $n")
  }

  /** Decode a full record payload into column values. Records may have
    * FEWER columns than the table schema (rows older than an
    * `ALTER TABLE ADD COLUMN`) — callers pad with null — and MORE
    * (schema shrank; callers ignore the tail). `wanted(i)` gates
    * materialization: unwanted bodies are length-skipped, not decoded
    * (the DSv2 column-pruning hook lands here). */
  def decodeRecord(payload: Array[Byte], wanted: Int => Boolean,
                   charset: String = "UTF-8"): ArrayBuffer[Value] = {
    val (hdrLen, n0) = varint(payload, 0)
    var ho = n0
    var bo = hdrLen.toInt
    val out = ArrayBuffer.empty[Value]
    var i = 0
    while (ho < hdrLen) {
      val (t, n) = varint(payload, ho)
      ho += n
      out += (if (wanted(i)) serialValue(t, payload, bo, charset) else VNull)
      bo += serialLen(t)
      i += 1
    }
    out
  }

  // ---- B-tree traversal --------------------------------------------------

  /** One table row: the 64-bit rowid plus the raw record payload. */
  case class RawRow(rowid: Long, payload: Array[Byte])

  private def btreeHeaderOffset(pageNo: Int): Int = if (pageNo == 1) 100 else 0

  /** One interior-page child subtree plus its rowid bounds: the
    * subtree holds rowids in (`minExclusive`, `maxInclusive`]
    * (`Long.MinValue` / `Long.MaxValue` mark the open ends). The
    * interior cell key IS the largest rowid in its left child — the
    * property both the partition planner and the range pruner use. */
  case class ChildRange(page: Int, minExclusive: Long, maxInclusive: Long) {
    def overlaps(lo: Long, hi: Long): Boolean =
      maxInclusive >= lo && minExclusive < hi
  }

  /** Child subtrees of an INTERIOR table page with their rowid bounds
    * (left children in cell order, then the right-most pointer) — the
    * DSv2 split points. A LEAF root returns Nil (single-partition
    * file). */
  def childRanges(pr: PageReader, pageNo: Int): Seq[ChildRange] = {
    val pg = pr.page(pageNo)
    val off = btreeHeaderOffset(pageNo)
    (pg(off) & 0xff) match {
      case 0x05 =>
        val ncells = u16(pg, off + 3)
        var prev = Long.MinValue
        val kids = (0 until ncells).map { i =>
          val cellOff = u16(pg, off + 12 + 2 * i)
          val child = u32(pg, cellOff).toInt
          val (key, _) = varint(pg, cellOff + 4)
          val r = ChildRange(child, prev, key)
          prev = key
          r
        }
        kids :+ ChildRange(u32(pg, off + 8).toInt, prev, Long.MaxValue)
      case 0x0d => Nil
      case t => sys.error(s"sqlite: page $pageNo is not a table B-tree " +
        f"page (type 0x$t%02x) — index B-trees and WITHOUT ROWID tables " +
        "are not supported")
    }
  }

  /** Back-compat shim: child page numbers only. */
  def rootChildren(pr: PageReader, rootPage: Int): Seq[Int] =
    childRanges(pr, rootPage).map(_.page)

  /** Depth-first scan of the table B-tree rooted at `rootPage`,
    * streaming rows in rowid order. Overflowing payloads are assembled
    * by walking the overflow chain; inline payloads are sliced without
    * re-reading. Iterative explicit stack — a 100-GB table is ~4 levels
    * deep, but recursion depth should never be data-dependent.
    *
    * `lo`/`hi` bound the ROWIDs returned (inclusive): interior children
    * whose key range cannot intersect are never read (a point lookup on
    * a rowid-alias key touches O(depth) pages however big the table —
    * the set-at-a-time answer to the reference's per-document
    * `WHERE ... = ?` loop, S3), and leaf rows outside the range are
    * skipped without decoding their payload. */
  def scanTable(pr: PageReader, header: Header, rootPage: Int,
                lo: Long = Long.MinValue, hi: Long = Long.MaxValue)
      : Iterator[RawRow] = new Iterator[RawRow] {
    private val u = header.usable
    private val maxInline = u - 35
    private val minInline = (u - 12) * 32 / 255 - 23
    // stack of (pageNo, nextCellIndex); interior pages push children lazily
    private val stack = ArrayBuffer[(Int, Int)]((rootPage, 0))
    private var nextRow: RawRow = _
    // corruption guard: a valid tree visits each page at most once; a
    // cyclic child pointer (corrupt/malicious file) must fail fast, not
    // hang an executor. pageCount==0 (legacy header) disables the cap.
    private var pagesVisited = 0L
    private def notePage(pageNo: Int): Unit = {
      pagesVisited += 1
      require(header.pageCount == 0L || pagesVisited <= header.pageCount,
        s"sqlite: table B-tree at page $rootPage visits more pages than " +
          s"the file holds (${header.pageCount}) — cyclic page pointers " +
          "(corrupt file)")
      val _ = pageNo
    }

    private def assemble(pg: Array[Byte], cellOff: Int): RawRow = {
      val (p, n1) = varint(pg, cellOff)
      val (rowid, n2) = varint(pg, cellOff + n1)
      val bodyOff = cellOff + n1 + n2
      val payloadLen = p.toInt
      if (payloadLen <= maxInline)
        RawRow(rowid, java.util.Arrays.copyOfRange(pg, bodyOff,
          bodyOff + payloadLen))
      else {
        // inline prefix K, remainder on a 4-byte-linked overflow chain
        val k0 = minInline + (payloadLen - minInline) % (u - 4)
        val inline = if (k0 <= maxInline) k0 else minInline
        val buf = new Array[Byte](payloadLen)
        System.arraycopy(pg, bodyOff, buf, 0, inline)
        var written = inline
        var next = u32(pg, bodyOff + inline).toInt
        while (next != 0 && written < payloadLen) {
          val op = pr.page(next)
          val take = math.min(u - 4, payloadLen - written)
          System.arraycopy(op, 4, buf, written, take)
          written += take
          next = u32(op, 0).toInt
        }
        require(written == payloadLen,
          s"sqlite: truncated overflow chain for rowid $rowid " +
            s"($written of $payloadLen bytes)")
        RawRow(rowid, buf)
      }
    }

    private def advance(): Unit = {
      nextRow = null
      while (nextRow == null && stack.nonEmpty) {
        val (pageNo, idx) = stack.remove(stack.length - 1)
        val pg = pr.page(pageNo)
        val off = btreeHeaderOffset(pageNo)
        val ncells = u16(pg, off + 3)
        (pg(off) & 0xff) match {
          case 0x0d =>
            if (idx < ncells) {
              stack += ((pageNo, idx + 1))
              val cellOff = u16(pg, off + 8 + 2 * idx)
              // peek the rowid BEFORE assembling: out-of-range rows are
              // skipped without decoding (or walking overflow chains)
              val (p, n1) = varint(pg, cellOff)
              val (rowid, _) = varint(pg, cellOff + n1)
              val _ = p
              if (rowid >= lo && rowid <= hi)
                nextRow = assemble(pg, cellOff)
              else if (rowid > hi) stack.remove(stack.length - 1) // sorted
            }
          case 0x05 =>
            // push right-most after the last cell, children in reverse
            // so pop order preserves rowid order; children whose rowid
            // bounds miss [lo, hi] are pruned here, unread
            if (idx == 0) {
              notePage(pageNo)
              var prev = Long.MinValue
              val kids = (0 until ncells).map { i =>
                val cellOff = u16(pg, off + 12 + 2 * i)
                val child = u32(pg, cellOff).toInt
                val (key, _) = varint(pg, cellOff + 4)
                val r = ChildRange(child, prev, key)
                prev = key
                r
              } :+ ChildRange(u32(pg, off + 8).toInt, prev, Long.MaxValue)
              kids.reverseIterator.filter(_.overlaps(lo, hi))
                .foreach(k => stack += ((k.page, 0)))
            }
          case t => sys.error(
            f"sqlite: unexpected page type 0x$t%02x at page $pageNo inside " +
              "a table B-tree")
        }
      }
    }

    advance()
    def hasNext: Boolean = nextRow != null
    def next(): RawRow = {
      val r = nextRow; advance(); r
    }
  }

  /** Row count of the table B-tree under `rootPage` WITHOUT decoding a
    * single record: leaf pages contribute their cell count straight
    * from the page header; interior pages only push children. The
    * decode-free form of `SELECT count(*)` — same pages read, none of
    * the payload/varint work (the aggregate-pushdown fast path). */
  def countTable(pr: PageReader, header: Header, rootPage: Int): Long = {
    var total = 0L
    val stack = ArrayBuffer[Int](rootPage)
    var pagesVisited = 0L
    while (stack.nonEmpty) {
      val pageNo = stack.remove(stack.length - 1)
      pagesVisited += 1
      require(header.pageCount == 0L || pagesVisited <= header.pageCount,
        s"sqlite: count at page $rootPage visits more pages than the " +
          "file holds — cyclic page pointers (corrupt file)")
      val pg = pr.page(pageNo)
      val off = btreeHeaderOffset(pageNo)
      val ncells = u16(pg, off + 3)
      (pg(off) & 0xff) match {
        case 0x0d => total += ncells
        case 0x05 =>
          var i = 0
          while (i < ncells) {
            stack += u32(pg, u16(pg, off + 12 + 2 * i)).toInt; i += 1
          }
          stack += u32(pg, off + 8).toInt
        // index trees (WITHOUT ROWID storage): interior entries are
        // rows too
        case 0x0a => total += ncells
        case 0x02 =>
          total += ncells
          var i = 0
          while (i < ncells) {
            stack += u32(pg, u16(pg, off + 12 + 2 * i)).toInt; i += 1
          }
          stack += u32(pg, off + 8).toInt
        case t => sys.error(
          f"sqlite: unexpected page type 0x$t%02x at page $pageNo")
      }
    }
    total
  }

  /** Smallest rowid under a table-B-tree subtree: descend the LEFTMOST
    * child chain, read the first leaf cell's rowid — O(depth) pages.
    * None for an empty subtree. */
  def minRowid(pr: PageReader, header: Header, rootPage: Int)
      : Option[Long] = {
    var pageNo = rootPage
    var guard = 0
    while (guard < 64) { // trees are ~4 levels; 64 = corruption stop
      guard += 1
      val pg = pr.page(pageNo)
      val off = btreeHeaderOffset(pageNo)
      val ncells = u16(pg, off + 3)
      (pg(off) & 0xff) match {
        case 0x0d =>
          if (ncells == 0) return None
          val cellOff = u16(pg, off + 8)
          val (_, n1) = varint(pg, cellOff)
          return Some(varint(pg, cellOff + n1)._1)
        case 0x05 =>
          pageNo = if (ncells == 0) u32(pg, off + 8).toInt
            else u32(pg, u16(pg, off + 12)).toInt
        case t => sys.error(
          f"sqlite: unexpected page type 0x$t%02x in minRowid")
      }
    }
    sys.error("sqlite: minRowid descent exceeded 64 levels (corrupt file)")
  }

  /** Largest rowid under a table-B-tree subtree: descend the RIGHT-MOST
    * pointer chain, read the last leaf cell's rowid — O(depth) pages. */
  def maxRowid(pr: PageReader, header: Header, rootPage: Int)
      : Option[Long] = {
    var pageNo = rootPage
    var guard = 0
    while (guard < 64) {
      guard += 1
      val pg = pr.page(pageNo)
      val off = btreeHeaderOffset(pageNo)
      val ncells = u16(pg, off + 3)
      (pg(off) & 0xff) match {
        case 0x0d =>
          if (ncells == 0) return None
          val cellOff = u16(pg, off + 8 + 2 * (ncells - 1))
          val (_, n1) = varint(pg, cellOff)
          return Some(varint(pg, cellOff + n1)._1)
        case 0x05 => pageNo = u32(pg, off + 8).toInt
        case t => sys.error(
          f"sqlite: unexpected page type 0x$t%02x in maxRowid")
      }
    }
    sys.error("sqlite: maxRowid descent exceeded 64 levels (corrupt file)")
  }

  /** In-order scan of an INDEX B-tree (page types 0x02/0x0a) — the
    * storage of WITHOUT ROWID tables, whose rows live as key records
    * (PK columns first; see [[SqliteTableDef.storedOrder]]). Unlike
    * table B-trees, index INTERIOR pages carry entries too: traversal
    * is child₀, entry₀, child₁, entry₁, …, right-most. Overflow uses
    * the index inline-max X = 64·(U−12)/255 − 23 (vs U−35 for table
    * leaves). Emits raw record payloads in key order. */
  def scanIndex(pr: PageReader, header: Header, rootPage: Int)
      : Iterator[Array[Byte]] = new Iterator[Array[Byte]] {
    private sealed trait Task
    private case class VisitPage(pageNo: Int) extends Task
    private case class EmitCell(pg: Array[Byte], cellOff: Int,
                                interior: Boolean) extends Task

    private val stack = ArrayBuffer[Task](VisitPage(rootPage))
    private var nextPayload: Array[Byte] = _
    // corruption guard (see scanTable): cyclic pointers fail fast
    private var pagesVisited = 0L

    private def assemble(pg: Array[Byte], cellOff0: Int,
                         interior: Boolean): Array[Byte] =
      assembleIndexCell(pr, header, pg, cellOff0, interior)

    private def advance(): Unit = {
      nextPayload = null
      while (nextPayload == null && stack.nonEmpty) {
        stack.remove(stack.length - 1) match {
          case EmitCell(pg, off, interior) =>
            nextPayload = assemble(pg, off, interior)
          case VisitPage(pageNo) =>
            pagesVisited += 1
            require(header.pageCount == 0L ||
              pagesVisited <= header.pageCount,
              s"sqlite: index B-tree at page $rootPage visits more pages " +
                s"than the file holds (${header.pageCount}) — cyclic page " +
                "pointers (corrupt file)")
            val pg = pr.page(pageNo)
            val off = btreeHeaderOffset(pageNo)
            val ncells = u16(pg, off + 3)
            (pg(off) & 0xff) match {
              case 0x0a =>
                (ncells - 1 to 0 by -1).foreach(i => stack += EmitCell(pg,
                  u16(pg, off + 8 + 2 * i), interior = false))
              case 0x02 =>
                // in-order: child_i before entry_i; push reversed
                stack += VisitPage(u32(pg, off + 8).toInt) // right-most last
                (ncells - 1 to 0 by -1).foreach { i =>
                  val cellOff = u16(pg, off + 12 + 2 * i)
                  stack += EmitCell(pg, cellOff, interior = true)
                  stack += VisitPage(u32(pg, cellOff).toInt)
                }
              case t => sys.error(
                f"sqlite: unexpected page type 0x$t%02x at page $pageNo " +
                  "inside an index B-tree")
            }
        }
      }
    }

    advance()
    def hasNext: Boolean = nextPayload != null
    def next(): Array[Byte] = { val r = nextPayload; advance(); r }
  }

  // ---- index search (secondary-index eq lookups) -------------------------

  /** Total order of two decoded values per the sqlite record-comparison
    * rules under BINARY collation: NULL < numerics (INTEGER and REAL
    * compare numerically, cross-type) < TEXT (unsigned byte order of
    * the UTF-8 encoding) < BLOB (unsigned byte order). This is the
    * order index B-trees are sorted in, so a descent can prune subtrees
    * against it. Mixed int/real comparisons go through BigDecimal —
    * a long above 2^53 must not collapse into its neighbors. */
  def cmpValues(a: Value, b: Value): Int = {
    def rank(v: Value): Int = v match {
      case VNull => 0
      case _: VInt | _: VReal => 1
      case _: VText => 2
      case _: VBlob => 3
    }
    val (ra, rb) = (rank(a), rank(b))
    if (ra != rb) ra - rb
    else (a, b) match {
      case (VNull, VNull) => 0
      case (VInt(x), VInt(y)) => java.lang.Long.compare(x, y)
      case (VReal(x), VReal(y)) => java.lang.Double.compare(x, y)
      // sqlite cannot store NaN (it becomes NULL), so a NaN here can
      // only be a caller-supplied probe — ordered above all numerics
      // (an arbitrary but total order; eq probes filter NaN earlier)
      case (VInt(x), VReal(y)) =>
        if (y.isNaN) -1
        else if (y.isInfinite) { if (y > 0) -1 else 1 }
        else java.math.BigDecimal.valueOf(x).compareTo(
          new java.math.BigDecimal(y))
      case (VReal(x), VInt(y)) =>
        if (x.isNaN) 1
        else if (x.isInfinite) { if (x > 0) 1 else -1 }
        else new java.math.BigDecimal(x).compareTo(
          java.math.BigDecimal.valueOf(y))
      case (VText(x), VText(y)) =>
        java.util.Arrays.compareUnsigned(x.getBytes("UTF-8"),
          y.getBytes("UTF-8"))
      case (VBlob(x), VBlob(y)) => java.util.Arrays.compareUnsigned(x, y)
      case _ => 0 // unreachable: ranks differ
    }
  }

  /** One secondary index: name, owning table, root page, leading
    * column names (declared order), and whether this parser may USE it
    * for lookups (`usable=false` for partial indexes, DESC or COLLATE
    * or expression keys — shapes whose order this reader does not
    * replicate; they are listed but never probed). `usableIf` carries
    * the PARTIAL-index escape hatch: a partial index whose key shape is
    * otherwise probeable and whose WHERE clause is the simple
    * `col = literal` form is usable exactly when the query's pushed
    * filters contain that same conjunct (predicate implication — the
    * index then covers every qualifying row). Anything not provably
    * implied stays scan. */
  case class SqliteIndexDef(name: String, table: String, rootPage: Int,
                            columns: Seq[String], unique: Boolean,
                            usable: Boolean,
                            usableIf: Option[(String, Value)] = None)

  /** All indexes in the file, from `sqlite_master` rows of
    * type='index'. Two sources: explicit `CREATE INDEX` DDL, and the
    * DDL-less `sqlite_autoindex_<table>_1` that a non-alias PRIMARY
    * KEY on a rowid table creates (its columns are the table's PK
    * columns — the reference-shaped `HOSPITAL_PATIENT_ID` unique-key
    * lookup lands exactly there). Later autoindexes (UNIQUE
    * constraints) are skipped: recovering their column lists needs
    * constraint-order bookkeeping this reader doesn't claim. */
  def indexes(pr: PageReader, header: Header): Seq[SqliteIndexDef] = {
    val tableDefs = tables(pr, header).map(t => t.name -> t).toMap
    scanTable(pr, header, 1).flatMap { row =>
      val vals = decodeRecord(row.payload, _ => true,
        textCharset(header.textEncoding))
      (vals.lift(0), vals.lift(1), vals.lift(2), vals.lift(3),
        vals.lift(4)) match {
        case (Some(VText("index")), Some(VText(name)), Some(VText(tbl)),
              Some(VInt(root)), sqlv) =>
          // a column-level COLLATE in the TABLE DDL changes the sort
          // order of every index over that column — the probe's
          // BINARY-order descent must not use it (the scan fallback
          // serves those filters correctly)
          def colCollated(t: SqliteTableDef, colName: String): Boolean =
            t.columns.exists(c =>
              c.name.equalsIgnoreCase(colName) && c.collated)
          sqlv match {
            case Some(VText(sql)) =>
              parseCreateIndex(name, tbl, root.toInt, sql).map { ix =>
                val anyCollated = tableDefs.get(tbl).exists(t =>
                  ix.columns.exists(cn => colCollated(t, cn)))
                // a collated key column breaks BINARY order for the
                // partial-implication path too — clear BOTH flags
                if (anyCollated) ix.copy(usable = false, usableIf = None)
                else ix
              }
            case _ => // DDL-less autoindex: PK autoindex is index 1
              tableDefs.get(tbl) match {
                case Some(t) if name == s"sqlite_autoindex_${tbl}_1" &&
                    !t.withoutRowid && t.pkCols.nonEmpty &&
                    !t.columns.exists(_.rowidAlias) =>
                  // probeable only when the PK is plain BINARY asc:
                  // no DESC/COLLATE on a key part, no column-level
                  // COLLATE on a key column
                  val plain = t.pkPlain &&
                    !t.pkCols.exists(cn => colCollated(t, cn))
                  Some(SqliteIndexDef(name, tbl, root.toInt, t.pkCols,
                    unique = true, usable = plain))
                case _ => None
              }
          }
        case _ => None
      }
    }.toSeq
  }

  /** First top-level '(' OUTSIDE any quoted identifier/literal — a
    * quoted index or table name containing '(' must not be mistaken
    * for the column-list opener (advisor r10; same quote set as
    * [[topLevelSplit]]). */
  private def findTopLevelOpenParen(sql: String): Int = {
    var i = 0; var quote: Char = 0
    while (i < sql.length) {
      val c = sql(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '[' => quote = ']'
        case '(' => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Parse `CREATE [UNIQUE] INDEX name ON table (cols...) [WHERE ...]`.
    * Expression keys, DESC order, COLLATE clauses and partial (WHERE)
    * indexes come back `usable=false` — still cataloged, never probed
    * unconditionally. A partial index whose key shape is otherwise
    * clean and whose WHERE clause is exactly `col = literal` carries
    * that conjunct in `usableIf`: probeable only under predicate
    * implication (the query must push the same `col = literal`). */
  def parseCreateIndex(name: String, table: String, rootPage: Int,
                       sql: String): Option[SqliteIndexDef] = {
    val open = findTopLevelOpenParen(sql)
    if (open < 0) return None
    // match the closing paren of the column list (quote-aware)
    var depth = 0; var i = open; var close = -1; var quote: Char = 0
    while (i < sql.length && close < 0) {
      val c = sql(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '[' => quote = ']'
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = i
        case _ =>
      }
      i += 1
    }
    if (close < 0) return None
    val unique = stripLiterals(sql.substring(0, open)).toUpperCase
      .matches("(?s).*\\bUNIQUE\\b.*")
    val tail = sql.substring(close + 1)
    val partial = stripLiterals(tail).toUpperCase
      .matches("(?s).*\\bWHERE\\b.*")
    val parts = topLevelSplit(sql.substring(open + 1, close))
    var keyShapeUsable = true
    val cols = parts.map { p =>
      val stripped = stripLiterals(p).toUpperCase
      if (stripped.matches("(?s).*\\b(DESC|COLLATE)\\b.*"))
        keyShapeUsable = false
      val trimmed = p.trim
      // a usable key part is a bare (possibly quoted) identifier,
      // optionally followed by ASC
      val ident = trimmed.split("\\s+").headOption.getOrElse("")
      val rest = trimmed.drop(ident.length).trim.toUpperCase
      if (rest.nonEmpty && rest != "ASC") keyShapeUsable = false
      if (ident.exists(c => "()+-*/%|'\"".contains(c)) &&
          !(ident.headOption.exists(h => h == '"' || h == '`' ||
            h == '[' || h == '\'')))
        keyShapeUsable = false // expression key
      unquoteIdent(ident)
    }
    val usableIf =
      if (!partial || !keyShapeUsable) None else parsePartialWhere(tail)
    Some(SqliteIndexDef(name, table, rootPage, cols, unique,
      usable = keyShapeUsable && !partial, usableIf = usableIf))
  }

  /** The simple-implication form of a partial index's WHERE clause:
    * exactly `WHERE col = literal` (integer, real, or single-quoted
    * text), whole tail anchored — `WHERE a = 1 AND b = 2`, IS NULL,
    * comparisons etc. all come back None and the index is never
    * probed. Deliberately narrow: implication is only claimed where it
    * is trivially provable. */
  def parsePartialWhere(tail: String): Option[(String, Value)] = {
    val re = ("(?is)\\s*WHERE\\s+(\"(?:[^\"]|\"\")+\"|`(?:[^`]|``)+`|" +
      "\\[[^\\]]+\\]|[A-Za-z_][A-Za-z0-9_$]*)\\s*==?\\s*" +
      "('(?:[^']|'')*'|[+-]?\\d+(?:\\.\\d+)?)\\s*").r
    tail match {
      case re(colRaw, lit) =>
        val col = unquoteIdent(colRaw)
        val v: Value =
          if (lit.startsWith("'"))
            VText(lit.substring(1, lit.length - 1).replace("''", "'"))
          else if (lit.contains('.')) VReal(lit.toDouble)
          else lit.toLongOption.map(VInt(_)).getOrElse(VReal(lit.toDouble))
        Some((col, v))
      case _ => None
    }
  }

  /** Assemble one index-cell payload (leaf or interior), walking the
    * overflow chain with the INDEX inline geometry
    * (X = 64·(U−12)/255 − 23). Shared by the in-order scan and both
    * targeted descents. */
  private def assembleIndexCell(pr: PageReader, header: Header,
                                pg: Array[Byte], cellOff0: Int,
                                interior: Boolean): Array[Byte] = {
    val u = header.usable
    val maxInline = (u - 12) * 64 / 255 - 23
    val minInline = (u - 12) * 32 / 255 - 23
    val cellOff = if (interior) cellOff0 + 4 else cellOff0 // skip child
    val (p, n1) = varint(pg, cellOff)
    val bodyOff = cellOff + n1
    val payloadLen = p.toInt
    if (payloadLen <= maxInline)
      java.util.Arrays.copyOfRange(pg, bodyOff, bodyOff + payloadLen)
    else {
      val k0 = minInline + (payloadLen - minInline) % (u - 4)
      val inline = if (k0 <= maxInline) k0 else minInline
      val buf = new Array[Byte](payloadLen)
      System.arraycopy(pg, bodyOff, buf, 0, inline)
      var written = inline
      var next = u32(pg, bodyOff + inline).toInt
      while (next != 0 && written < payloadLen) {
        val op = pr.page(next)
        val take = math.min(u - 4, payloadLen - written)
        System.arraycopy(op, 4, buf, written, take)
        written += take
        next = u32(op, 0).toInt
      }
      require(written == payloadLen,
        s"sqlite: truncated index overflow chain " +
          s"($written of $payloadLen bytes)")
      buf
    }
  }

  /** LAST column of a record as a long — on a rowid table's secondary
    * index the record is (key cols…, rowid), so this is the rowid.
    * Walks only the record HEADER (serial-type varints); no key-column
    * bodies are decoded or buffered (advisor r10: the probe must not
    * materialize full key payloads). */
  def lastColLong(payload: Array[Byte]): Option[Long] = {
    val (hdrLen, n0) = varint(payload, 0)
    var ho = n0
    var bo = hdrLen.toInt
    var lastT = -1L
    var lastOff = -1
    while (ho < hdrLen) {
      val (t, n) = varint(payload, ho)
      ho += n
      lastT = t
      lastOff = bo
      bo += serialLen(t)
    }
    if (lastT < 0) None
    else serialValue(lastT, payload, lastOff) match {
      case VInt(v) => Some(v)
      case _ => None
    }
  }

  /** SQLite record-comparison rank: NULL < numeric < TEXT < BLOB. */
  private def serialRank(t: Long): Int =
    if (t == 0) 0
    else if (t >= 1 && t <= 9) 1
    else if (t >= 13 && t % 2 == 1) 2
    else if (t >= 12 && t % 2 == 0) 3
    else sys.error(s"sqlite: reserved serial type $t in an index key")

  /** Compare one stored key cell against a probe value. TEXT probes on
    * UTF-8 files compare the RAW STORED BYTES against the probe's
    * UTF-8 encoding (`probeUtf8`, non-null exactly then): sqlite's
    * BINARY collation is memcmp over storage, and decode→re-encode
    * mangles invalid UTF-8 into U+FFFD, which can disagree with the
    * tree's order and prune a subtree holding a real match (advisor
    * r10). Everything else decodes and uses [[cmpValues]] (numeric
    * decode is lossless). */
  private def cmpColRaw(payload: Array[Byte], st: Long, off: Int,
                        probe: Value, probeUtf8: Array[Byte],
                        charset: String): Int =
    probe match {
      case VText(_) if probeUtf8 != null =>
        val r = serialRank(st)
        if (r != 2) r - 2
        else java.util.Arrays.compareUnsigned(payload, off,
          off + serialLen(st), probeUtf8, 0, probeUtf8.length)
      case _ => cmpValues(serialValue(st, payload, off, charset), probe)
    }

  /** Lexicographic compare of the record's leading columns against the
    * bound tuple (over `bound.length` columns; 0 = equal on every
    * compared column). `boundUtf8(i)` is the probe's raw UTF-8 bytes
    * when column i is a text probe on a UTF-8 file, else null. */
  private def cmpLeading(payload: Array[Byte], bound: Array[Value],
                         boundUtf8: Array[Array[Byte]],
                         charset: String): Int = {
    if (bound.length == 0) return 0
    val (hdrLen, n0) = varint(payload, 0)
    var ho = n0
    var bo = hdrLen.toInt
    var i = 0
    while (i < bound.length && ho < hdrLen) {
      val (t, n) = varint(payload, ho)
      ho += n
      val c = cmpColRaw(payload, t, bo, bound(i), boundUtf8(i), charset)
      if (c != 0) return c
      bo += serialLen(t)
      i += 1
    }
    0
  }

  /** A leading-columns probe against an index B-tree: a row matches
    * when its first `prefix.length` key columns equal `prefix` AND,
    * when bounds are given, the NEXT key column lies within
    * [`lo`, `hi`] (each `(value, inclusive)`; a missing bound is
    * open). Shapes expressed: pure eq (`prefix=Seq(v)`), IN (one probe
    * per value), range on the first column (`prefix=Nil` + bounds),
    * and composite-prefix probes (eq on the leading column(s) of a
    * multi-column index, optional range on the next). */
  case class IndexProbe(prefix: Seq[Value],
                        lo: Option[(Value, Boolean)] = None,
                        hi: Option[(Value, Boolean)] = None)

  /** Targeted descent of a secondary-index B-tree resolving `probe` to
    * ROWIDS — O(depth + matches) pages, 8 bytes buffered per match.
    * Returns None as soon as MORE than `limit` rowids have been
    * collected (the abort happens DURING the descent — an unselective
    * probe on a huge index stops after limit+1 matches instead of
    * buffering O(matches) on the driver, advisor r10); the caller
    * falls back to the scan path. Duplicate keys spanning several
    * children are handled by descending every child whose
    * (prevKey, cellKey] range overlaps the probe's bounds. */
  def searchIndexRowids(pr: PageReader, header: Header, rootPage: Int,
                        probe0: IndexProbe, limit: Long)
      : Option[ArrayBuffer[Long]] = {
    // a hi-only range gets a synthetic EXCLUSIVE-NULL low bound: NULL
    // keys rank below every value, so without it every NULL entry in
    // the index would match (Spark's pushed comparison can never be
    // satisfied by NULL) — bloating the rowid buffer and needlessly
    // tripping the budget abort on mostly-NULL columns (review r11)
    val probe =
      if (probe0.lo.isEmpty && probe0.hi.isDefined)
        probe0.copy(lo = Some((VNull, false)))
      else probe0
    val charset = textCharset(header.textEncoding)
    val lowTuple = (probe.prefix ++ probe.lo.map(_._1)).toArray
    val highTuple = (probe.prefix ++ probe.hi.map(_._1)).toArray
    def utf8Of(vs: Array[Value]): Array[Array[Byte]] = vs.map {
      case VText(s) if charset == "UTF-8" => s.getBytes("UTF-8")
      case _ => null
    }
    val lowUtf8 = utf8Of(lowTuple)
    val highUtf8 = utf8Of(highTuple)
    // exact membership: prefix equal, bound column (if any) inside
    def matches(payload: Array[Byte]): Boolean = {
      if (cmpLeading(payload, lowTuple, lowUtf8, charset) match {
            case c if c < 0 => true
            case 0 => probe.lo.exists(!_._2) // exclusive low: ties out
            case _ => false
          }) return false
      cmpLeading(payload, highTuple, highUtf8, charset) match {
        case c if c > 0 => false
        case 0 => !probe.hi.exists(!_._2) // exclusive high: ties out
        case _ => true
      }
    }
    val out = ArrayBuffer.empty[Long]
    var over = false
    def collect(payload: Array[Byte]): Unit =
      if (!over && matches(payload)) {
        lastColLong(payload) match {
          case Some(r) =>
            if (out.length.toLong >= limit) over = true else out += r
          case None => // non-integer trailer: not a rowid-table index row
        }
      }
    var pagesVisited = 0L
    def visit(pageNo: Int): Unit = {
      if (over) return
      pagesVisited += 1
      require(header.pageCount == 0L || pagesVisited <= header.pageCount,
        s"sqlite: index search at page $rootPage visits more pages " +
          "than the file holds — cyclic page pointers (corrupt file)")
      val pg = pr.page(pageNo)
      val off = btreeHeaderOffset(pageNo)
      val ncells = u16(pg, off + 3)
      (pg(off) & 0xff) match {
        case 0x0a =>
          var i = 0
          var stop = false
          while (i < ncells && !stop && !over) {
            val payload = assembleIndexCell(pr, header, pg,
              u16(pg, off + 8 + 2 * i), interior = false)
            if (cmpLeading(payload, highTuple, highUtf8, charset) > 0)
              stop = true // sorted: nothing further can match
            else collect(payload)
            i += 1
          }
        case 0x02 =>
          // children delimited by entry keys: child_i holds keys in
          // (entry_{i-1}, entry_i]; descend those overlapping the
          // bounds (ties descend — conservative, exactness is at the
          // leaf membership check)
          var prevBelowHigh = true // open start: before everything
          var i = 0
          var stop = false
          while (i < ncells && !stop && !over) {
            val cellOff = u16(pg, off + 12 + 2 * i)
            val payload = assembleIndexCell(pr, header, pg, cellOff,
              interior = true)
            val cLow = cmpLeading(payload, lowTuple, lowUtf8, charset)
            val cHigh = cmpLeading(payload, highTuple, highUtf8, charset)
            if (prevBelowHigh && cLow >= 0)
              visit(u32(pg, cellOff).toInt)
            collect(payload)
            if (cHigh > 0) stop = true
            prevBelowHigh = cHigh <= 0
            i += 1
          }
          if (!stop && !over && prevBelowHigh)
            visit(u32(pg, off + 8).toInt) // right-most child
        case t => sys.error(
          f"sqlite: unexpected page type 0x$t%02x at page $pageNo inside " +
            "an index B-tree")
      }
    }
    visit(rootPage)
    if (over) None else Some(out)
  }

  /** Targeted descent of an index B-tree: emit the raw key records
    * whose FIRST column equals `target`. Interior pages prune children
    * whose key range cannot contain the target, so cost is O(depth +
    * matches) pages however large the index — the set-at-a-time form
    * of sqlite's own `WHERE indexed_col = ?` probe. TEXT targets
    * compare by RAW STORED BYTES on UTF-8 files (see [[cmpColRaw]]).
    * Test/diagnostic surface — the DSv2 production path goes through
    * [[searchIndexRowids]] (rowid-only buffering, early abort). */
  def searchIndexEq(pr: PageReader, header: Header, rootPage: Int,
                    target: Value): Iterator[Array[Byte]] = {
    val charset = textCharset(header.textEncoding)
    val tup = Array(target)
    val tupUtf8: Array[Array[Byte]] = Array(target match {
      case VText(s) if charset == "UTF-8" => s.getBytes("UTF-8")
      case _ => null
    })
    def cmpFirst(payload: Array[Byte]): Int =
      cmpLeading(payload, tup, tupUtf8, charset)

    val out = ArrayBuffer.empty[Array[Byte]]
    var pagesVisited = 0L
    def visit(pageNo: Int): Unit = {
      pagesVisited += 1
      require(header.pageCount == 0L || pagesVisited <= header.pageCount,
        s"sqlite: index eq-search at page $rootPage visits more pages " +
          s"than the file holds — cyclic page pointers (corrupt file)")
      val pg = pr.page(pageNo)
      val off = btreeHeaderOffset(pageNo)
      val ncells = u16(pg, off + 3)
      (pg(off) & 0xff) match {
        case 0x0a =>
          var i = 0
          var stop = false
          while (i < ncells && !stop) {
            val payload = assembleIndexCell(pr, header, pg,
              u16(pg, off + 8 + 2 * i), interior = false)
            val c = cmpFirst(payload)
            if (c == 0) out += payload
            else if (c > 0) stop = true // sorted: nothing further matches
            i += 1
          }
        case 0x02 =>
          // children delimited by entry keys: child_i holds keys in
          // (entry_{i-1}, entry_i]; descend those overlapping the point
          var prevCmp = -1 // cmp(prevKey, target); open start = below
          var i = 0
          var stop = false
          while (i < ncells && !stop) {
            val cellOff = u16(pg, off + 12 + 2 * i)
            val payload = assembleIndexCell(pr, header, pg, cellOff,
              interior = true)
            val c = cmpFirst(payload)
            if (prevCmp <= 0 && c >= 0)
              visit(u32(pg, cellOff).toInt)
            if (c == 0) out += payload
            if (c > 0) stop = true
            prevCmp = c
            i += 1
          }
          if (!stop && prevCmp <= 0)
            visit(u32(pg, off + 8).toInt) // right-most child
        case t => sys.error(
          f"sqlite: unexpected page type 0x$t%02x at page $pageNo inside " +
            "an index B-tree")
      }
    }
    visit(rootPage)
    out.iterator
  }

  /** The rowids of the table rows whose `idx`-leading column equals
    * `target` — an index record on a rowid table is (key cols…, rowid),
    * so the LAST record column carries the rowid. Unlimited
    * test/diagnostic form; the DSv2 path uses [[searchIndexRowids]]
    * with its in-descent abort. */
  def indexRowidsEq(pr: PageReader, header: Header, idx: SqliteIndexDef,
                    target: Value): Seq[Long] =
    searchIndexRowids(pr, header, idx.rootPage,
      IndexProbe(Seq(target)), Long.MaxValue)
      .map(_.toSeq).getOrElse(Nil)

  // ---- schema (sqlite_master + CREATE TABLE parsing) ---------------------

  /** `collated` marks a column-level COLLATE clause in the table DDL:
    * indexes over such a column sort by that collation, not BINARY —
    * the eq-pushdown descent must not use them (reads stay correct:
    * the scan fallback serves those filters). */
  case class SqliteColumn(name: String, declaredType: String,
                          rowidAlias: Boolean,
                          collated: Boolean = false) {
    /** SQLite type affinity of the declared type (the documented
      * substring rules, applied in order). */
    def affinity: String = {
      val t = declaredType.toUpperCase
      if (t.contains("INT")) "INTEGER"
      else if (t.contains("CHAR") || t.contains("CLOB") || t.contains("TEXT"))
        "TEXT"
      else if (t.isEmpty || t.contains("BLOB")) "BLOB"
      else if (t.contains("REAL") || t.contains("FLOA") || t.contains("DOUB"))
        "REAL"
      else "NUMERIC"
    }
  }

  /** `pkCols`: the PRIMARY KEY columns in KEY ORDER (needed to un-permute
    * WITHOUT ROWID records, whose on-disk column order is PK columns
    * first, then the remaining declared columns). `pkPlain`: no DESC /
    * COLLATE on any PK part — the condition for the PK's autoindex to
    * be BINARY-ascending and therefore probeable. */
  case class SqliteTableDef(name: String, rootPage: Int,
                            columns: Seq[SqliteColumn], withoutRowid: Boolean,
                            pkCols: Seq[String] = Nil,
                            pkPlain: Boolean = true) {
    /** On-disk column order of a WITHOUT ROWID record, as DECLARED
      * column ordinals: PK columns (key order) then the rest
      * (declared order). Identity for rowid tables. */
    def storedOrder: Seq[Int] =
      if (!withoutRowid) columns.indices
      else {
        val pkIdx = pkCols.map(pk =>
          columns.indexWhere(_.name.equalsIgnoreCase(pk)))
        pkIdx ++ columns.indices.filterNot(pkIdx.contains)
      }
  }

  /** All ordinary tables in the file, read from the `sqlite_master`
    * catalog B-tree at page 1 (columns: type, name, tbl_name, rootpage,
    * sql). Internal `sqlite_*` tables and non-table objects are
    * skipped. */
  def tables(pr: PageReader, header: Header): Seq[SqliteTableDef] =
    scanTable(pr, header, 1).flatMap { row =>
      val vals = decodeRecord(row.payload, _ => true,
        textCharset(header.textEncoding))
      (vals.lift(0), vals.lift(1), vals.lift(3), vals.lift(4)) match {
        case (Some(VText("table")), Some(VText(name)), Some(VInt(root)),
              Some(VText(sql))) if !name.startsWith("sqlite_") =>
          Some(parseCreateTable(name, root.toInt, sql))
        case _ => None
      }
    }.toSeq

  /** Split `s` on top-level commas: commas inside (), '', "", [], ``
    * do not split. */
  private def topLevelSplit(s: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (quote != 0) {
        cur += c
        // '' / "" escapes: a doubled quote stays inside the literal
        if (c == quote && i + 1 < s.length && s(i + 1) == quote) {
          cur += s(i + 1); i += 1
        } else if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' | '`' => quote = c; cur += c
        case '[' => quote = ']'; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.result(); cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    if (cur.nonEmpty) out += cur.result()
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Replace quoted literals/identifiers ('', "", ``, []) and SQL
    * comments (double-dash to end-of-line, and slash-star block form)
    * with spaces, so keyword searches over a column definition cannot
    * false-positive on text inside a DEFAULT string or a comment.
    * Lengths are not preserved; only keyword PRESENCE checks may use
    * the result. */
  private def stripLiterals(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '\'' || c == '"' || c == '`' || c == '[') {
        val q = if (c == '[') ']' else c
        out += ' '
        i += 1
        var closed = false
        while (i < s.length && !closed) {
          if (s(i) == q) {
            // '' / "" / `` escapes stay inside the literal ([] has none)
            if (q != ']' && i + 1 < s.length && s(i + 1) == q) i += 2
            else { closed = true; i += 1 }
          } else i += 1
        }
      } else if (c == '-' && i + 1 < s.length && s(i + 1) == '-') {
        while (i < s.length && s(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < s.length && s(i + 1) == '*') {
        val end = s.indexOf("*/", i + 2)
        i = if (end < 0) s.length else end + 2
        out += ' '
      } else { out += c; i += 1 }
    }
    out.result()
  }

  private def unquoteIdent(raw: String): String = {
    val t = raw.trim
    if (t.length >= 2 && ((t.head == '"' && t.last == '"') ||
        (t.head == '`' && t.last == '`') || (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1).replace(s"${t.head}${t.head}",
        t.head.toString)
    else if (t.length >= 2 && t.head == '[' && t.last == ']')
      t.substring(1, t.length - 1)
    else t
  }

  private val constraintKeywords = Set("CONSTRAINT", "PRIMARY", "NOT",
    "NULL", "UNIQUE", "CHECK", "DEFAULT", "COLLATE", "REFERENCES",
    "GENERATED", "AS")
  private val tableConstraintStart = Set("CONSTRAINT", "PRIMARY", "UNIQUE",
    "CHECK", "FOREIGN")

  /** Recover the column list from a `CREATE TABLE` statement — names,
    * declared types, and the ROWID-ALIAS column (SQLite stores NULL in
    * the record for an INTEGER PRIMARY KEY column and carries the value
    * in the B-tree rowid; reading it back without this flag yields an
    * all-null key column, exactly what the reference's
    * `PRIMARY KEY (PATIENT_NUM)` tables would hit). Both alias spellings
    * are handled: the inline `col INTEGER PRIMARY KEY` (non-DESC) and
    * the table-constraint `PRIMARY KEY (col)` over an INTEGER column.
    * This is a schema-shape parser, not a SQL validator: expressions
    * inside CHECK/DEFAULT are skipped structurally (paren/quote-aware
    * top-level split), never evaluated. */
  def parseCreateTable(name: String, rootPage: Int, sql: String)
      : SqliteTableDef = {
    val open = findTopLevelOpenParen(sql) // quote-aware: a '(' inside a
    require(open > 0, s"sqlite: cannot parse CREATE TABLE for $name")
    // quoted table name must not open the body (advisor r10)
    // match the body's closing paren (quote-aware)
    var depth = 0; var i = open; var close = -1; var quote: Char = 0
    while (i < sql.length && close < 0) {
      val c = sql(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '[' => quote = ']'
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = i
        case _ =>
      }
      i += 1
    }
    require(close > open, s"sqlite: unbalanced CREATE TABLE for $name")
    val withoutRowid = stripLiterals(sql.substring(close + 1))
      .toUpperCase.matches("(?s).*WITHOUT\\s+ROWID.*")
    val defs = topLevelSplit(sql.substring(open + 1, close))
    val (constraintDefs, columnDefs) = defs.partition { d =>
      tableConstraintStart.contains(
        d.trim.split("\\s+|\\(").headOption.getOrElse("").toUpperCase)
    }
    // table-level PRIMARY KEY (col, ...) — ordered key columns; a
    // single INTEGER key is the rowid-alias candidate, multi-column
    // keys matter for WITHOUT ROWID record un-permutation. Any DESC /
    // COLLATE on a key part flips the PK autoindex out of plain
    // BINARY-ascending order (pkPlain=false → never probed).
    var tablePkPlain = true
    val tablePkCols: Seq[String] = constraintDefs.iterator
      .map(_.trim)
      .filter(_.toUpperCase.matches("(?s)PRIMARY\\s+KEY\\s*\\(.*"))
      .flatMap { d =>
        val inner = d.substring(d.indexOf('(') + 1, d.lastIndexOf(')'))
        // strip trailing ASC/DESC/COLLATE per key part
        topLevelSplit(inner).map { c =>
          val parts = c.trim.split("\\s+")
          if (!parts.drop(1).forall(_.equalsIgnoreCase("ASC")))
            tablePkPlain = false
          unquoteIdent(parts.head)
        }
      }.toSeq
    val tablePkCol: Option[String] =
      if (tablePkCols.size == 1) Some(tablePkCols.head.toUpperCase) else None
    val cols = columnDefs.map { d =>
      val trimmed = d.trim
      // identifier: quoted run or bare token
      val (rawName, rest) = trimmed.head match {
        case '"' | '`' | '\'' =>
          val q = trimmed.head
          var j = 1
          while (j < trimmed.length &&
            !(trimmed(j) == q &&
              (j + 1 >= trimmed.length || trimmed(j + 1) != q))) {
            j += (if (trimmed(j) == q) 2 else 1)
          }
          (trimmed.substring(0, j + 1), trimmed.substring(j + 1))
        case '[' =>
          val j = trimmed.indexOf(']')
          (trimmed.substring(0, j + 1), trimmed.substring(j + 1))
        case _ =>
          val j = trimmed.indexWhere(c => c.isWhitespace || c == '(')
          if (j < 0) (trimmed, "") else (trimmed.substring(0, j),
            trimmed.substring(j))
      }
      // declared type: tokens until the first constraint keyword at
      // paren depth 0 (types carry parens: VARCHAR2(100), FLOAT(126))
      val typeTokens = ArrayBuffer.empty[String]
      var done = false
      var restStr = rest.trim
      while (!done && restStr.nonEmpty) {
        val tok =
          if (restStr.head == '(') {
            var d2 = 0; var j = 0; var end = -1
            while (j < restStr.length && end < 0) {
              restStr(j) match {
                case '(' => d2 += 1
                case ')' => d2 -= 1; if (d2 == 0) end = j
                case _ =>
              }
              j += 1
            }
            restStr.substring(0, end + 1)
          } else restStr.split("\\s+|(?=\\()").head
        if (constraintKeywords.contains(tok.toUpperCase)) done = true
        else {
          typeTokens += tok
          restStr = restStr.substring(tok.length).trim
        }
      }
      val colName = unquoteIdent(rawName)
      val declared = typeTokens.mkString(" ")
      // keyword checks run over the LITERAL-STRIPPED text (a DEFAULT
      // 'primary key' string or a comment must not set the flag) and
      // match PRIMARY\s+KEY so newline/multi-space spellings — which
      // sqlite itself accepts — are seen (advisor r09)
      val upperRest = stripLiterals(rest).toUpperCase
      val inlinePk = upperRest.matches("(?s).*PRIMARY\\s+KEY.*")
      val inlineDesc = upperRest.matches("(?s).*PRIMARY\\s+KEY\\s+DESC.*")
      val collated = upperRest.matches("(?s).*\\bCOLLATE\\b.*")
      // WITHOUT ROWID tables have no rowid to alias: the PK columns are
      // stored as real record values (in key order, up front)
      val isAlias = !withoutRowid && declared.equalsIgnoreCase("INTEGER") &&
        ((inlinePk && !inlineDesc) ||
          tablePkCol.contains(colName.toUpperCase))
      // an inline PK with DESC or COLLATE is not BINARY-ascending
      val pkPartPlain = !inlinePk || (!inlineDesc && !collated)
      (SqliteColumn(colName, declared, isAlias, collated), inlinePk,
        pkPartPlain)
    }
    val pkCols =
      if (tablePkCols.nonEmpty) tablePkCols
      else cols.collect { case (c, true, _) => c.name }.toSeq
    val pkPlain = tablePkPlain && cols.forall(_._3)
    SqliteTableDef(name, rootPage, cols.map(_._1), withoutRowid, pkCols,
      pkPlain)
  }
}
