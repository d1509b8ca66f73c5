package graft.sources

import scala.collection.mutable.ArrayBuffer

import SqliteFile._

/** INCREMENTAL SQLite write: append a committed transaction to an
  * existing database image as WAL FRAMES (salted, checksummed), never
  * rewriting the main file — the write-side twin of [[SqliteWal]] /
  * [[SqliteTail]] (which only READ a live WAL). [[SqliteWriter]] emits
  * full main-file images; re-emitting the whole image per batch costs
  * O(warehouse) per append, while a WAL append costs O(transaction):
  * the shape an incremental export sink needs (the reference's watcher
  * appends per poll through `sqlite3.Connection`, `script.py:123-126`
  * — in WAL mode exactly this on-disk operation).
  *
  * Scope (documented, enforced): INSERT-only transactions whose rowids
  * strictly exceed the table's current max — the monotone append of an
  * export/CDC sink. The B-tree mutation is then confined to the
  * RIGHTMOST SPINE: fill the rightmost leaf, chain fresh leaves past
  * it, push separators up the spine, growing the tree with sqlite's
  * own root-stays-put deepening (balance_deeper) when a spine node
  * overflows. Tables with indexes are rejected (an index B-tree would
  * also need maintenance); so are WITHOUT ROWID tables and non-UTF-8
  * encodings. General UPDATE/DELETE stays out of scope — that path is
  * the TxLog warehouse, not a .db export.
  *
  * Like [[SqliteWriter.export]] this is a DRIVER-SIDE single-writer
  * sink by contract (sqlite's own locking protocol allows exactly one
  * writer): the main image is buffered in memory to read the spine and
  * produce modified page images. Frames append onto an existing -wal
  * (continuing its salt + cumulative checksum chain after the last
  * valid commit, truncating any torn tail — sqlite recovery semantics)
  * or start a fresh one. Validated two ways per round: the repo's own
  * WAL overlay reader (SqliteWalWriterSpec) and python's stdlib
  * sqlite3 incl. `PRAGMA integrity_check` after a real checkpoint
  * (tools/check_wal_roundtrip.py).
  *
  * Format: sqlite.org/fileformat2 §WAL — 32-byte header (magic
  * 0x377f0683 = big-endian checksum words, version 3007000, page size,
  * checkpoint sequence, salts, header checksum) then 24-byte frame
  * headers + page images; the last frame of a transaction carries the
  * post-commit database size in pages.
  */
object SqliteWalWriter {

  /** Flip an existing main-file image to WAL journal mode in place —
    * the on-disk effect of `PRAGMA journal_mode=WAL` (header
    * read/write version bytes 18/19 := 2). Readers consult a -wal
    * sidecar only when the header says WAL. Idempotent. */
  def enableWalMode(path: String): Unit = {
    val f = new java.io.RandomAccessFile(path, "rw")
    try {
      val hdr = new Array[Byte](100)
      f.readFully(hdr)
      parseHeader(hdr) // validates magic/page size before touching
      if (hdr(18) != 2 || hdr(19) != 2) {
        f.seek(18L)
        f.write(Array[Byte](2, 2))
      }
    } finally f.close()
  }

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v >>> 8).toByte; b(o + 1) = v.toByte
  }
  private def putU32(b: Array[Byte], o: Int, v: Long): Unit = {
    b(o) = (v >>> 24).toByte; b(o + 1) = (v >>> 16).toByte
    b(o + 2) = (v >>> 8).toByte; b(o + 3) = v.toByte
  }

  /** Mutable working set of one append: current page images (main file
    * + committed -wal overlay + this transaction's edits) and the list
    * of pages this transaction dirtied, in first-touch order. */
  private final class TxPages(init: Array[Array[Byte]], val pageSize: Int) {
    val pages: ArrayBuffer[Array[Byte]] = ArrayBuffer(init: _*)
    val dirty = scala.collection.mutable.LinkedHashSet.empty[Int]
    def apply(n: Int): Array[Byte] = pages(n - 1)
    def touch(n: Int): Array[Byte] = { dirty += n; pages(n - 1) }
    def alloc(): Int = {
      pages += new Array[Byte](pageSize)
      // SQLite's locking page: the page containing byte offset
      // 0x40000000 (PENDING_BYTE) must never hold B-tree or overflow
      // content — sqlite itself skip-allocates it. An append growing
      // past 1 GiB is out of this writer's scope; fail LOUDLY like the
      // index/WITHOUT-ROWID gates rather than emit a silently corrupt
      // image (advisor r12).
      require(pages.length.toLong != 0x40000000L / pageSize + 1,
        s"append would allocate the PENDING_BYTE locking page (page " +
          s"${pages.length} at pageSize $pageSize): databases past " +
          "1 GiB are outside SqliteWalWriter's supported scope")
      dirty += pages.length
      pages.length
    }
  }

  private def hdrOff(pageNo: Int): Int = if (pageNo == 1) 100 else 0

  /** Append `cell` to a page whose keys all precede it (monotone
    * append: the pointer goes at the END of the array, content grows
    * down). Returns false when the cell + its 2-byte pointer do not
    * fit in the free gap. */
  private def appendCell(tx: TxPages, pageNo: Int, cell: Array[Byte])
      : Boolean = {
    val p = tx(pageNo)
    val base = hdrOff(pageNo)
    val pageType = p(base) & 0xff
    val headLen = if (pageType == 0x05 || pageType == 0x02) 12 else 8
    val n = u16(p, base + 3)
    val contentStart0 = u16(p, base + 5)
    val contentStart = if (contentStart0 == 0) 65536 else contentStart0
    val ptrEnd = base + headLen + 2 * n
    if (contentStart - ptrEnd < cell.length + 2) return false
    val at = contentStart - cell.length
    val pw = tx.touch(pageNo)
    System.arraycopy(cell, 0, pw, at, cell.length)
    putU16(pw, base + 5, at)
    putU16(pw, base + headLen + 2 * n, at)
    putU16(pw, base + 3, n + 1)
    true
  }

  /** Initialize a fresh page as an empty b-tree node. */
  private def initPage(tx: TxPages, pageNo: Int, pageType: Int,
                       rightMost: Long = 0L): Unit = {
    val p = tx.touch(pageNo)
    java.util.Arrays.fill(p, 0.toByte)
    val base = hdrOff(pageNo)
    p(base) = pageType.toByte
    putU16(p, base + 3, 0)
    putU16(p, base + 5, if (tx.pageSize == 65536) 0 else tx.pageSize)
    if (pageType == 0x05 || pageType == 0x02)
      putU32(p, base + 8, rightMost)
  }

  /** One leaf cell; overflow pages (payload beyond the inline max)
    * allocate fresh pages in `tx`. Mirrors [[SqliteWriter]]'s private
    * builder but against the transaction's page set. */
  private def leafCell(tx: TxPages, usable: Int, rowid: Long,
                       payload: Array[Byte]): Array[Byte] = {
    val maxInline = usable - 35
    val minInline = (usable - 12) * 32 / 255 - 23
    val cell = ArrayBuffer.empty[Byte]
    cell ++= SqliteWriter.varintBytes(payload.length.toLong)
    cell ++= SqliteWriter.varintBytes(rowid)
    if (payload.length <= maxInline) cell ++= payload
    else {
      val k0 = minInline + (payload.length - minInline) % (usable - 4)
      val inline = if (k0 <= maxInline) k0 else minInline
      cell ++= payload.take(inline)
      val chain = ArrayBuffer.empty[Int]
      var off = inline
      while (off < payload.length) {
        val pg = tx.alloc()
        chain += pg
        val take = math.min(usable - 4, payload.length - off)
        System.arraycopy(payload, off, tx(pg), 4, take)
        off += take
      }
      chain.zipWithIndex.foreach { case (pg, i) =>
        putU32(tx(pg), 0,
          if (i + 1 < chain.length) chain(i + 1).toLong else 0L)
      }
      val head = new Array[Byte](4)
      putU32(head, 0, chain.head.toLong)
      cell ++= head
    }
    cell.toArray
  }

  /** The current image: main-file pages with the committed -wal
    * overlay applied, plus the authoritative page count. */
  private def loadImage(path: String): (Array[Array[Byte]], Header,
      Option[SqliteWal.WalMap]) = {
    val mainBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))
    val header = parseHeader(mainBytes)
    val ps = header.pageSize
    val mainPages = mainBytes.length / ps
    val walPath = java.nio.file.Paths.get(path + "-wal")
    val wal =
      if (java.nio.file.Files.exists(walPath) &&
          java.nio.file.Files.size(walPath) > SqliteWal.HeaderSize) {
        val wb = java.nio.file.Files.readAllBytes(walPath)
        Some((SqliteWal.parse(wb, ps), wb))
      } else None
    val nPages = wal.map(_._1).filter(!_.isEmpty)
      .map(_.dbSizePages.toInt).getOrElse(mainPages)
    val pages = Array.tabulate(nPages) { i =>
      val p = new Array[Byte](ps)
      if (i < mainPages) System.arraycopy(mainBytes, i * ps, p, 0, ps)
      p
    }
    for ((wm, wb) <- wal; (pageNo, off) <- wm.frameOffsets
         if pageNo <= nPages)
      System.arraycopy(wb, off.toInt, pages(pageNo - 1), 0, ps)
    (pages, header, wal.map(_._1))
  }

  /** Append one committed INSERT transaction to `<path>-wal`.
    * `rows`: (rowid, values) with rowids strictly ascending and
    * strictly greater than the table's current max (values follow the
    * [[SqliteWriter.TableSpec]] convention: a rowid-alias column rides
    * as VNull). Flips the main header to WAL mode if needed. Returns
    * the number of frames appended. */
  def appendCommit(path: String, table: String,
                   rows: Seq[(Long, Seq[Value])]): Int = {
    require(rows.nonEmpty, "sqlite-wal-writer: empty transaction")
    enableWalMode(path)
    val (pages0, header, wal0) = loadImage(path)
    require(header.textEncoding <= 1,
      "sqlite-wal-writer: only UTF-8 databases")
    val usable = header.usable
    val tx = new TxPages(pages0, header.pageSize)
    val pr = new PageReader {
      def pageSize: Int = header.pageSize
      def page(n: Int): Array[Byte] = tx(n)
      def close(): Unit = ()
    }
    val tdef = tables(pr, header).find(_.name == table).getOrElse(
      sys.error(s"sqlite-wal-writer: no such table '$table'"))
    require(!tdef.withoutRowid,
      "sqlite-wal-writer: WITHOUT ROWID tables are out of scope")
    require(!indexes(pr, header).exists(_.table == table),
      s"sqlite-wal-writer: table '$table' has indexes — index B-trees " +
        "are not maintained by the append path")
    val curMax = maxRowid(pr, header, tdef.rootPage).getOrElse(Long.MinValue)
    require(rows.map(_._1) == rows.map(_._1).sorted &&
        rows.map(_._1).distinct.size == rows.size && rows.head._1 > curMax,
      s"sqlite-wal-writer: rowids must be strictly ascending and exceed " +
        s"the current max ($curMax) — this is a monotone APPEND sink")

    // rightmost spine, root first
    var spine = List.empty[Int]
    var pg = tdef.rootPage
    spine ::= pg
    while ((tx(pg)(hdrOff(pg)) & 0xff) == 0x05) {
      pg = u32(tx(pg), hdrOff(pg) + 8).toInt
      spine ::= pg
    }
    spine = spine.reverse // root .. leaf
    require((tx(spine.last)(hdrOff(spine.last)) & 0xff) == 0x0d,
      s"sqlite-wal-writer: unexpected page type at rightmost leaf of " +
        s"'$table'")

    val rootPage = tdef.rootPage
    require(hdrOff(rootPage) == 0,
      "sqlite-wal-writer: user table rooted at page 1")

    def interiorCell(child: Int, key: Long): Array[Byte] = {
      val k = SqliteWriter.varintBytes(key)
      val c = new Array[Byte](4 + k.length)
      putU32(c, 0, child.toLong)
      System.arraycopy(k, 0, c, 4, k.length)
      c
    }
    def setRightmost(node: Int, child: Int): Unit =
      putU32(tx.touch(node), hdrOff(node) + 8, child.toLong)

    // root-stays-put deepening (sqlite's balance_deeper): the root's
    // page number is pinned by sqlite_master, so its CONTENT moves to
    // a fresh page and the root re-initializes as an interior over it
    def balanceDeeper(root: Int): Int = {
      val child = tx.alloc()
      System.arraycopy(tx(root), 0, tx(child), 0, tx.pageSize)
      initPage(tx, root, 0x05, rightMost = child.toLong)
      child
    }

    // spineArr: the interior nodes on the rightmost path, root first
    // (empty when the root is a leaf)
    val spineArr = ArrayBuffer(spine.init: _*)
    var leaf = spine.last

    // Insert separator (childDone closed with max key `key`; the new
    // rightmost sibling is `newChild`) into the bottom spine node,
    // cascading upward: a full node N simply KEEPS childDone as its
    // implicit rightmost (its subtree max key = key) and a fresh empty
    // interior F takes over as the new rightmost child of the level
    // above with F.rightmost = newChild — every page stays referenced
    // exactly once and all leaves stay at one depth. A full ROOT
    // deepens in place (balance_deeper) and then always absorbs the
    // pending separator (it was just emptied).
    def pushUp(childDone0: Int, key: Long, newChild0: Int): Unit = {
      var level = spineArr.length - 1
      var childDone = childDone0
      var newChild = newChild0
      var done = false
      while (!done) {
        if (level < 0) {
          // the leaf IS the root (or the cascade consumed every
          // level): deepen at the root of the TABLE
          val moved =
            if (spineArr.isEmpty) { // root leaf
              val m = balanceDeeper(rootPage)
              spineArr += rootPage
              m
            } else sys.error("unreachable: level<0 with interior spine")
          require(appendCell(tx, rootPage, interiorCell(moved, key)),
            "sqlite-wal-writer: separator exceeds an empty root page")
          setRightmost(rootPage, newChild)
          done = true
        } else {
          val node = spineArr(level)
          val cell = interiorCell(childDone, key)
          if (appendCell(tx, node, cell)) {
            setRightmost(node, newChild)
            done = true
          } else if (level == 0) {
            // full root: deepen, then the (now empty) root absorbs
            // the separator for its moved-out content, with a fresh
            // interior over newChild as the new rightmost child
            val moved = balanceDeeper(node)
            val f = tx.alloc()
            initPage(tx, f, 0x05, rightMost = newChild.toLong)
            require(appendCell(tx, node, interiorCell(moved, key)),
              "sqlite-wal-writer: separator exceeds an emptied root")
            setRightmost(node, f)
            spineArr.insert(1, f)
            done = true
          } else {
            // full non-root node: it keeps childDone as its implicit
            // rightmost; a fresh sibling over newChild goes to the
            // level above with the SAME separator key
            val f = tx.alloc()
            initPage(tx, f, 0x05, rightMost = newChild.toLong)
            spineArr(level) = f
            childDone = node
            newChild = f
            level -= 1
          }
        }
      }
    }

    var lastKeyInLeaf = curMax
    for ((rowid, values) <- rows) {
      val payload = SqliteWriter.encodeRecord(values)
      val cell = leafCell(tx, usable, rowid, payload)
      if (!appendCell(tx, leaf, cell)) {
        val fresh = tx.alloc()
        initPage(tx, fresh, 0x0d)
        pushUp(leaf, lastKeyInLeaf, fresh)
        leaf = fresh
        require(appendCell(tx, leaf, cell),
          s"sqlite-wal-writer: row $rowid exceeds an empty leaf page")
      }
      lastKeyInLeaf = rowid
    }

    // sqlite keeps page 1's size + change counters CURRENT in WAL
    // mode: the btree layer trusts header nPage (offset 28) whenever
    // the change counter (24) matches version-valid-for (92), so a
    // commit that grows the file MUST ship an updated page 1 frame —
    // otherwise every grown page reads as past-EOF ("database disk
    // image is malformed"). Bump both counters together, like sqlite.
    val p1 = tx.touch(1)
    putU32(p1, 28, tx.pages.length.toLong)
    val ctr = (u32(p1, 24) + 1L) & 0xffffffffL
    putU32(p1, 24, ctr)
    putU32(p1, 92, ctr)

    writeFrames(path, tx, wal0)
  }

  /** Serialize the transaction's dirty pages as WAL frames, continuing
    * an existing valid chain (same salts, running checksum, torn tail
    * truncated) or starting a fresh -wal. The last frame carries the
    * post-commit page count. Returns the frame count appended. */
  private def writeFrames(path: String, tx: TxPages,
                          wal0: Option[SqliteWal.WalMap]): Int = {
    val walPath = java.nio.file.Paths.get(path + "-wal")
    val ps = tx.pageSize
    val frameSize = SqliteWal.FrameHeaderSize + ps
    var salt1 = 0x67726166L // deterministic defaults for a fresh WAL
    var salt2 = 0x74313200L
    var bigEndian = true // appended frames follow the header's magic
    var s0 = 0; var s1 = 0
    var appendAt = 0L
    val fresh = wal0.forall(_.framesSeen == 0) ||
      !java.nio.file.Files.exists(walPath)
    if (!fresh) {
      val existing = java.nio.file.Files.readAllBytes(walPath)
      val hdr = existing.slice(0, SqliteWal.HeaderSize)
      bigEndian = u32(hdr, 0) == 0x377f0683L
      require(bigEndian || u32(hdr, 0) == 0x377f0682L,
        "sqlite-wal-writer: existing -wal has a foreign magic")
      salt1 = u32(hdr, 16); salt2 = u32(hdr, 20)
      // replay the chain to the last VALID frame to recover the
      // running checksum (parse() validates but does not expose it)
      val (h0, h1) = SqliteWal.checksum(0, 0, hdr, 0, 24, bigEndian)
      require(u32(hdr, 24).toInt == h0 && u32(hdr, 28).toInt == h1,
        "sqlite-wal-writer: existing -wal header checksum mismatch")
      s0 = h0; s1 = h1
      var pos = SqliteWal.HeaderSize.toLong
      var valid = true
      while (valid && pos + frameSize <= existing.length) {
        val off = pos.toInt
        if (u32(existing, off + 8) != salt1 ||
            u32(existing, off + 12) != salt2) valid = false
        else {
          val (a0, a1) = SqliteWal.checksum(s0, s1, existing, off, 8,
            bigEndian)
          val (b0, b1) = SqliteWal.checksum(a0, a1, existing,
            off + SqliteWal.FrameHeaderSize, ps, bigEndian)
          if (u32(existing, off + 16).toInt != b0 ||
              u32(existing, off + 20).toInt != b1) valid = false
          else { s0 = b0; s1 = b1; pos += frameSize }
        }
      }
      appendAt = pos // truncate any torn tail
    }
    val dirtyPages = tx.dirty.toSeq
    val out = new java.io.ByteArrayOutputStream()
    if (fresh) {
      val hdr = new Array[Byte](SqliteWal.HeaderSize)
      putU32(hdr, 0, 0x377f0683L)
      putU32(hdr, 4, 3007000L)
      putU32(hdr, 8, ps.toLong)
      putU32(hdr, 12, 0L) // checkpoint sequence
      putU32(hdr, 16, salt1)
      putU32(hdr, 20, salt2)
      val (h0, h1) = SqliteWal.checksum(0, 0, hdr, 0, 24, true)
      putU32(hdr, 24, h0.toLong & 0xffffffffL)
      putU32(hdr, 28, h1.toLong & 0xffffffffL)
      out.write(hdr)
      s0 = h0; s1 = h1
      bigEndian = true
      appendAt = 0L
    }
    val commitSize = tx.pages.length.toLong
    for ((pageNo, i) <- dirtyPages.zipWithIndex) {
      val fh = new Array[Byte](SqliteWal.FrameHeaderSize)
      putU32(fh, 0, pageNo.toLong)
      putU32(fh, 4, if (i == dirtyPages.length - 1) commitSize else 0L)
      putU32(fh, 8, salt1)
      putU32(fh, 12, salt2)
      val (a0, a1) = SqliteWal.checksum(s0, s1, fh, 0, 8, bigEndian)
      val (b0, b1) = SqliteWal.checksum(a0, a1, tx(pageNo), 0, ps,
        bigEndian)
      putU32(fh, 16, b0.toLong & 0xffffffffL)
      putU32(fh, 20, b1.toLong & 0xffffffffL)
      s0 = b0; s1 = b1
      out.write(fh)
      out.write(tx(pageNo))
    }
    val bytes = out.toByteArray
    if (fresh) {
      java.nio.file.Files.write(walPath, bytes)
    } else {
      val raf = new java.io.RandomAccessFile(path + "-wal", "rw")
      try {
        raf.setLength(appendAt)
        raf.seek(appendAt)
        raf.write(bytes)
      } finally raf.close()
    }
    // a stale -shm from another writer would shadow the new frames for
    // sqlite3 readers; drop it so the next open recovers from the -wal
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(path + "-shm"))
    dirtyPages.length
  }
}
