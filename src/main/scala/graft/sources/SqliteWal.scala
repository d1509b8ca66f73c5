package graft.sources

/** Parser for the SQLite WRITE-AHEAD LOG sidecar (`<db>-wal`) — the
  * missing half of reading a LIVE warehouse: in WAL mode (the default
  * for any long-running writer, and what a connection like the
  * reference's `script.py:123-126` long-lived `sqlite3.Connection`
  * typically runs under) committed transactions live as page images in
  * the -wal until a checkpoint copies them back into the main file.
  * Reading only the main file of such a database silently returns
  * stale data; this parser builds the page→newest-committed-frame map
  * so [[SqliteDataSourceV2]] can overlay WAL pages on the main-file
  * [[SqliteFile.PageReader]].
  *
  * Format (public, sqlite.org/fileformat2 §WAL): a 32-byte header
  * (magic, format version, page size, checkpoint sequence, two salts,
  * header checksum) followed by frames of 24-byte frame header + one
  * raw page image. A frame is VALID iff its salts match the header's
  * and its cumulative checksum — seeded by the header checksum and
  * threaded through every prior frame's first 8 header bytes and page
  * content — matches; this is how sqlite itself distinguishes live
  * frames from leftover garbage after a crash, and this parser applies
  * the same rule (a torn tail is IGNORED, exactly like sqlite's
  * recovery, never an error). Only frames at or before the last valid
  * COMMIT frame (non-zero dbSize field) belong to a committed
  * transaction; for each page the NEWEST such frame wins.
  *
  * Scale: the map is built from one sequential read of the -wal
  * (unavoidable — the checksum chain covers every page image). A -wal
  * is bounded by checkpoint cadence (default ~4 MB), not by database
  * size, so per-executor re-parsing costs MBs, not the GBs of the main
  * file; the page overlays themselves are positioned reads.
  */
object SqliteWal {

  /** The committed view of a -wal: byte offset of the newest committed
    * page image per page number, and the database size in pages as of
    * the last commit (authoritative over the main-file header — the
    * database may have GROWN inside the WAL). `salt1`/`salt2` identify
    * the WAL GENERATION (a checkpoint RESTART/TRUNCATE re-salts): the
    * snapshot pin carries them so an executor that opens the sidecar
    * after a mid-query checkpoint fails loudly instead of silently
    * serving frames from a different generation. */
  case class WalMap(frameOffsets: Map[Int, Long], dbSizePages: Long,
                    framesSeen: Int, framesCommitted: Int,
                    salt1: Long = 0L, salt2: Long = 0L,
                    commitFrames: Seq[Int] = Nil) {
    def isEmpty: Boolean = frameOffsets.isEmpty
  }

  val HeaderSize = 32
  val FrameHeaderSize = 24

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** The WAL checksum: a Fletcher-like rolling pair over 32-bit words,
    * byte order chosen by the magic (0x377f0682 = little-endian words,
    * 0x377f0683 = big-endian). `len` must be a multiple of 8. Values
    * carried as Int (mod 2^32 wrap is the spec's arithmetic). */
  def checksum(s0: Int, s1: Int, b: Array[Byte], off: Int, len: Int,
               bigEndianWords: Boolean): (Int, Int) = {
    require(len % 8 == 0, s"wal checksum over $len bytes (not 8-aligned)")
    var a = s0; var c = s1
    var i = off
    val end = off + len
    while (i < end) {
      val x0 =
        if (bigEndianWords) (b(i) & 0xff) << 24 | (b(i + 1) & 0xff) << 16 |
          (b(i + 2) & 0xff) << 8 | (b(i + 3) & 0xff)
        else (b(i + 3) & 0xff) << 24 | (b(i + 2) & 0xff) << 16 |
          (b(i + 1) & 0xff) << 8 | (b(i) & 0xff)
      val x1 =
        if (bigEndianWords) (b(i + 4) & 0xff) << 24 | (b(i + 5) & 0xff) << 16 |
          (b(i + 6) & 0xff) << 8 | (b(i + 7) & 0xff)
        else (b(i + 7) & 0xff) << 24 | (b(i + 6) & 0xff) << 16 |
          (b(i + 5) & 0xff) << 8 | (b(i + 4) & 0xff)
      a = a + x0 + c
      c = c + x1 + a
      i += 8
    }
    (a, c)
  }

  /** Build the committed-page map from a positioned reader over the
    * -wal bytes. `read(pos, buf)` must fill `buf` from offset `pos`;
    * `walLen` is the sidecar's byte length. `expectPageSize` is the
    * main file's page size — a mismatched WAL (stale sidecar from a
    * different database) is rejected loudly, because silently ignoring
    * it and a torn tail are different things.
    *
    * `maxFrames` (>0) stops after that many valid frames — the
    * SNAPSHOT-PINNING hook: a live writer may append frames while a
    * distributed scan runs, but the already-written prefix of a -wal
    * is immutable until a checkpoint rewinds it (which changes the
    * salts and is detected, not silently misread), so every partition
    * parsing the same frame-count prefix sees the same committed
    * view. */
  def parse(read: (Long, Array[Byte]) => Unit, walLen: Long,
            expectPageSize: Int, maxFrames: Int): WalMap = {
    if (walLen < HeaderSize) return WalMap(Map.empty, 0L, 0, 0)
    val hdr = new Array[Byte](HeaderSize)
    read(0L, hdr)
    val magic = u32(hdr, 0)
    require(magic == 0x377f0682L || magic == 0x377f0683L,
      f"sqlite-wal: bad magic 0x$magic%08x — not a WAL file")
    val bigEndianWords = magic == 0x377f0683L
    require(u32(hdr, 4) == 3007000L,
      s"sqlite-wal: unsupported WAL format version ${u32(hdr, 4)}")
    val pageSize = u32(hdr, 8).toInt
    require(pageSize == expectPageSize,
      s"sqlite-wal: WAL page size $pageSize does not match the main " +
        s"file's $expectPageSize — stale or foreign sidecar")
    val salt1 = u32(hdr, 16); val salt2 = u32(hdr, 20)
    // the running checksum seeds from the header's own first 24 bytes;
    // the header checksum (bytes 24-31) must match it, else the whole
    // WAL is unreadable (sqlite treats this as an empty WAL)
    val (h0, h1) = checksum(0, 0, hdr, 0, 24, bigEndianWords)
    if (u32(hdr, 24).toInt != h0 || u32(hdr, 28).toInt != h1)
      return WalMap(Map.empty, 0L, 0, 0)

    val frameSize = FrameHeaderSize + pageSize
    val latest = scala.collection.mutable.Map.empty[Int, Long]
    // frames of the CURRENT (not yet committed) transaction — promoted
    // into `latest` only when a commit frame closes the transaction
    val pending = scala.collection.mutable.Map.empty[Int, Long]
    // frame index of each COMMIT frame, in order — the transaction
    // boundaries a CDC cursor may pin ([[SqliteCdc]])
    val commits = scala.collection.mutable.ArrayBuffer.empty[Int]
    var dbSize = 0L
    var nCommitted = 0
    var s0 = h0; var s1 = h1
    var pos = HeaderSize.toLong
    var n = 0
    var valid = true
    val buf = new Array[Byte](frameSize)
    while (valid && pos + frameSize <= walLen &&
        (maxFrames < 0 || n < maxFrames)) {
      read(pos, buf)
      val pageNo = u32(buf, 0).toInt
      val commitSize = u32(buf, 4)
      if (u32(buf, 8) != salt1 || u32(buf, 12) != salt2) valid = false
      else {
        val (a0, a1) = checksum(s0, s1, buf, 0, 8, bigEndianWords)
        val (b0, b1) = checksum(a0, a1, buf, FrameHeaderSize, pageSize,
          bigEndianWords)
        if (u32(buf, 16).toInt != b0 || u32(buf, 20).toInt != b1)
          valid = false
        else {
          s0 = b0; s1 = b1
          n += 1
          pending(pageNo) = pos + FrameHeaderSize
          if (commitSize > 0L) { // commit frame: transaction is durable
            latest ++= pending
            pending.clear()
            dbSize = commitSize
            nCommitted = n
            commits += n
          }
          pos += frameSize
        }
      }
    }
    // frames past the last commit (still in `pending`) or past the
    // first invalid frame are an uncommitted/torn tail — dropped,
    // exactly like sqlite recovery
    WalMap(latest.toMap, dbSize, n, nCommitted, salt1, salt2,
      commits.toSeq)
  }

  /** Array-backed convenience for tests. */
  def parse(walBytes: Array[Byte], expectPageSize: Int,
            maxFrames: Int = -1): WalMap =
    parse((pos, buf) => System.arraycopy(walBytes, pos.toInt, buf, 0,
      buf.length), walBytes.length.toLong, expectPageSize, maxFrames)
}
