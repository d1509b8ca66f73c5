package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{HilbertIndex2, TopKByScore}
import graft.ops.Multimodal

/** Property-based checks (scalacheck) for the pure driver-side kernels —
  * the distributed specs pin behavior on fixed cases; these sweep the
  * input space. */
object GraftProps extends Properties("graft") {

  property("hilbert xy2d is a bijection onto [0, 4^bits)") =
    forAll(Gen.choose(1, 7)) { bits =>
      val n = 1 << bits
      val all = for (x <- 0 until n; y <- 0 until n)
        yield HilbertIndex2.xy2d(x, y, bits)
      all.toSet.size == n * n &&
        all.forall(d => d >= 0 && d < n.toLong * n)
    }

  property("hilbert truncates high bits (index depends only on low bits)") =
    forAll(Gen.choose(1, 7), Gen.choose(0L, 1L << 40),
      Gen.choose(0L, 1L << 40)) { (bits, x, y) =>
      val mask = (1L << bits) - 1
      HilbertIndex2.xy2d(x, y, bits) ==
        HilbertIndex2.xy2d(x & mask, y & mask, bits)
    }

  private val scoredRows: Gen[List[(Double, Long)]] =
    Gen.listOf(Gen.zip(
      Gen.chooseNum(-1e6, 1e6).map(v => math.rint(v) / 4.0),
      Gen.chooseNum(0L, 50L)))

  property("TopKByScore equals brute-force top-k for any partitioning") =
    forAll(scoredRows, Gen.choose(1, 6), Gen.choose(0, 10)) { (rows, k, cut) =>
      val agg = new TopKByScore(k)
      val expected = rows.sortBy { case (s, id) => (-s, id) }.take(k)
        .map(_._2).mkString(",")
      // single pass
      val direct = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
      // arbitrary two-partition split, merged either way
      val (p1, p2) = rows.splitAt(math.min(cut, rows.length))
      val b1 = p1.foldLeft(agg.zero)(agg.reduce)
      val b2 = p2.foldLeft(agg.zero)(agg.reduce)
      direct == expected &&
        agg.finish(agg.merge(b1, b2)) == expected &&
        agg.finish(agg.merge(b2, b1)) == expected
    }

  property("wav encode/decode round-trips format and exact square-wave " +
    "RMS for even frame counts") =
    forAll(Gen.choose(1, 500), Gen.oneOf(8000, 16000, 22050, 44100),
      Gen.choose(1, 32767)) { (halfFrames, rate, amp) =>
      val frames = halfFrames * 2 // even → RMS == amp exactly
      Multimodal.decodeWav(
        Multimodal.encodeWav(frames, rate, amp.toShort)) match {
        case Some((r, ch, fr, rms)) =>
          r == rate && ch == 1 && fr == frames.toLong && rms == amp.toDouble
        case None => false
      }
    }

  property("bmp encode/decode round-trips dimensions for any size") =
    forAll(Gen.choose(1, 80), Gen.choose(1, 60),
      Gen.choose(Long.MinValue, Long.MaxValue)) { (w, h, seed) =>
      Multimodal.decodeImage(Multimodal.encodeBmp(w, h, seed)) match {
        case Some((dw, dh, _)) => dw == w && dh == h
        case None => false
      }
    }

  // ---- SQLite codec round trips (writer must invert reader) -----------

  private val genValue: Gen[graft.sources.SqliteFile.Value] = {
    import graft.sources.SqliteFile._
    Gen.oneOf(
      Gen.const(VNull),
      Gen.choose(Long.MinValue, Long.MaxValue).map(VInt),
      // avoid NaN: SQLite stores NaN as NULL and == fails on it anyway
      Gen.choose(-1e300, 1e300).map(VReal),
      Gen.asciiPrintableStr.map(VText(_)),
      // multi-byte UTF-8 incl. a surrogate-pair emoji (as a String)
      Gen.listOf(Gen.oneOf("é", "ü", "語", "😀", "a"))
        .map(parts => VText(parts.mkString)),
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(bs => VBlob(bs.toArray)))
  }

  property("sqlite varint encode/decode round-trips all 64-bit values") =
    forAll(Gen.oneOf(Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.choose(0L, 300L), Gen.oneOf(0L, 127L, 128L, 16383L, 16384L,
        (1L << 56) - 1, 1L << 56, -1L, Long.MinValue, Long.MaxValue))) { v =>
      import graft.sources.SqliteFile.varint
      val b = graft.sources.SqliteWriter.varintBytes(v)
      b.length >= 1 && b.length <= 9 && varint(b, 0) == ((v, b.length))
    }

  property("sqlite record encode/decode round-trips every value class") =
    forAll(Gen.listOfN(6, genValue)) { vals =>
      import graft.sources.SqliteFile._
      val back = decodeRecord(
        graft.sources.SqliteWriter.encodeRecord(vals), _ => true).toList
      back.length == vals.length && back.zip(vals).forall {
        case (VBlob(a), VBlob(b)) => a.sameElements(b)
        case (a, b) => a == b
      }
    }
}
