package graft.index

import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite {

  test("varbyte round-trip (seeded property, 200 cases)") {
    val rnd = new java.util.SplittableRandom(42)
    for (_ <- 0 until 200) {
      val n = rnd.nextInt(300)
      val arr = Array.fill(n)(rnd.nextLong(Long.MaxValue / 2))
      assert(Codec.readVarLongs(Codec.encodeVarLongs(arr), n).toSeq == arr.toSeq)
    }
  }

  test("delta round-trip for strictly increasing sequences (seeded property)") {
    val rnd = new java.util.SplittableRandom(43)
    for (_ <- 0 until 200) {
      val n = 1 + rnd.nextInt(500)
      val gaps = Array.fill(n)(1L + rnd.nextLong(1000000L))
      val xs = gaps.scanLeft(0L)(_ + _).tail // strictly increasing
      val enc = Codec.encodeDeltas(xs, xs.head)
      assert(Codec.decodeDeltas(enc, n, xs.head).toSeq == xs.toSeq)
    }
  }

  test("positional blocks round-trip per-posting position lists exactly") {
    val rnd = new java.util.SplittableRandom(11)
    for (_ <- 0 until 50) {
      val n = 1 + rnd.nextInt(400) // spans multiple blocks
      val ords = Array.iterate(0L, n)(_ + 1 + rnd.nextInt(9))
      val dls = Array.fill(n)(10L + rnd.nextInt(200))
      val positions: Array[Array[Long]] = Array.fill(n) {
        val m = 1 + rnd.nextInt(6)
        val gaps = Array.fill(m)(rnd.nextLong(40L) + 1L)
        gaps.scanLeft(rnd.nextLong(5L))(_ + _).tail // ascending, first >= 1
      }
      val tfs = positions.map(_.length.toLong) // tf IS the position count
      val poss = positions.map(Codec.encodePositions)
      val blocks = Codec.buildBlocks(ords, tfs, dls, 100.0, poss)
      var off = 0
      blocks.foreach { b =>
        val decTfs = Codec.decodeBlockTfs(b)
        val dec = Codec.decodeBlockPositions(b, decTfs)
        (0 until b.n).foreach { i =>
          assert(dec(i).toSeq == positions(off + i).toSeq)
        }
        off += b.n
      }
      assert(off == n)
    }
    // positionless blocks refuse position decode instead of mis-parsing
    val plain = Codec.buildBlocks(Array(1L, 2L), Array(1L, 1L), Array(5L, 5L), 10.0)
    intercept[IllegalArgumentException] {
      Codec.decodeBlockPositions(plain.head, Array(1L, 1L))
    }
  }

  test("buildBlocks: sizes, boundaries, round-trip, exact block maxima") {
    val n = 1000
    val rnd = new java.util.SplittableRandom(7)
    val ords = Array.iterate(1L, n)(_ + 1 + rnd.nextInt(50))
    val tfs = Array.fill(n)(1L + rnd.nextInt(20))
    val dls = Array.fill(n)(10L + rnd.nextInt(500))
    val avgdl = 120.0
    val blocks = Codec.buildBlocks(ords, tfs, dls, avgdl)
    assert(blocks.map(_.n).sum == n)
    assert(blocks.forall(_.n <= Codec.BlockSize))
    val gotOrds = blocks.flatMap(Codec.decodeBlockDocs)
    val gotTfs = blocks.flatMap(Codec.decodeBlockTfs)
    val gotDls = blocks.flatMap(Codec.decodeBlockDls)
    assert(gotOrds.toSeq == ords.toSeq)
    assert(gotTfs.toSeq == tfs.toSeq)
    assert(gotDls.toSeq == dls.toSeq)
    // block-max metadata is the exact max of the per-posting norms
    var off = 0
    blocks.foreach { b =>
      val norms = (off until off + b.n).map(i => graft.search.Bm25.tfNorm(tfs(i), dls(i), avgdl))
      assert(b.maxNorm == norms.max)
      assert(b.first == ords(off) && b.last == ords(off + b.n - 1))
      assert(b.minDl == (off until off + b.n).map(dls).min)
      // the (maxTf, minDl) impact bound dominates every in-block norm at
      // ANY avgdl — the safety property the stale-stats pruning fallback
      // (incremental appends) rests on
      Seq(40.0, avgdl, 900.0).foreach { a2 =>
        val bound = graft.search.Bm25.tfNorm(b.maxTf.toLong, b.minDl, a2)
        assert((off until off + b.n)
          .forall(i => graft.search.Bm25.tfNorm(tfs(i), dls(i), a2) <= bound))
      }
      off += b.n
    }
  }

  test("compression actually compresses monotone ords vs 8-byte fixed") {
    val ords = Array.iterate(100L, 10000)(_ + 3)
    val enc = Codec.encodeDeltas(ords, ords.head)
    assert(enc.length < ords.length * 2) // gaps of 3 → 1 byte each
  }
}
