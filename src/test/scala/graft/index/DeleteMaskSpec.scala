package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The distributed delete-mask sidecars: content equality vs the tombstone
  * rows, cumulative merge across generations, and a mask far too large to
  * reasonably broadcast — all without any driver-side collect of the ords
  * (the round-3 scale defect this module replaces). */
class DeleteMaskSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mask(dir: String): DeleteMask.SidecarMask =
    DeleteMask.SidecarMask(dir,
      new DeleteMask.SerializableConf(spark.sparkContext.hadoopConfiguration))

  test("sidecar roundtrip: per-shard sorted ords equal the tombstone rows") {
    val base = TestSpark.tempDir("graft-delmask")
    val tomb = s"$base/tombstones/d1"
    // shards 0..3 get skewed, shuffled ord sets; shard 2 stays empty
    val rows = Seq.tabulate(5000) { i =>
      val shard = i % 4
      (if (shard == 2) 0 else shard, (i * 2654435761L) % 100000L, s"doc$i", 7L)
    }.distinct
    rows.toDF("shard", "ord", "doc_id", "dl")
      .filter($"shard" =!= 2 || $"ord" < 0) // keep shard 2 truly empty
      .write.parquet(tomb)
    DeleteMask.write(spark, s"$base/delmask/d1", Seq(tomb), numShards = 4)
    val m = mask(s"$base/delmask/d1")
    val expected = spark.read.parquet(tomb)
      .select($"shard", $"ord").as[(Int, Long)].collect()
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).distinct.sorted }
    (0 until 4).foreach { s =>
      val got = m(s)
      val want = expected.getOrElse(s, Array.empty[Long])
      assert(java.util.Arrays.equals(got, want),
        s"shard $s: got ${got.length} ords, want ${want.length}")
      // sorted ascending — the binarySearch contract of every consumer
      assert(got.sameElements(got.sorted))
    }
    assert(m(2).isEmpty && m(99).isEmpty) // no file -> empty, out-of-range too
  }

  test("cumulative write merges every generation; sidecar survives a 2M-ord mask") {
    val base = TestSpark.tempDir("graft-delmask-big")
    // generation 1: 2M ords in shard 0 — a mask at the scale the old
    // driver-broadcast path existed to avoid; generation 2: a disjoint
    // tail in shards 0 and 1
    val nBig = 2000000L
    spark.range(nBig)
      .select(lit(0).as("shard"), ($"id" * 3L).as("ord"),
        concat(lit("d"), $"id").as("doc_id"), lit(5L).as("dl"))
      .write.parquet(s"$base/tombstones/d1")
    spark.range(1000)
      .select(pmod($"id", lit(2)).cast("int").as("shard"),
        ($"id" + nBig * 3L).as("ord"),
        concat(lit("e"), $"id").as("doc_id"), lit(5L).as("dl"))
      .write.parquet(s"$base/tombstones/d2")
    DeleteMask.write(spark, s"$base/delmask/d2",
      Seq(s"$base/tombstones/d1", s"$base/tombstones/d2"), numShards = 2)
    val m = mask(s"$base/delmask/d2")
    val s0 = m(0)
    assert(s0.length == nBig + 500)
    // spot-check membership via the binarySearch contract
    assert(java.util.Arrays.binarySearch(s0, 3L * 12345L) >= 0)
    assert(java.util.Arrays.binarySearch(s0, 3L * 12345L + 1L) < 0)
    assert(java.util.Arrays.binarySearch(s0, nBig * 3L) >= 0) // gen-2 row
    val s1 = m(1)
    assert(s1.length == 500 && s1.head == nBig * 3L + 1L)
    // the sidecar file itself stays compact (delta+varbyte, not 16 MB raw)
    val p = new org.apache.hadoop.fs.Path(s"$base/delmask/d2/shard-00000.del")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.getFileStatus(p).getLen < 4L * nBig)
  }
}
