package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.corpus.CorpusGen
import graft.table.SnapshotCatalog

/** Kill/resume: a build killed mid-way resumes from the last committed
  * snapshot and converges to exactly the index a never-killed build
  * produces (north rule: "a killed job resumes from the last committed
  * Iceberg snapshot checkpoint"). */
class ResumeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val cfgBase = BuildConfig(numShards = 6, commitEvery = 2, heavyThreshold = 200, saltBuckets = 4)

  test("numShards <= 0 auto-sizes from the corpus; re-entry adopts the staged count") {
    assert(IndexBuilder.autoShards(0L) == 16)
    assert(IndexBuilder.autoShards(1200L) == 16)
    assert(IndexBuilder.autoShards(1200000L) == 64)       // bench scale
    assert(IndexBuilder.autoShards(32768L * 4096) == 4096) // cap
    assert(IndexBuilder.autoShards(Long.MaxValue / 2) == 4096)
    val corpus = CorpusGen.corpus(spark, 200L, seed = 13L).cache()
    val dir = TestSpark.tempDir("graft-auto-shards")
    val snap = IndexBuilder.build(spark, corpus, dir,
      BuildConfig(numShards = 0, commitEvery = 8, heavyThreshold = 200))
    assert(snap.isComplete && snap.numShards == 16)
    // auto re-entry must adopt the staged layout, not re-derive and clash
    val again = IndexBuilder.build(spark, corpus, dir,
      BuildConfig(numShards = 0, commitEvery = 8, heavyThreshold = 200))
    assert(again.numShards == 16 && again.id == snap.id)
  }

  test("killed build resumes from CURRENT and matches an unkilled build") {
    val corpus = CorpusGen.corpus(spark, 600L, seed = 7L).cache()
    val dirA = TestSpark.tempDir("graft-resume-a") // killed + resumed
    val dirB = TestSpark.tempDir("graft-resume-b") // straight through

    val killed = intercept[RuntimeException] {
      IndexBuilder.build(spark, corpus, dirA, cfgBase.copy(failAfterGroups = 1))
    }
    assert(killed.getMessage.contains("simulated kill"))
    val partial = SnapshotCatalog.load(spark, dirA).get
    assert(partial.completedShards.size == 2) // one committed group survived
    assert(!partial.isComplete)

    // resume (same args) — must skip the committed group and finish
    val snapA = IndexBuilder.build(spark, corpus, dirA, cfgBase)
    assert(snapA.isComplete)
    assert(snapA.completedShards.sorted == (0 until 6))

    val snapB = IndexBuilder.build(spark, corpus, dirB, cfgBase)

    // identical segment content term-for-term, block-for-block
    def canon(dirs: Seq[String]) = spark.read.parquet(dirs: _*)
      .select($"shard", $"term", $"count", $"cf",
        to_json(col("blocks")).as("blocks_json"))
      .orderBy("shard", "term")
      .collect().map(_.toSeq).toSeq
    assert(canon(snapA.segmentDirs) == canon(snapB.segmentDirs))

    // identical docmaps and termstats
    def canonDm(dirs: Seq[String]) = spark.read.parquet(dirs: _*)
      .orderBy("shard", "ord").collect().map(_.toSeq).toSeq
    assert(canonDm(snapA.docmapDirs) == canonDm(snapB.docmapDirs))
    def canonTs(d: String) = spark.read.parquet(d).orderBy("term").collect().map(_.toSeq).toSeq
    assert(canonTs(snapA.termstatsDir) == canonTs(snapB.termstatsDir))

    // lineage covers every shard exactly once across snapshots
    val lin = spark.read.parquet(snapA.lineageDirs: _*).filter($"shard" >= 0)
    assert(lin.groupBy("shard").count().filter($"count" =!= 1).count() == 0)
    assert(lin.select("shard").as[Int].collect().sorted.toSeq == (0 until 6))
  }

  test("snapshot ids are monotone and CURRENT points at the last") {
    val corpus = CorpusGen.corpus(spark, 200L, seed = 9L)
    val dir = TestSpark.tempDir("graft-snap")
    val snap = IndexBuilder.build(spark, corpus, dir,
      BuildConfig(numShards = 4, commitEvery = 2))
    assert(snap.isComplete)
    val cur = SnapshotCatalog.load(spark, dir).get
    assert(cur.id == snap.id)
    // chain walks back to staging snapshot 0
    var s = cur
    while (s.parentId >= 0) s = SnapshotCatalog.loadId(spark, dir, s.parentId)
    assert(s.id == 0 && s.stagingDone)
  }

  test("a missing CURRENT pointer recovers from the highest committed manifest") {
    val corpus = CorpusGen.corpus(spark, 300L, seed = 11L).cache()
    val dir = TestSpark.tempDir("graft-nocur")
    intercept[RuntimeException] {
      IndexBuilder.build(spark, corpus, dir, cfgBase.copy(failAfterGroups = 1))
    }
    val before = SnapshotCatalog.load(spark, dir).get
    // simulate a crash inside a non-atomic pointer flip: CURRENT is gone
    // but the immutable manifests survive
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(SnapshotCatalog.currentPath(dir)), false)
    val recovered = SnapshotCatalog.load(spark, dir).get
    assert(recovered.id == before.id)
    assert(recovered.completedShards == before.completedShards)
    // and the resumed build still skips the committed group and finishes
    val snap = IndexBuilder.build(spark, corpus, dir, cfgBase)
    assert(snap.isComplete)
    assert(snap.completedShards.sorted == (0 until 6))
  }

  test("dead-letter rows are counted, not silently dropped") {
    import spark.implicits._
    val good = CorpusGen.corpus(spark, 50L, seed = 3L)
    val bad = Seq(
      graft.corpus.SourceFile(null, "p", "c", "scala", "content here"),
      graft.corpus.SourceFile("r", "p", "c", "scala", ""),
      graft.corpus.SourceFile("r", "p2", "c", "scala", null)).toDS()
    val dir = TestSpark.tempDir("graft-dead")
    IndexBuilder.build(spark, good.union(bad), dir, BuildConfig(numShards = 2, commitEvery = 2))
    val lin0 = spark.read.parquet(s"$dir/lineage/g0").filter($"shard" === -1).head()
    assert(lin0.getAs[Long]("skipped_rows") == 3L)
  }
}
