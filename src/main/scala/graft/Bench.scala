package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness (driver-run, one JSON line to stdout).
  *
  * Three phases:
  *  1. the SparkEntry query battery on SPARK_GRAFT_SF_DIR at the high
  *     parallelism level (per-query wall seconds)
  *  2. the inverted-index engine: seeded corpus build (docs/sec) + WAND
  *     replay of the reference query set (queries/sec), at high parallelism
  *  3. the same engine job at low (= high/4) parallelism on the SAME input
  *     → throughput scaling efficiency between the two levels, the
  *     sandbox stand-in for N vs 4N executors (BASELINE.md target ≥ 0.8)
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

  /** Build + query the engine once at the given parallelism; returns
    * (buildSec, querySecWarm). */
  private def engineRun(cores: Int, nDocs: Long, nQueries: Int, dir: String): (Double, Double) = {
    val spark = session(cores)
    try {
      val corpus = graft.corpus.CorpusGen.corpus(spark, nDocs, 42L)
      val t0 = System.nanoTime()
      val snap = graft.index.IndexBuilder.build(spark, corpus, dir,
        graft.index.BuildConfig(numShards = 32, commitEvery = 32,
          heavyThreshold = math.max(1000, nDocs / 32), saltBuckets = 8))
      val buildSec = secs(t0)
      val qs = graft.corpus.CorpusGen.queries(nQueries, 42L)
      // cold pass loads/caches nothing explicitly but warms code paths
      graft.search.Wand.searchSnapshot(spark, snap, qs, 10).count()
      val t1 = System.nanoTime()
      val n = graft.search.Wand.searchSnapshot(spark, snap, qs, 10).count()
      val querySec = secs(t1)
      require(n > 0, "engine returned no results")
      (buildSec, querySec)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val hi = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val lo = math.max(1, hi / 4)
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "100000").toLong
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUERIES", "256").toInt
    val tmp = "/root/repo/target/tmp"

    // phase 1: query battery
    val spark1 = session(hi)
    val queryTimes: Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark1, sfDir).count(); true }
                 catch { case _: Throwable => false }
        name -> (if (ok) secs(t0) else -1.0)
      }
    spark1.stop()

    // phases 2+3: engine at hi and lo parallelism, fresh dirs, same input
    def fresh(tag: String): String = {
      val d = s"$tmp/bench-idx-$tag"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
      d
    }
    val (buildHi, queryHi) = engineRun(hi, nDocs, nQueries, fresh(s"hi$hi"))
    val (buildLo, queryLo) = engineRun(lo, nDocs, nQueries, fresh(s"lo$lo"))

    val buildThrHi = nDocs / buildHi
    val buildThrLo = nDocs / buildLo
    val qpsHi = nQueries / queryHi
    val qpsLo = nQueries / queryLo
    val factor = hi.toDouble / lo
    val buildEff = (buildThrHi / buildThrLo) / factor
    val queryEff = (qpsHi / qpsLo) / factor

    val total = queryTimes.filter(_._2 >= 0).map(_._2).sum + buildHi + queryHi
    val qjson = queryTimes.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(
      f"""{"metric":"graft_bench","value":$total%.2f,"unit":"sec","sf":"$sfDir","queries":$qjson,""" +
      f""""engine":{"docs":$nDocs,"query_set":$nQueries,""" +
      f""""cores_hi":$hi,"cores_lo":$lo,""" +
      f""""build_sec_hi":$buildHi%.1f,"build_docs_per_sec_hi":$buildThrHi%.0f,""" +
      f""""build_sec_lo":$buildLo%.1f,"build_docs_per_sec_lo":$buildThrLo%.0f,""" +
      f""""build_scaling_efficiency":$buildEff%.3f,""" +
      f""""query_sec_hi":$queryHi%.2f,"qps_hi":$qpsHi%.1f,""" +
      f""""query_sec_lo":$queryLo%.2f,"qps_lo":$qpsLo%.1f,""" +
      f""""query_scaling_efficiency":$queryEff%.3f}}""")
  }
}
