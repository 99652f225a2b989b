package graft.compare

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness summary (reference DiffReport: reports.py:74-97). */
case class CorrectnessStats(total: Long, identical: Long, statusMatch: Long) {
  def identicalRate: Double = if (total == 0) 0.0 else identical.toDouble / total
  def statusMatchRate: Double = if (total == 0) 0.0 else statusMatch.toDouble / total
}

/** Latency percentile row per cluster (reference PerformanceReport:
  * reports.py:146-188). */
case class LatencyStats(cluster: String, count: Long, p50: Double, p90: Double,
                        p99: Double, avg: Double)

/** Report computations over a comparison DataFrame — the reference's
  * report suite re-expressed as terminal DataFrame aggregations (the
  * reference recomputes these per tick over an in-memory list,
  * report_generator.py:38-43; here they are single hash-aggregations
  * with partial/map-side combine, so they hold at any scale).
  */
object Reports {

  /** A1-A3: count, identical-match rate, status-code match rate. */
  def correctness(comparisons: DataFrame): CorrectnessStats = {
    val row = comparisons.agg(
      count(lit(1)),
      coalesce(sum(when(col("identical"), 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("primary.status") === col("shadow.status"), 1L)
        .otherwise(0L)), lit(0L))).head()
    CorrectnessStats(row.getLong(0), row.getLong(1), row.getLong(2))
  }

  /** A4: exact p50/p90/p99 + mean latency per cluster, latency>0 filter
    * kept from the reference (reports.py:150,159). The two embedded
    * response columns are unpivoted with `stack` so both clusters
    * aggregate in ONE pass. At very large scale swap `percentile` for
    * `percentile_approx` — the call site below is the only change. */
  def performance(comparisons: DataFrame): Seq[LatencyStats] = {
    val unpivoted = comparisons.select(expr(
      "stack(2, 'primary', primary.latencyMs, 'shadow', shadow.latencyMs) as (cluster, latency)"))
      .filter(col("latency").isNotNull && col("latency") > 0)
    unpivoted.groupBy("cluster").agg(
        count(lit(1)).as("count"),
        expr("percentile(latency, array(0.5, 0.9, 0.99))").as("pcts"),
        avg(col("latency")).as("avg"))
      .orderBy("cluster")
      .collect().toSeq.map { r =>
        val p = r.getSeq[Double](2)
        LatencyStats(r.getString(0), r.getLong(1), p(0), p(1), p(2), r.getDouble(3))
      }
  }

  /** K2: console summary block (shaped like the reference's output,
    * README.md:74-93). */
  def formatSummary(c: CorrectnessStats, perf: Seq[LatencyStats]): String = {
    val sb = new StringBuilder
    sb.append(f"${c.total}%d comparisons, ${c.identical}%d identical " +
      f"(${c.identicalRate * 100}%.2f%%), status-code match ${c.statusMatchRate * 100}%.2f%%\n")
    perf.foreach { p =>
      sb.append(f"  ${p.cluster}%-8s n=${p.count}%-8d p99=${p.p99}%.1f  " +
        f"p90=${p.p90}%.1f  p50=${p.p50}%.1f  avg=${p.avg}%.1f ms\n")
    }
    sb.toString
  }

  /** K3: per-mismatch diff report text — summary plus one block per
    * non-identical comparison (driver-side render of a LIMITED collect;
    * the reference renders every mismatch, reports.py:99-138). */
  def diffReportText(comparisons: DataFrame, maxMismatches: Int = 100): String = {
    val c = correctness(comparisons)
    val sb = new StringBuilder(formatSummary(c, Nil))
    val mismatches = comparisons.filter(!col("identical"))
      .select(col("request.uri"), col("request.method"),
        to_json(col("status_diff")).as("sd"),
        to_json(col("headers_diff")).as("hd"),
        to_json(col("body_diff")).as("bd"))
      .limit(maxMismatches).collect()
    mismatches.foreach { r =>
      sb.append(s"\n=== ${r.getString(1)} ${r.getString(0)} ===\n")
      sb.append(s"  status:  ${r.getString(2)}\n")
      sb.append(s"  headers: ${r.getString(3)}\n")
      sb.append(s"  body:    ${r.getString(4)}\n")
    }
    sb.toString
  }

  /** K4: performance CSV export (reference: reports.py:190-205). */
  def exportPerformanceCsv(comparisons: DataFrame, path: String): Unit =
    comparisons.select(
      col("request.uri").as("request_uri"),
      col("request.method").as("request_method"),
      col("primary.status").as("primary_status"),
      col("primary.latencyMs").as("primary_latency"),
      col("shadow.status").as("shadow_status"),
      col("shadow.latencyMs").as("shadow_latency"),
      col("identical"))
      .write.mode("overwrite").option("header", "true").csv(path)

  /** K5/ST4: materialize the flattened comparison table into a
    * sequentially versioned subdirectory (`comparisons_NNN`) — the
    * reference's auto-versioned SQLite tables (sqlite.py:145-159) with
    * batch/snapshot durability instead of per-row commits. Returns the
    * version written. */
  def dumpVersioned(comparisons: DataFrame, dir: String): Int = {
    val spark = comparisons.sparkSession
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(dir)
    val existing = if (fs.exists(base))
      fs.listStatus(base).map(_.getPath.getName)
        .filter(_.startsWith("comparisons_")).map(_.stripPrefix("comparisons_").toInt)
    else Array.empty[Int]
    val next = if (existing.isEmpty) 0 else existing.max + 1 // O1: latest = max
    flatten(comparisons).write.parquet(f"$dir/comparisons_$next%03d")
    next
  }

  /** The reference's 18-column flattened schema (sqlite.py:14-40), with
    * headers/bodies stringified (T11) and `took` extracted (T12). */
  def flatten(comparisons: DataFrame): DataFrame =
    comparisons.select(
      col("request.uri").as("request_uri"),
      col("request.method").as("request_method"),
      col("request.timestamp").cast("timestamp").as("request_timestamp"),
      coalesce(to_json(col("request.headers")), lit("")).as("request_headers"),
      coalesce(col("request.body"), lit("")).as("request_body"),
      col("primary.timestamp").cast("timestamp").as("source_response_timestamp"),
      col("primary.status").as("source_response_status"),
      coalesce(to_json(col("primary.headers")), lit("")).as("source_response_headers"),
      coalesce(col("primary.body"), lit("")).as("source_response_body"),
      col("primary.latencyMs").as("source_response_latency"),
      get_json_object(col("primary.body"), "$.took").cast("int").as("source_took"),
      col("shadow.timestamp").cast("timestamp").as("target_response_timestamp"),
      col("shadow.status").as("target_response_status"),
      coalesce(to_json(col("shadow.headers")), lit("")).as("target_response_headers"),
      coalesce(col("shadow.body"), lit("")).as("target_response_body"),
      col("shadow.latencyMs").as("target_response_latency"),
      get_json_object(col("shadow.body"), "$.took").cast("int").as("target_took"),
      col("identical").cast("int").as("responses_are_identical"),
      to_json(col("headers_diff")).as("headers_diff"),
      to_json(col("body_diff")).as("bodies_diff"))
}
