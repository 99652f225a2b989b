package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines, each shaped for
  * scale: exact dedup is one hash-shuffle; MinHash-LSH and SimHash turn
  * the quadratic near-dup problem into equi-joins on bucket keys (the only
  * scalable shape — candidate generation never cross-joins); n-gram
  * Jaccard verifies candidates through an inverted-index join.
  */
object Dedup extends Serializable {

  // ---- exact ----

  /** Keep one representative per exact-content group (first by `idCol`
    * order — deterministic). One shuffle on the content hash. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(sha2(col(textCol), 256)).orderBy(col(idCol))
    df.withColumn("dup_rank", row_number().over(w))
      .filter(col("dup_rank") === 1).drop("dup_rank")
  }

  /** Histogram of exact-duplicate group sizes: (group_size, n_groups). */
  def exactDupStats(df: DataFrame, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("h")).agg(count(lit(1)).as("group_size"))
      .groupBy("group_size").agg(count(lit(1)).as("n_groups"))

  // ---- MinHash + LSH ----

  /** Word shingles of size n (positional n-grams over the simple tokens).
    *
    * Implementation note: this is a UDF loop, deliberately. The "pure
    * Column" spelling — `transform(toks, (_, i) => concat_ws(" ",
    * slice(toks, i+1, n)))` — runs INTERPRETED (higher-order functions get
    * no whole-stage codegen) and allocates a slice per element: measured
    * ~19 s to shingle 5k docs vs <1 s for this loop. A UDF that does one
    * linear pass per row beats a per-element interpreted expression tree. */
  private val shingleUdf = udf((toks: Seq[String], n: Int) => {
    // null text → simpleTokens yields null → empty shingle set (the row
    // then drops out via the size(...) > 0 filters, matching the
    // skip-and-log discipline instead of failing the task with an NPE)
    val ts = if (toks == null) IndexedSeq.empty[String] else toks.toIndexedSeq
    if (ts.length < n) Seq.empty[String]
    else {
      val out = new Array[String](ts.length - n + 1)
      var i = 0
      while (i + n <= ts.length) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(ts(i + j))
          j += 1
        }
        out(i) = sb.toString
        i += 1
      }
      out.toSeq
    }
  })

  def shingles(textCol: Column, n: Int): Column =
    shingleUdf(TextOps.simpleTokens(textCol), lit(n))

  private def mix(h0: Long, seed: Long): Long = {
    var h = h0 ^ (seed * 0x9e3779b97f4a7c15L)
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  private def hashStr(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    h
  }

  /** MinHash signature: k permutation-approximating hash functions over
    * the shingle set. Deterministic (seeded mixes of one base hash). */
  def minhashSig(shingles: Seq[String], k: Int): Seq[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    shingles.foreach { s =>
      val base = hashStr(s)
      var i = 0
      while (i < k) {
        val h = mix(base, i.toLong)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig.toSeq
  }

  /** Candidate near-dup pairs via MinHash + banded LSH.
    * k signatures in `bands` bands of k/bands rows: two docs collide when
    * any band agrees. Returns (id_a, id_b, est_jaccard) with id_a < id_b;
    * `est_jaccard` = fraction of agreeing signature positions.
    *
    * Shape notes (100 TB stance):
    *  - the bucket self-join carries ONLY (band, bucket, id) — the k-long
    *    signature arrays are re-joined onto the few surviving DISTINCT
    *    pairs afterwards, so the wide exchange never ships signatures
    *  - `maxBucket > 0` drops degenerate buckets (boilerplate-heavy
    *    corpora make one bucket quadratic); drops are LOGGED, never
    *    silent, and recall for members of dropped buckets is reduced —
    *    near-identical docs typically still collide in other bands */
  /** Slim DISTINCT (id_a < id_b) LSH candidate pairs — no signatures
    * attached. The verify-against-exact-Jaccard pipeline consumes this
    * directly: attaching `est_jaccard` costs two extra signature joins it
    * would throw away.
    *
    * Lifecycle: NOTHING stays persisted after the call (a long-lived
    * pipeline calling this per-batch must not accumulate cache entries).
    * With `stagePath` set — the 100 TB shape — candidate pairs are
    * materialized as parquet there and the returned DataFrame reads them
    * back; without it, the (LSH-selective, threshold-bounded) pair set is
    * materialized through the driver, which is fine for verification-sized
    * corpora but NOT for production dedup: pass a stagePath there. */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                            shingleSize: Int = 3, k: Int = 64, bands: Int = 16,
                            maxBucket: Int = DefaultMaxBucket,
                            stagePath: String = ""): DataFrame = {
    // persist sigs across bandedPairs' multiple references (the self-join
    // sides, plus the bucket-size pass when maxBucket > 0): the shingle +
    // k-minhash UDF chain is the dominant narrow cost and must run ONCE
    val sigs = minhashSigs(df, idCol, textCol, shingleSize, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try materialized(bandedPairs(sigs, k, bands, maxBucket), stagePath)
    finally sigs.unpersist(false)
  }

  /** Default degenerate-bucket cap: one boilerplate-heavy bucket makes the
    * LSH self-join quadratic at corpus scale, so the cap ships ENGAGED
    * (drops are logged, recall for dropped-bucket members reduced — pass
    * 0 to disable for exhaustive small-corpus verification). 1000² rows
    * per worst-case bucket-band keeps any single join group bounded. */
  val DefaultMaxBucket: Int = 1000

  /** Materialize `out` so downstream consumers never recompute the chain:
    * either a parquet staged write (scale path — read back lazily,
    * restart-safe), or an eager DISTRIBUTED local checkpoint. The blocks
    * live on executors — never funneled through the driver, which a
    * `.collect()` default would OOM on a production-sized pair set — and
    * the ContextCleaner drops them when the returned frame becomes
    * unreachable, so no pinned cache entry outlives the caller. */
  private def materialized(out: DataFrame, stagePath: String): DataFrame =
    if (stagePath.nonEmpty) {
      out.write.mode("overwrite").parquet(stagePath)
      out.sparkSession.read.parquet(stagePath)
    } else out.localCheckpoint(true)

  /** The (id, sig) MinHash signature table of a corpus — the narrow UDF
    * chain every LSH path here derives from; tokenless docs are dropped
    * (they have no signature). Public: the oracle-staging queries and the
    * incremental index both reuse the exact same signatures. */
  def minhashSigs(df: DataFrame, idCol: String, textCol: String,
                  shingleSize: Int, k: Int): DataFrame = {
    val sigUdf = udf((sh: Seq[String]) => minhashSig(sh, k))
    df.select(col(idCol).as("id"), shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), sigUdf(col("sh")).as("sig"))
  }

  private def bandedPairs(sigs: DataFrame, k: Int, bands: Int, maxBucket: Int): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    val banded = sigs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws("_", b, concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val kept = if (maxBucket > 0) {
      val sized = banded.groupBy("band", "bucket").agg(count(lit(1)).as("bsz"))
      val over = sized.filter(col("bsz") > maxBucket)
        .agg(count(lit(1)), coalesce(sum("bsz"), lit(0L))).head()
      if (over.getLong(0) > 0)
        System.err.println(s"[graft] minhashCandidates: dropping ${over.getLong(0)} " +
          s"buckets with > $maxBucket members (${over.getLong(1)} member rows) — " +
          "candidate recall reduced for those documents")
      banded.join(sized.filter(col("bsz") <= maxBucket), Seq("band", "bucket"))
        .select("band", "bucket", "id")
    } else banded
    kept.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(kept.select(col("band"), col("bucket"), col("id").as("id_b")), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Candidate pairs WITH `est_jaccard` attached; same lifecycle contract
    * as [[minhashCandidatePairs]] — nothing persisted survives the call. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int = 3, k: Int = 64, bands: Int = 16,
                        maxBucket: Int = DefaultMaxBucket,
                        stagePath: String = ""): DataFrame = {
    // one persisted sigs feeds bandedPairs AND both est_jaccard attach
    // joins — without it the minhash chain recomputes once per reference
    val sigs = minhashSigs(df, idCol, textCol, shingleSize, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val out = bandedPairs(sigs, k, bands, maxBucket)
        .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
        .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
            .cast("double") / k).as("est_jaccard"))
      materialized(out, stagePath)
    } finally sigs.unpersist(false)
  }

  /** LSH candidates verified by EXACT shingle Jaccard ≥ threshold — the
    * full near-dup pipeline (generate cheap, verify exact). Output equals
    * the exact all-pairs answer whenever LSH recall at the threshold is 1
    * (with bands·rows sized so P[miss | J ≥ threshold] ≈ 0), which makes
    * it independently checkable against a brute-force oracle. */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          shingleSize: Int = 3, k: Int = 64, bands: Int = 32,
                          threshold: Double = 0.5, maxBucket: Int = DefaultMaxBucket,
                          stagePath: String = ""): DataFrame = {
    // cand is already materialized (staged or driver-local) — the exact
    // verify below consumes it without re-running the minhash chain, and
    // no cache entry outlives the call
    val cand = minhashCandidatePairs(df, idCol, textCol, shingleSize, k, bands,
      maxBucket, stagePath)
    exactJaccardOnPairs(cand, gramSets(df, idCol, textCol, shingleSize), threshold)
  }

  // ---- SimHash ----

  /** 64-bit SimHash over the token multiset (null-safe: null → simhash of
    * the empty multiset, i.e. 0). */
  def simhash(tokens: Seq[String]): Long = {
    if (tokens == null) return 0L
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = mix(hashStr(t), 0x5eed5eedL)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  val simhashUdf = udf((toks: Seq[String]) => simhash(toks))

  /** Near-dup pairs by SimHash hamming distance ≤ maxDist, found by the
    * pigeonhole banding trick: split the 64-bit hash into maxDist+1
    * chunks — any pair within distance shares at least one exact chunk →
    * equi-join on (chunkIdx, chunkValue), verify with popcount. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist < 64, s"maxDist must be in [0, 64): $maxDist")
    val chunks = maxDist + 1
    // tokenless (incl. null-text) docs are dropped BEFORE hashing, same
    // discipline as the minhash path's size(sh) > 0 filter: they all
    // simhash to 0, so keeping them would (a) report every pair of empty
    // docs as a hamming-0 near-dup and (b) pile them into one degenerate
    // bucket whose self-join is quadratic
    val hashed = df.select(col(idCol).as("id"),
        TextOps.simpleTokens(col(textCol)).as("toks"))
      .filter(col("toks").isNotNull && size(col("toks")) > 0)
      .select(col("id"), simhashUdf(col("toks")).as("sh"))
    // chunks cover ALL 64 bits (lengths differ by at most one): the old
    // uniform 64/chunks split silently ignored the top 64 % chunks bits
    // (weakening bucket selectivity), and at chunks=1 its (1L << 64) - 1
    // mask evaluated to 0 — Java long shifts are mod 64 — degenerating the
    // equi-join into an all-pairs cross join
    val base = 64 / chunks
    val rem = 64 % chunks
    val chunkCols = (0 until chunks).map { i =>
      val start = i * base + math.min(i, rem)
      val len = base + (if (i < rem) 1 else 0)
      val mask = if (len == 64) -1L else (1L << len) - 1
      shiftright(col("sh"), start).bitwiseAND(lit(mask))
    }
    val chunked = hashed.select(col("id"), col("sh"),
        posexplode(array(chunkCols: _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "cval")
    val a = chunked.select(col("chunk"), col("cval"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = chunked.select(col("chunk"), col("cval"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("chunk", "cval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
  }

  // ---- n-gram Jaccard (exact, prefix-filtered inverted-index join) ----

  /** Per-doc DISTINCT n-gram sets as sorted arrays: (id, gs, sz). */
  private def gramSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        array_sort(array_distinct(shingles(col(textCol), n))).as("gs"))
      .withColumn("sz", size(col("gs")))
      .filter(col("sz") > 0)

  /** Exact Jaccard for candidate (id_a < id_b) pairs: re-join the per-doc
    * gram arrays and intersect locally. Filters on the RAW ratio (the
    * oracle's order of operations), rounds only for output. */
  private def exactJaccardOnPairs(pairs: DataFrame, sets: DataFrame,
                                  threshold: Double): DataFrame =
    pairs
      .join(sets.select(col("id").as("id_a"), col("gs").as("gs_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("gs").as("gs_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("gs_a"), col("gs_b"))))
      .withColumn("jaccard_raw", col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard_raw") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard_raw"), 4).as("jaccard"))

  /** Exact Jaccard similarity over word n-gram SETS, all pairs ≥ threshold.
    *
    * Scale shape: PREFIX FILTERING (AllPairs/PPJoin family) — order every
    * doc's grams by ascending global document frequency (ties by gram);
    * a pair with J ≥ t must share a gram inside both docs' first
    * `sz - ⌈t·sz⌉ + 1` grams (the smallest common gram, in the global
    * order, sits inside both prefixes — else the intersection is too
    * small). The inverted-index join therefore runs only over prefix
    * grams, which by construction exclude each doc's most frequent grams:
    * Σ df² over join keys collapses while exactness is preserved for the
    * threshold. Survivor pairs are verified with a local array intersect.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sets = gramSets(df, idCol, textCol, n)
    val grams = sets.select(col("id"), col("sz"), explode(col("gs")).as("gram"))
    val gdf = grams.groupBy("gram").agg(count(lit(1)).as("gdf"))
    val wPos = Window.partitionBy(col("id")).orderBy(col("gdf").asc, col("gram").asc)
    val prefix = grams.join(gdf, Seq("gram"))
      .withColumn("pos", row_number().over(wPos))
      .filter(col("pos") <= col("sz") - ceil(col("sz") * threshold) + lit(1))
      .select("id", "gram", "pos", "sz")
    // PPJoin positional filter (still exact): if a shared gram sits at
    // positions (pa, pb) of the two global-order-sorted gram lists, the
    // overlap can be at most 1 + min(szA-pa, szB-pb); J ≥ t needs overlap
    // ≥ t/(1+t)·(szA+szB). A pair survives if ANY shared prefix gram
    // passes — a superset of keeping the first common gram (whose bound
    // is valid), so no true pair is lost, while pairs sharing only a
    // late/incidental gram never reach the (array-shipping) verify join.
    val alpha = lit(threshold / (1.0 + threshold))
    val cand = prefix.select(col("gram"), col("id").as("id_a"),
        col("pos").as("pos_a"), col("sz").as("sz_a"))
      .join(prefix.select(col("gram"), col("id").as("id_b"),
        col("pos").as("pos_b"), col("sz").as("sz_b")), Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("sz_a") - col("pos_a"), col("sz_b") - col("pos_b")) + lit(1)
        >= alpha * (col("sz_a") + col("sz_b")))
      .select("id_a", "id_b").distinct()
    exactJaccardOnPairs(cand, sets, threshold)
  }

  // ---- incremental near-dup dedup against a persistent signature index ----

  /** The persistent MinHash signature index — the STREAMING-INGEST dedup
    * shape: keep only the banded LSH buckets and signatures of accepted
    * docs (fixed-size state per doc, NO raw text retained — the index can
    * outlive the content's own retention), then screen every new batch
    * with one equi-join before admitting it. A 100 TB corpus ingested in
    * batches never replays old batches: per batch the cost is
    * O(batch × bands) bucket rows joined against the stored buckets.
    *
    * Layout under `path`: `buckets/` (band int, bucket long, id),
    * `sigs/` (id, sig array<long>), both APPENDED per admitted batch, and
    * `meta/` (shingleSize, k, bands) written on first append — the
    * banding parameters are the index's identity (buckets from different
    * parameters are incomparable), so every later call must match them. */
  private def readIndexMeta(spark: org.apache.spark.sql.SparkSession,
                            path: String): Option[(Int, Int, Int)] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/meta"))) None
    else {
      val r = spark.read.parquet(s"$path/meta").head()
      Some((r.getAs[Int]("shingleSize"), r.getAs[Int]("k"), r.getAs[Int]("bands")))
    }
  }

  private def enforceIndexMeta(spark: org.apache.spark.sql.SparkSession,
                               path: String, shingleSize: Int, k: Int,
                               bands: Int): Unit =
    readIndexMeta(spark, path) match {
      case Some(m) =>
        require(m == ((shingleSize, k, bands)),
          s"minhash index at $path was built with (shingleSize, k, bands) = $m; " +
            s"asked for (${shingleSize}, $k, $bands)")
      case None =>
        import spark.implicits._
        Seq((shingleSize, k, bands)).toDF("shingleSize", "k", "bands")
          .write.mode("overwrite").parquet(s"$path/meta")
    }

  /** Banded (band, bucket, id) rows of a signature table — the slim join
    * currency of every LSH path here. */
  private def bandedBuckets(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    sigs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws("_", b,
            concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
  }

  /** Append `df`'s signatures + buckets to the index at `path` (creating
    * it on first use). Tokenless docs are skipped (they have no signature
    * — same discipline as every minhash path). Returns the appended doc
    * count. Idempotence is the CALLER's to provide by id discipline
    * (append the same ids twice and they occupy two index rows); the
    * intended loop is screen → append the survivors. */
  def minhashIndexAppend(df: DataFrame, idCol: String, textCol: String,
                         path: String, shingleSize: Int = 3, k: Int = 64,
                         bands: Int = 32): Long = {
    val spark = df.sparkSession
    enforceIndexMeta(spark, path, shingleSize, k, bands)
    val sigs = minhashSigs(df, idCol, textCol, shingleSize, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      sigs.write.mode("append").parquet(s"$path/sigs")
      bandedBuckets(sigs, k, bands).write.mode("append").parquet(s"$path/buckets")
      sigs.count()
    } finally sigs.unpersist(false)
  }

  /** Screen a NEW batch against the accumulated index AND against itself:
    * one row per batch doc — (id, dup_of, est_jaccard), where `dup_of` is
    * the best match with signature agreement ≥ `threshold` among (a) ALL
    * indexed docs and (b) the batch's own SMALLER-id docs, ties broken by
    * higher agreement then smaller match id; null for survivors. The
    * smaller-id rule makes the one-shot decision deterministic and
    * SQL-checkable with no iterative chasing: a chain a < b < c of mutual
    * near-dups admits only `a` (b and c both match something smaller) —
    * the documented over-drop vs. clustering by connected components,
    * which [[minhashDupGroups]] offers for the batch-global form.
    *
    * Scale shape: the batch's slim (band, bucket, id) rows equi-join the
    * stored buckets (and themselves); signatures attach only to the few
    * DISTINCT candidate pairs; `maxBucket` drops degenerate stored
    * buckets with a logged count, exactly like the batch-global path.
    * The decision metric is SIGNATURE agreement (estimated Jaccard) — the
    * index keeps no text, so exact-shingle verification is impossible by
    * design; size k so the estimate's stderr (≈ 1/√k) fits the threshold.
    * With `stagePath` set, candidate pairs are staged as parquet
    * (restart-safe, and the verification oracle's hook). */
  def minhashScreenBatch(batch: DataFrame, idCol: String, textCol: String,
                         path: String, threshold: Double = 0.5,
                         shingleSize: Int = 3, k: Int = 64, bands: Int = 32,
                         maxBucket: Int = DefaultMaxBucket,
                         stagePath: String = ""): DataFrame = {
    val spark = batch.sparkSession
    enforceIndexMeta(spark, path, shingleSize, k, bands)
    val batchSigs = minhashSigs(batch, idCol, textCol, shingleSize, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val batchBuckets = bandedBuckets(batchSigs, k, bands)
      // a fresh index (meta written, nothing appended yet) has no
      // buckets/sigs dirs — screen against empty state of the SAME
      // schema (limit(0) inherits the batch's id type)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def haveDir(name: String) =
        fs.exists(new org.apache.hadoop.fs.Path(s"$path/$name"))
      val stored0 =
        if (haveDir("buckets")) spark.read.parquet(s"$path/buckets")
        else batchBuckets.limit(0)
      val stored = if (maxBucket <= 0) stored0 else {
        val sized = stored0.groupBy("band", "bucket").agg(count(lit(1)).as("bsz"))
        val over = sized.filter(col("bsz") > maxBucket)
          .agg(count(lit(1)), coalesce(sum("bsz"), lit(0L))).head()
        if (over.getLong(0) > 0)
          System.err.println(s"[graft] minhashScreenBatch: dropping ${over.getLong(0)} " +
            s"stored buckets with > $maxBucket members (${over.getLong(1)} rows) — " +
            "screen recall reduced for those documents")
        stored0.join(sized.filter(col("bsz") <= maxBucket), Seq("band", "bucket"))
          .select("band", "bucket", "id")
      }
      // candidates: batch vs index (any id), plus batch vs its own
      // smaller ids — one DISTINCT slim pair set
      val vsIndex = batchBuckets.select(col("band"), col("bucket"), col("id").as("id_b"))
        .join(stored.select(col("band"), col("bucket"), col("id").as("id_a")),
          Seq("band", "bucket"))
        .select("id_a", "id_b")
      val vsSelf = batchBuckets.select(col("band"), col("bucket"), col("id").as("id_b"))
        .join(batchBuckets.select(col("band"), col("bucket"), col("id").as("id_a")),
          Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      val cand = materialized(vsIndex.union(vsSelf).distinct(), stagePath)
      val allSigs =
        (if (haveDir("sigs")) spark.read.parquet(s"$path/sigs")
         else batchSigs.limit(0)).unionByName(batchSigs)
      val kL = k
      val scored = cand
        .join(allSigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
        .join(batchSigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
            b => b)).cast("double") / kL).as("est"))
        .filter(col("est") >= threshold)
      val w = Window.partitionBy(col("id_b"))
        .orderBy(col("est").desc, col("id_a").asc)
      val best = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id_b").as("id"), col("id_a").as("dup_of"),
          col("est").as("est_jaccard"))
      batch.select(col(idCol).as("id")).distinct()
        .join(best, Seq("id"), "left")
        .select(col("id"), col("dup_of"), col("est_jaccard"))
    } finally batchSigs.unpersist(false)
  }

  /** One ingest step: screen `batch` against the index, APPEND the
    * survivors' signatures/buckets, and return the labeled batch
    * ((id, dup_of, est_jaccard) — `dup_of` null exactly for the admitted
    * docs). The screen → admit → append loop is the whole streaming
    * near-dup pipeline; crash-resume by re-running the batch: already-
    * appended survivors then match themselves in the index at agreement
    * 1.0, so re-admission never duplicates state when the caller keeps
    * the admit-only-if-survivor rule. */
  def minhashIngest(batch: DataFrame, idCol: String, textCol: String,
                    path: String, threshold: Double = 0.5,
                    shingleSize: Int = 3, k: Int = 64, bands: Int = 32,
                    maxBucket: Int = DefaultMaxBucket,
                    stagePath: String = ""): DataFrame = {
    val labeled = minhashScreenBatch(batch, idCol, textCol, path, threshold,
      shingleSize, k, bands, maxBucket, stagePath)
    val survivors = batch.join(
      labeled.filter(col("dup_of").isNull).select(col("id").as(idCol)),
      Seq(idCol), "left_semi")
    minhashIndexAppend(survivors, idCol, textCol, path, shingleSize, k, bands)
    labeled
  }

  // ---- dup-group formation (connected components) ----

  /** Distributed connected components over an undirected pair list, via
    * alternating large-star / small-star rounds (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC 2014). Every
    * step is an equi-join / group-by on node keys — no driver-side graph
    * state, no cross join — and the alternation converges in O(log² n)
    * rounds even on pathological chain graphs, so the shape survives a
    * 100 TB edge list where plain min-label propagation (O(diameter)
    * rounds) would not. Returns one row per node that appears in `edges`
    * (roots label themselves): (id, component), component = the minimum
    * node id in the component.
    * Nodes absent from `edges` are the caller's to label (see
    * [[nearDupGroups]]); id type only needs a total order (long or
    * string both work).
    *
    * Each round is materialized to cut lineage — a k-round loop otherwise
    * builds a k-deep plan that re-analyzes and recomputes from the source
    * every round. With `stagePath` set (the production shape) rounds
    * write parquet there; otherwise `localCheckpoint` (executor-local —
    * fine for verification-sized graphs, not fault-tolerant on a real
    * cluster). Convergence = the oriented edge set's (count,
    * xxhash64-sum) signature repeating; the alternation is monotone, so
    * a signature repeat is a genuine fixpoint up to a ~2⁻⁶⁴ hash-sum
    * coincidence. */
  def connectedComponents(edges: DataFrame, idA: String = "id_a",
                          idB: String = "id_b", maxIter: Int = 50,
                          stagePath: String = ""): DataFrame = {
    val spark = edges.sparkSession
    def cut(df: DataFrame, round: Int): DataFrame =
      if (stagePath.nonEmpty) {
        val p = s"$stagePath/cc_round_$round"
        df.write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      } else df.localCheckpoint()
    def signature(e: DataFrame): (Long, Long) = {
      // bit_xor, not sum: order-independent over a DISTINCT edge set and
      // immune to ANSI-mode long-overflow (a sum of 64-bit hashes is not)
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    // the full node set, materialized alongside round 0 so the (possibly
    // expensive) edge-producing plan runs exactly once more than before —
    // never lazily re-executed by the final totality join
    val nodes =
      if (stagePath.nonEmpty) {
        val p = s"$stagePath/cc_nodes"
        edges.select(col(idA).as("id")).union(edges.select(col(idB).as("id")))
          .distinct().write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      } else edges.select(col(idA).as("id"))
        .union(edges.select(col(idB).as("id"))).distinct().localCheckpoint()
    // orient (u, v) with u > v; drop self-loops and duplicates
    var e = cut(edges
      .select(greatest(col(idA), col(idB)).as("u"), least(col(idA), col(idB)).as("v"))
      .filter(col("u") =!= col("v")).distinct(), 0)
    var sig = signature(e)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      it += 1
      e = cut(smallStar(largeStar(e)), it)
      val s2 = signature(e)
      converged = s2 == sig
      sig = s2
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    // fixpoint = per-component stars (member > root): label members by
    // their root, roots by themselves. Nodes whose every edge was a
    // self-loop vanished at orientation — restore them as singletons so
    // the contract (one row per node appearing in `edges`) stays total.
    val labels = e.select(col("u").as("id"), col("v").as("component"))
      .union(e.select(col("v").as("id"), col("v").as("component")).distinct())
    nodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Large-star: every node connects its LARGER neighbors to the minimum
    * of its closed neighborhood. Input/output edges oriented u > v.
    * Skew: a giant component's root accumulates a high-degree
    * neighborhood, but `min` is map-side combinable (partial agg) and the
    * one hot join key is exactly the AQE skew-join split case — no
    * manual salting needed. */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbr = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val m = nbr.groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    nbr.join(m, Seq("u")).filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v")).distinct()
  }

  /** Small-star: every node connects itself and its SMALLER neighbors to
    * the minimum of that set. Preserves the u > v orientation. */
  private def smallStar(e: DataFrame): DataFrame = {
    val withM = e.join(e.groupBy("u").agg(min(col("v")).as("mn")), Seq("u"))
    withM.select(col("u"), col("mn").as("v")).distinct()
      .union(withM.filter(col("v") =!= col("mn"))
        .select(col("v").as("u"), col("mn").as("v")))
      .distinct()
  }

  /** Label EVERY row of `df` with its near-dup group representative: docs
    * in a `pairs` component get the component's minimum id, everything
    * else labels itself (singleton group). Production dedup keeps the
    * rows where id = component and drops the rest — group formation via
    * components, not quadratic pair output. */
  def nearDupGroups(df: DataFrame, idCol: String, pairs: DataFrame,
                    stagePath: String = ""): DataFrame = {
    val cc = connectedComponents(pairs, stagePath = stagePath)
    df.select(col(idCol).as("id")).join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** One-call production near-dup dedup: verified MinHash near-dup pairs
    * → connected components → every doc labeled with its group rep. Same
    * lifecycle contract as the pair ops (nothing persisted survives). */
  def minhashDupGroups(df: DataFrame, idCol: String, textCol: String,
                       shingleSize: Int = 3, k: Int = 64, bands: Int = 32,
                       threshold: Double = 0.5, maxBucket: Int = DefaultMaxBucket,
                       stagePath: String = ""): DataFrame = {
    val pairs = minhashNearDupPairs(df, idCol, textCol, shingleSize, k, bands,
      threshold, maxBucket, stagePath).select("id_a", "id_b")
    nearDupGroups(df, idCol, pairs,
      stagePath = if (stagePath.nonEmpty) s"$stagePath.cc" else "")
  }
}
