package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths:
  *  - brute-force cosine top-k — the exact baseline: broadcast the (small)
  *    query set against the corpus, one narrow pass, per-query top-k window
  *  - LSH (random hyperplanes) — the scale path: signatures bucket the
  *    corpus so each query only scores its bucket's candidates; recall
  *    traded via number of tables/bits
  *
  * Dot products use `zip_with` + `aggregate` (codegen'd built-ins — no
  * UDF in the hot loop).
  */
object Similarity extends Serializable {

  /** Cosine similarity of two float-array columns as a Column expression. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

  /** Exact brute-force top-k neighbors for each query vector.
    * @param corpus  (idCol, vecCol) — the full embedding table
    * @param queries (idCol, vecCol) — SMALL (it is broadcast)
    * @return (query_id, rank, neighbor_id, cosine) excluding self-matches */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int,
                     filter: Option[Column] = None): DataFrame = {
    // `filter` is a PRE-filter over corpus metadata (the filtered
    // vector-search shape): only rows passing it are eligible neighbors,
    // applied BEFORE the scan so top-k always fills from eligible docs —
    // a post-filter over an unfiltered top-k would under-fill. Exact
    // here; [[lshTopK]] takes the same parameter on its approximate path.
    // null embeddings can neither query nor be a neighbor (cosine = null)
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = filter.fold(corpus)(corpus.filter).filter(col(vecCol).isNotNull)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Reciprocal-rank fusion of ranked lists — the OpenSearch hybrid-search
    * rrf score-ranker (and the standard way to merge a lexical BM25 list
    * with a semantic ANN list without score calibration). Each input
    * carries (query_id, doc_id, rank); a document's fused score is
    * Σ 1/(rrfK + rank) over the lists it appears in, ties broken by
    * doc_id ascending. With two lists at most two doubles are summed per
    * doc, so the fused ordering is deterministic bit-for-bit (addition
    * is commutative; no associativity drift to worry about until 3+
    * lists, where the magnitudes still make drift implausible).
    *
    * Scale shape: inputs are per-query top-k' lists (Q×k' slim rows —
    * data-scale across a large query replay, never per-doc); one shuffle
    * on (query_id, doc_id) with map-side partial aggregation, then the
    * per-query window. No content or vectors move. */
  def rrfFuse(lists: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k > 0 && rrfK >= 0, "need k > 0 and rrfK >= 0")
    val slim = lists.map(_.select(col("query_id"), col("doc_id"), col("rank")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
    slim.reduce(_ unionAll _)
      .groupBy("query_id", "doc_id")
      .agg(sum(lit(1.0d) / (lit(rrfK.toDouble) + col("rank"))).as("rrf_score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf_score"))
  }

  /** Score-normalized hybrid fusion (the OpenSearch 2.x hybrid search
    * normalization processor): each ranked list's SCORES are normalized
    * per query — `min_max`: `(s - min) / (max - min)` (a degenerate
    * single-score list normalizes to 1.0, the documented choice);
    * `l2`: `s / sqrt(Σ s²)` — then combined per doc as the WEIGHTED
    * ARITHMETIC MEAN `Σ wᵢ·nᵢ / Σ wᵢ`, a doc absent from a list
    * contributing 0 to the numerator while the denominator keeps every
    * list's weight (the processor's combination semantics). Unlike
    * [[rrfFuse]] this preserves score MAGNITUDE information, not just
    * rank. Ties break doc_id ascending.
    *
    * Scale shape: the [[rrfFuse]] discipline — per-query top-k' lists
    * are Q×k' slim rows; one per-list partial aggregation computes the
    * normalization constants (|Q| rows, broadcast back), one shuffle on
    * (query_id, doc_id) combines, then the per-query rank window. */
  def normalizedFuse(lists: Seq[(DataFrame, Double)], k: Int,
                     technique: String = "min_max"): DataFrame = {
    require(lists.nonEmpty, "normalizedFuse needs at least one ranked list")
    require(k > 0, s"k must be positive: $k")
    require(technique == "min_max" || technique == "l2",
      s"unknown normalization technique: $technique")
    require(lists.forall(_._2 > 0), "list weights must be positive")
    val wSum = lists.map(_._2).sum
    val weighted = lists.map { case (df, wt) =>
      val slim = df.select(col("query_id"), col("doc_id"),
        col("score").cast("double").as("s"))
      val consts = slim.groupBy("query_id")
        .agg(min(col("s")).as("mn"), max(col("s")).as("mx"),
          sum(col("s") * col("s")).as("ss"))
      val ns =
        if (technique == "min_max")
          when(col("mx") === col("mn"), lit(1.0))
            .otherwise((col("s") - col("mn")) / (col("mx") - col("mn")))
        else
          when(col("ss") > 0, col("s") / sqrt(col("ss"))).otherwise(lit(0.0))
      slim.join(broadcast(consts), Seq("query_id"))
        .select(col("query_id"), col("doc_id"), (ns * lit(wt)).as("ws"))
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hybrid_score").desc, col("doc_id").asc)
    weighted.reduce(_ unionAll _)
      .groupBy("query_id", "doc_id")
      .agg((sum(col("ws")) / lit(wSum)).as("hybrid_score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("hybrid_score"))
  }

  /** Deterministic pseudo-random hyperplane component for (bit, dim). */
  private def planeComponent(seed: Long, bit: Int, dim: Int): Double = {
    var h = seed ^ (bit.toLong * 0x9e3779b97f4a7c15L) ^ (dim.toLong * 0xbf58476d1ce4e5b9L)
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^= (h >>> 31)
    // map to (-1, 1)
    (h.toDouble / Long.MaxValue.toDouble)
  }

  /** Sign-random-projection signature: `bits` hyperplane sign bits.
    * Null-safe: a null vector (null embedding column) signs as the zero
    * vector rather than NPE-ing the task. */
  def lshSignature(vec: Seq[Double], bits: Int, seed: Long): Long = {
    if (vec == null) return 0L
    var sig = 0L
    var b = 0
    while (b < bits) {
      var dot = 0.0
      var d = 0
      while (d < vec.length) { dot += vec(d) * planeComponent(seed, b, d); d += 1 }
      if (dot > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Multi-table sign-LSH candidate generation: each (table, signature)
    * bucket is an equi-join key — no cross join at any scale. The bucket
    * join and the multi-table de-dup run over SLIM (id, table, sig) rows;
    * vectors are re-attached only to the surviving DISTINCT pairs (an
    * embedding is ~3 orders of magnitude wider than its id — carrying
    * both vectors through the join + distinct multiplies the shuffle by
    * the table count for nothing). Returns DISTINCT
    * (query_id, qvec, neighbor_id, nvec) candidate rows. */
  def lshCandidatePairs(corpus: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, bits: Int = 12, tables: Int = 4,
                        seed: Long = 42L): DataFrame = {
    val sigUdf = udf((v: Seq[Double], t: Int) => lshSignature(v, bits, seed + t))
    // null-embedding rows are dropped BEFORE signing: they would all sign
    // as 0 in every table, colliding into one degenerate bucket whose
    // self-join is quadratic (and whose cosines are null anyway)
    def slimSigs(df: DataFrame, id: String) =
      df.filter(col(vecCol).isNotNull)
        .select(col(idCol).as(id), col(vecCol).as("v"),
          explode(sequence(lit(0), lit(tables - 1))).as("table"))
        .select(col(id), col("table"), sigUdf(col("v"), col("table")).as("sig"))
    slimSigs(corpus, "neighbor_id")
      .join(broadcast(slimSigs(queries, "query_id")), Seq("table", "sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
  }

  /** Re-attach vectors to slim (query_id, neighbor_id) pairs. Exposed so a
    * caller can MATERIALIZE the slim pairs (e.g. to a staging table) and
    * attach vectors to the materialized rows — pair generation then runs
    * once, not once per downstream consumer. */
  def lshAttachVectors(pairs: DataFrame, corpus: DataFrame, queries: DataFrame,
                       idCol: String, vecCol: String): DataFrame =
    pairs
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))), Seq("query_id"))
      .select("query_id", "qvec", "neighbor_id", "nvec")

  def lshCandidates(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, bits: Int = 12, tables: Int = 4,
                    seed: Long = 42L): DataFrame =
    lshAttachVectors(
      lshCandidatePairs(corpus, queries, idCol, vecCol, bits, tables, seed),
      corpus, queries, idCol, vecCol)

  /** Exact-cosine re-rank of candidate rows to per-query top-k. */
  def rerankTopK(cand: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand.withColumn("cosine", cosine(col("qvec"), col("nvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Approximate top-k: LSH candidate generation + exact cosine re-rank.
    * `filter` pre-filters the corpus (filtered vector search): signatures
    * are computed only for eligible rows, so buckets, candidates, and the
    * re-rank all see the filtered corpus — semantically "ANN over the
    * subset", not a recall-losing post-filter of unfiltered buckets. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, bits: Int = 12, tables: Int = 4,
              seed: Long = 42L, filter: Option[Column] = None): DataFrame =
    rerankTopK(lshCandidates(filter.fold(corpus)(corpus.filter), queries,
      idCol, vecCol, bits, tables, seed), k)

  /** Corpus×corpus LSH-bucket candidate pairs (id_a < id_b, DISTINCT,
    * vectors attached) — the generation half of [[embeddingNearDups]].
    * Same slim-join shape as [[lshCandidates]]: the bucket self-join and
    * the de-dup move only ids; the two vector re-attach joins touch each
    * surviving pair once. */
  def embeddingCandidatePairs(corpus: DataFrame, idCol: String, vecCol: String,
                              bits: Int = 14, tables: Int = 6,
                              seed: Long = 42L): DataFrame = {
    val sigUdf = udf((v: Seq[Double], t: Int) => lshSignature(v, bits, seed + t))
    // same null-vector drop as lshCandidatePairs — see the note there
    val sigs = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        explode(sequence(lit(0), lit(tables - 1))).as("table"))
      .select(col("id"), col("table"), sigUdf(col("vec"), col("table")).as("sig"))
    val a = sigs.select(col("table"), col("sig"), col("id").as("id_a"))
    val b = sigs.select(col("table"), col("sig"), col("id").as("id_b"))
    a.join(b, Seq("table", "sig")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Re-attach vectors to slim (id_a, id_b) pairs — see [[lshAttachVectors]]
    * for why this is a separate step. */
  def embeddingAttachVectors(pairs: DataFrame, corpus: DataFrame,
                             idCol: String, vecCol: String): DataFrame = {
    val vecs = corpus.select(col(idCol).as("vid"), col(vecCol).as("v"))
    pairs
      .join(vecs.select(col("vid").as("id_a"), col("v").as("vec_a")), Seq("id_a"))
      .join(vecs.select(col("vid").as("id_b"), col("v").as("vec_b")), Seq("id_b"))
      .select("id_a", "id_b", "vec_a", "vec_b")
  }

  def embeddingCandidates(corpus: DataFrame, idCol: String, vecCol: String,
                          bits: Int = 14, tables: Int = 6,
                          seed: Long = 42L): DataFrame =
    embeddingAttachVectors(
      embeddingCandidatePairs(corpus, idCol, vecCol, bits, tables, seed),
      corpus, idCol, vecCol)

  /** Embedding near-duplicate pairs: corpus×corpus via LSH buckets, exact
    * cosine ≥ threshold verification. */
  def embeddingNearDups(corpus: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, bits: Int = 14, tables: Int = 6,
                        seed: Long = 42L): DataFrame =
    embeddingCandidates(corpus, idCol, vecCol, bits, tables, seed)
      .withColumn("cosine", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))

  // ---- IVF (inverted-file) ANN — the coarse-quantizer scale path ----

  /** Train an IVF coarse quantizer: deterministic seeded Lloyd's k-means
    * over a bounded corpus sample, run on the DRIVER (the sample is
    * `nLists × samplePerList` vectors — at 4096 lists × 64 that is ~256k
    * vectors, driver-trivial even when the corpus is 10^10 rows; the
    * cluster never shuffles anything for training). Returns the centroid
    * matrix, L2-normalized so assignment maximizes cosine via a plain dot
    * product. */
  def ivfTrain(corpus: DataFrame, idCol: String, vecCol: String,
               nLists: Int, iters: Int = 10, samplePerList: Int = 64,
               seed: Long = 42L): Array[Array[Double]] = {
    require(nLists >= 1, s"nLists must be >= 1: $nLists")
    val vecs = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("string").as("id"), col(vecCol).as("v"))
    val total = vecs.count()
    val target = nLists.toLong * samplePerList
    val oneIn = math.max(1L, total / math.max(1L, target))
    // deterministic id-hash sample — resumable/reproducible, no RNG state
    val sample: Array[Array[Double]] = vecs
      .filter(pmod(xxhash64(col("id"), lit(seed)), lit(oneIn)) === 0)
      .select("v").collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "ivfTrain: empty sample (empty corpus?)")
    def norm(v: Array[Double]): Array[Double] = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0) v else v.map(_ / n)
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) { s += a(i) * b(i); i += 1 }
      s
    }
    val normed = sample.map(norm)
    // seeded init: spread starts across the (deterministically ordered)
    // sample instead of taking a contiguous prefix
    val k = math.min(nLists, normed.length)
    var centroids = Array.tabulate(k)(i => normed(((i.toLong * normed.length) / k).toInt))
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](normed(0).length))
      val counts = new Array[Long](k)
      normed.foreach { v =>
        var best = 0; var bestDot = Double.MinValue; var c = 0
        while (c < k) { val d = dot(v, centroids(c)); if (d > bestDot) { bestDot = d; best = c }; c += 1 }
        val s = sums(best); var i = 0
        while (i < v.length && i < s.length) { s(i) += v(i); i += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(k)(c =>
        if (counts(c) == 0) centroids(c) else norm(sums(c)))
      it += 1
    }
    centroids
  }

  /** Assign each row to its nearest-centroid list (one narrow pass over a
    * broadcast centroid matrix — no shuffle). `nProbe > 1` emits the row
    * under its nProbe nearest lists (query-side probing). */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                centroids: Array[Array[Double]], nProbe: Int = 1,
                outId: String = "id"): DataFrame = {
    val cB = df.sparkSession.sparkContext.broadcast(centroids)
    val p = math.min(nProbe, centroids.length)
    val listsUdf = udf((v: Seq[Double]) => {
      val cs = cB.value
      val scored = Array.tabulate(cs.length) { c =>
        var s = 0.0; var i = 0
        val m = math.min(v.length, cs(c).length)
        while (i < m) { s += v(i) * cs(c)(i); i += 1 }
        (c, s)
      }
      scored.sortBy(-_._2).take(p).map(_._1).toSeq
    })
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as(outId), explode(listsUdf(col(vecCol))).as("list_id"))
  }

  /** Slim IVF candidate pairs: corpus rows live in ONE list each; every
    * query probes its `nProbe` nearest lists; candidates = equi-join on
    * list_id. Probe cost per query ≈ nProbe × corpus/nLists — the knob a
    * 100 TB deployment turns instead of LSH bit/table tuning. */
  def ivfCandidatePairs(corpus: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, centroids: Array[Array[Double]],
                        nProbe: Int = 4): DataFrame =
    ivfAssign(corpus, idCol, vecCol, centroids, 1, "neighbor_id")
      .join(broadcast(ivfAssign(queries, idCol, vecCol, centroids, nProbe, "query_id")),
        Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()

  /** Approximate top-k via IVF: train → probe → exact-cosine re-rank. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nLists: Int = 64, nProbe: Int = 4,
              iters: Int = 10, seed: Long = 42L): DataFrame = {
    val centroids = ivfTrain(corpus, idCol, vecCol, nLists, iters, seed = seed)
    rerankTopK(lshAttachVectors(
      ivfCandidatePairs(corpus, queries, idCol, vecCol, centroids, nProbe),
      corpus, queries, idCol, vecCol), k)
  }
}
