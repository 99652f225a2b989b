package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reverse search — the OpenSearch `percolate` query: REGISTERED queries
  * are the small side, DOCUMENTS stream through, and each document comes
  * back tagged with every registered query it matches. This is the
  * monitoring/alerting shape of the system the reference tool compares
  * (store the alert queries, percolate each arriving document), and the
  * natural companion to the replayer pipeline: "which saved searches
  * does this response body hit?"
  *
  * Scale shape: ONE narrow map-side pass. The registered query set is
  * query-scale (like every query-set structure here), so its inverted
  * term→queries map rides to executors as a broadcast variable (shipped
  * once per executor, torrent-distributed — not per task) and is bounded
  * by [[Percolator.MaxRegistryEntries]]; each doc's
  * distinct tokens probe the map and tally per-query matched-term counts.
  * No shuffle, no join, no state — which also makes it a valid Structured
  * Streaming transform verbatim (stateless narrow ops pass through
  * `readStream` unchanged; PercolatorSpec pins batch ≡ streaming).
  * The alternative spelling — explode tokens, broadcast-join the query
  * terms, groupBy (doc, query) — shuffles one row per matched token and
  * is strictly worse at corpus scale.
  *
  * A Scala UDF is the right altitude here: counting map-probe hits per
  * query inside one array traversal has no codegen'd built-in spelling
  * that avoids the explode+shuffle above (the HOF alternative needs a
  * per-query aggregate inside the array — quadratic in |queries|).
  */
object Percolator {

  /** Hard bound on the registry's total (term, query) registration
    * entries. The inverted map is driver-built and executor-resident —
    * at ~40 bytes/entry the default caps it near 200 MB, comfortably
    * inside executor memory but far beyond any plausible saved-search
    * registry (OpenSearch percolator indexes rarely exceed 10^5 queries).
    * Beyond this, register the queries as an indexed table and use the
    * explode + broadcast-join spelling instead — the registry is no
    * longer "the small side". Read per call (not cached) so tests can
    * shrink it via `graft.percolator.maxEntries`. */
  def MaxRegistryEntries: Int =
    sys.props.get("graft.percolator.maxEntries").map(_.toInt)
      .getOrElse(5000000)

  /** Match every document against every registered query.
    *
    * @param docs any DataFrame (batch OR streaming) with an id column and
    *             a tokens column
    * @param idCol document identity column name
    * @param tokensCol array<string> of the document's analyzed tokens —
    *                  pass the SAME analyzer used for the query terms
    *                  (e.g. [[graft.analyze.Tokenizer.tokens]] or
    *                  [[graft.ops.TextOps.simpleTokens]])
    * @param qTerms registered queries: query_id → DISTINCT analyzed terms
    * @param conjunctive false = OR (≥1 query term present), true = AND
    *                    (every query term present)
    * @return (<idCol>, query_id int, matched_terms int) — one row per
    *         (document, matching query); matched_terms counts the
    *         DISTINCT query terms present in the document */
  def percolate(docs: DataFrame, idCol: String, tokensCol: Column,
                qTerms: Map[Int, Array[String]],
                conjunctive: Boolean = false): DataFrame = {
    require(qTerms.nonEmpty, "need at least one registered query")
    require(qTerms.values.forall(_.nonEmpty), "every query needs >= 1 term")
    val nEntries = qTerms.valuesIterator.map(_.distinct.length.toLong).sum
    require(nEntries <= MaxRegistryEntries,
      s"percolator registry has $nEntries (term, query) entries, above the " +
      s"executor-residency bound $MaxRegistryEntries — register the queries " +
      "as an indexed table and join instead")
    // inverted registration: term -> queries asking for it; query -> #terms
    // needed to match. Both are query-scale; broadcast (not closure-
    // captured) so a large registry ships once per executor, not per task.
    val termQ: Map[String, Array[Int]] = qTerms.toSeq
      .flatMap { case (qid, ts) => ts.distinct.map(t => (t, qid)) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).distinct.sorted.toArray }
    val need: Map[Int, Int] =
      if (conjunctive) qTerms.map { case (q, ts) => q -> ts.distinct.length }
      else qTerms.map { case (q, _) => q -> 1 }
    val regB = docs.sparkSession.sparkContext.broadcast((termQ, need))
    val matchU = udf { toks: Seq[String] =>
      if (toks == null) Seq.empty[(Int, Int)]
      else {
        val (termQL, needL) = regB.value
        val counts = scala.collection.mutable.HashMap.empty[Int, Int]
        val seen = scala.collection.mutable.HashSet.empty[String]
        toks.foreach { t =>
          if (seen.add(t)) termQL.get(t) match {
            case Some(qids) =>
              var i = 0
              while (i < qids.length) {
                counts.update(qids(i), counts.getOrElse(qids(i), 0) + 1)
                i += 1
              }
            case None => ()
          }
        }
        counts.iterator
          .filter { case (q, c) => c >= needL(q) }
          .map { case (q, c) => (q, c) }
          .toSeq.sortBy(_._1)
      }
    }
    docs.select(col(idCol), explode(matchU(tokensCol)).as("m"))
      .select(col(idCol), col("m._1").as("query_id"),
        col("m._2").as("matched_terms"))
  }
}
