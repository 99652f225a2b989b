package graft.search

import graft.analyze.AnalyzerConfig

/** A Lucene/OpenSearch-style boolean query over the index — the `bool`
  * query shape (`must` / `should` / `must_not`) of the system the
  * reference tool compares (the reference replays OpenSearch traffic,
  * README.md:3; this is the query language those requests carry).
  *
  * Semantics (Lucene's, exactly):
  *   - a hit must contain EVERY `must` term and NONE of the `mustNot`
  *     terms; with no `must` clause it must contain at least one
  *     `should` term;
  *   - the score is the BM25 sum over the SCORING terms
  *     (`must` ∪ `should`) present in the doc — `mustNot` never scores;
  *   - clause arrays hold analyzer-normalized terms, distinct and sorted
  *     ascending (the summation-order contract that keeps [[Golden]] and
  *     [[Wand]] scores bit-identical).
  *
  * Build instances via [[BoolQuery.parse]] (the `+term` / `-term` /
  * `term` query-string mini-syntax) or [[BoolQuery.of]] (explicit clause
  * texts); both run every clause through the same code-aware analyzer
  * documents get, so `+camelCase` matches the split tokens.
  */
case class BoolQuery(query_id: Int,
                     must: Array[String],
                     should: Array[String],
                     mustNot: Array[String],
                     minShouldMatch: Int = 0) {
  require(must.nonEmpty || should.nonEmpty,
    s"boolean query $query_id has no scoring clause (pure negation is unbounded)")
  require(minShouldMatch >= 0,
    s"boolean query $query_id: minimum_should_match must be >= 0: $minShouldMatch")
  /** Effective minimum_should_match — the OpenSearch defaulting rule:
    * explicit value if set, else 1 when `should` is the only scoring
    * clause (a pure-should query must match something), else 0 (`should`
    * is optional once `must` constrains the hit). A value larger than
    * `should.length` is satisfiable by no document, so the query simply
    * returns no hits — same as OpenSearch. */
  def effectiveMinShould: Int =
    if (minShouldMatch > 0) minShouldMatch else if (must.isEmpty) 1 else 0
  /** Scoring terms (`must` ∪ `should`), distinct ascending — the
    * summation order. The clauses are disjoint, so sorting the
    * concatenation is the distinct merge. */
  def scoring: Array[String] = (must ++ should).sorted
}

object BoolQuery {

  /** Normalize clause texts into a [[BoolQuery]]: each clause is analyzed
    * with the document tokenizer; `should` drops terms already required by
    * `must` (they would score twice); all clauses distinct + sorted. */
  def of(queryId: Int, must: String, should: String, mustNot: String,
         minShouldMatch: Int = 0,
         analyzer: AnalyzerConfig = AnalyzerConfig.default): BoolQuery = {
    val m = analyzer.analyzeQuery(must).distinct.sorted
    val s = analyzer.analyzeQuery(should).distinct.filterNot(m.contains).sorted
    val n = analyzer.analyzeQuery(mustNot).distinct.sorted
    BoolQuery(queryId, m, s, n, minShouldMatch)
  }

  /** Parse the classic query-string mini-syntax: whitespace-separated
    * words where a `+` prefix means `must`, `-` means `must_not`, and a
    * bare word means `should` (Lucene query-string semantics). A word may
    * analyze to several terms (camelCase/snake_case splitting) — they all
    * join the word's clause. */
  def parse(queryId: Int, text: String,
            analyzer: AnalyzerConfig = AnalyzerConfig.default): BoolQuery = {
    val must = Seq.newBuilder[String]
    val should = Seq.newBuilder[String]
    val not = Seq.newBuilder[String]
    text.trim.split("\\s+").filter(_.nonEmpty).foreach { w =>
      if (w.startsWith("+")) must ++= analyzer.analyzeQuery(w.drop(1))
      else if (w.startsWith("-")) not ++= analyzer.analyzeQuery(w.drop(1))
      else should ++= analyzer.analyzeQuery(w)
    }
    val m = must.result().distinct.sorted.toArray
    BoolQuery(queryId, m,
      should.result().distinct.filterNot(m.contains).sorted.toArray,
      not.result().distinct.sorted.toArray)
  }
}
