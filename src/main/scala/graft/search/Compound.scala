package graft.search

/** The OpenSearch `dis_max` compound query: `subs` are independently
  * scored sub-queries (each a query text run through the same code-aware
  * analyzer [[graft.corpus.RefQuery]] texts get). A document matches if
  * it matches ANY sub-query; its score combines only the subs it matches:
  *
  *   score = max(sub scores) + tieBreaker × (Σ sub scores − max)
  *
  * (tieBreaker = 0, the default, is pure disjunction-max; 1 degenerates
  * to the plain bool-should sum.) The reference tool replays OpenSearch
  * traffic (README.md:3); `dis_max` is the standard "same text against
  * several fields/phrasings, don't double-count" request those streams
  * carry. */
case class DisMaxQuery(query_id: Int, subs: Seq[String]) {
  require(subs.nonEmpty, s"dis_max query $query_id has no sub-queries")
}

/** The OpenSearch `boosting` compound query: hits are the `positive`
  * query's match set scored normally; any hit that ALSO matches the
  * `negative` query has its score multiplied by `negativeBoost`
  * (demotion, not exclusion — the contrast with `bool.must_not`).
  * Documents matching only `negative` are not returned. */
case class BoostingQuery(query_id: Int, positive: String, negative: String)
