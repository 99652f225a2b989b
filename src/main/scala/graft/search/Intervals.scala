package graft.search

/** The OpenSearch `intervals` query, rewritten onto the span AST.
  *
  * OpenSearch's intervals DSL (reference surface: the `intervals` query
  * with `match` / `any_of` / `all_of` rules and the
  * `containing` / `not_containing` / `contained_by` filters) is a
  * position-window algebra — exactly the algebra [[Spans]] already
  * evaluates identically on both engines. Rather than grow a second
  * positional evaluator (and a second golden twin to keep bit-identical),
  * each interval rule REWRITES to the equivalent span node:
  *
  *  - `match` (ordered)   → [[SpanNear]]  — in-order, total gap ≤ `max_gaps`
  *  - `match` (unordered) → [[SpanUnordered]] — any order, window gap ≤ `max_gaps`
  *  - `any_of`            → [[SpanOr]]
  *  - `all_of`            → [[SpanNear]] / [[SpanUnordered]] over sub-rules
  *  - `prefix`            → [[Wand.spanMulti]]'s dictionary-expanded [[SpanOr]]
  *  - filter `containing`     → [[SpanContaining]]
  *  - filter `contained_by`   → [[SpanWithin]]
  *  - filter `not_containing` → [[SpanNot]]
  *
  * Scoring therefore follows the span family's one documented contract
  * (BM25 sum over the tree's distinct scoring terms — see [[Spans]]),
  * not Lucene's interval-frequency similarity; that is this engine's
  * documented divergence, chosen so an ANSI-SQL oracle can replay the
  * score from staged (sha_id, pos, term) rows.
  *
  * Scale shape: identical to `span` queries — the rewrite is driver-side
  * over the (tiny) rule tree, then one [[Wand.spanSearchSnapshot]] pass;
  * per-doc enumeration cost is bounded by the `max_gaps` budget prune.
  */
object Intervals {

  /** The `match` rule: `text` is analyzed with the index's own analyzer;
    * the terms must co-occur with total internal gap ≤ `maxGaps`,
    * in order iff `ordered` (both default false in the DSL; `maxGaps`
    * defaults to -1 = unbounded there, here a required explicit bound —
    * unbounded windows don't survive 100-TB posting lists). */
  def matchRule(text: String, maxGaps: Int, ordered: Boolean,
                analyzer: graft.analyze.AnalyzerConfig =
                  graft.analyze.AnalyzerConfig.default): SpanQuery = {
    val terms = analyzer.analyzeQuery(text)
    require(terms.nonEmpty, s"intervals match rule analyzed to no terms: '$text'")
    if (terms.length == 1) SpanTerm(terms(0))
    else if (ordered) SpanNear(terms.toSeq.map(SpanTerm), maxGaps)
    else SpanUnordered(terms.toSeq.map(SpanTerm), maxGaps)
  }

  /** The `any_of` combinator: any sub-rule's interval matches. */
  def anyOf(rules: Seq[SpanQuery]): SpanQuery = {
    require(rules.nonEmpty, "intervals any_of needs at least one rule")
    SpanOr(rules)
  }

  /** The `all_of` combinator: every sub-rule matches, combined window
    * gap ≤ `maxGaps`, sub-intervals in rule order iff `ordered`. */
  def allOf(rules: Seq[SpanQuery], maxGaps: Int, ordered: Boolean): SpanQuery = {
    require(rules.nonEmpty, "intervals all_of needs at least one rule")
    if (rules.length == 1) rules.head
    else if (ordered) SpanNear(rules, maxGaps)
    else SpanUnordered(rules, maxGaps)
  }

  /** The `containing` filter: keep `rule` intervals that contain an
    * interval of `filter`. */
  def containing(rule: SpanQuery, filter: SpanQuery): SpanQuery =
    SpanContaining(rule, filter)

  /** The `contained_by` filter: keep `rule` intervals inside an
    * interval of `filter`. */
  def containedBy(rule: SpanQuery, filter: SpanQuery): SpanQuery =
    SpanWithin(filter, rule)

  /** The `not_containing` filter: keep `rule` intervals with NO
    * `filter` interval inside them. Maps to [[SpanNot]]'s zero-context
    * overlap exclusion, which coincides with containment exactly when
    * the filter's intervals are single terms (width 1 ⇒ overlapping the
    * window = sitting inside it); for wider filters the span form is
    * the stricter no-overlap — documented divergence. */
  def notContaining(rule: SpanQuery, filter: SpanQuery): SpanQuery =
    SpanNot(rule, filter)
}
