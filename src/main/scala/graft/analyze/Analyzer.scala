package graft.analyze

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Configurable analysis chain (the OpenSearch analyzer model: one
  * tokenizer + an ordered list of token filters). The tokenizer is the
  * engine's code-aware [[Tokenizer]] (which lowercases — the OpenSearch
  * `lowercase` filter is structural here); the optional filters run in
  * the fixed OpenSearch-default order:
  *
  *   1. `stop`        — drop tokens in the stopword set (applied BEFORE
  *                      stemming, like the `english` analyzer chain, so
  *                      stopwords are matched in their surface form)
  *   2. `porter_stem` — [[Porter]] stemming
  *   3. `shingle`     — word n-grams (output_unigrams=false), applied to
  *                      BOTH sides: a multi-word query matches as its
  *                      contiguous word-grams (the search_as_you_type
  *                      `_2gram` behavior through plain BM25)
  *   4. `edge_ngram`  — per-token leading-edge grams, INDEX side only
  *                      ([[AnalyzerConfig.queryChain]] strips it): a
  *                      typed prefix matches the stored grams verbatim
  *                      (search_as_you_type prefix-field semantics)
  *
  * Gram chains redefine what a "token" is, so dl/avgdl/df/positions are
  * gram statistics on such an index — exactly as in Lucene, where the
  * gram filter rewrites the token stream before the postings see it.
  * Phrase/span queries over a gram index operate on gram positions;
  * that is well-defined but rarely what you want — use gram chains for
  * completion-style fields, not positional search.
  *
  * Position semantics under `stop`: positions are assigned AFTER
  * filtering (a removed stopword closes the gap — OpenSearch's
  * `enable_position_increments=false` stance). Both engines and the
  * index derive positions from the same filtered array, so phrase /
  * span semantics stay engine-identical by construction; the choice is
  * documented rather than configurable because position-increment gaps
  * would poison every adjacent-SpanNear the camelCase splitter emits.
  *
  * The chain is STICKY per index, like `positions`: recorded in the
  * snapshot manifest at stage time ([[spec]] round-trips through JSON),
  * followed by every append/compact/reindex generation, and applied to
  * query text by both engines — golden and WAND analyze with the same
  * chain or the comparison harness would diverge on the first stopword.
  */
final case class AnalyzerConfig(stopwords: Set[String] = Set.empty,
                                stem: Boolean = false,
                                edgeNgram: Option[(Int, Int)] = None,
                                shingles: Option[(Int, Int)] = None) {

  def isDefault: Boolean =
    stopwords.isEmpty && !stem && edgeNgram.isEmpty && shingles.isEmpty

  /** Analyze one text with the FULL (document-side) chain. */
  def analyze(s: String): Array[String] = filter(Tokenizer.tokenize(s))

  /** The query-side chain: identical minus the edge_ngram expansion —
    * a typed prefix IS already a gram, so search terms match the
    * index-side grams verbatim (OpenSearch's search_as_you_type
    * prefix-field semantics: gram-expanded index, plain search terms).
    * Shingles STAY query-side: a multi-word query matches as its
    * contiguous word-grams, both sides shingling identically — the
    * `_2gram`-subfield phrase behavior through plain BM25. */
  def queryChain: AnalyzerConfig =
    if (edgeNgram.isEmpty) this else copy(edgeNgram = None)

  /** Analyze QUERY text ([[queryChain]]). Equal to [[analyze]] for every
    * chain without edge_ngram. */
  def analyzeQuery(s: String): Array[String] = queryChain.analyze(s)

  /** The filter chain over already-tokenized (lowercased) tokens, in
    * the fixed order stop → stem → shingle → edge_ngram. */
  def filter(toks: Array[String]): Array[String] =
    if (isDefault) toks
    else {
      val base =
        if (stopwords.isEmpty && !stem) toks
        else {
          val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
          var i = 0
          while (i < toks.length) {
            val t = toks(i)
            if (!stopwords.contains(t)) out += (if (stem) Porter.stem(t) else t)
            i += 1
          }
          out.toArray
        }
      val sh = shingles match {
        case None => base
        case Some((mn, mx)) =>
          // word n-grams, output_unigrams=false, position-major (all
          // sizes at each start before moving on — Lucene's emission
          // order); a doc shorter than mn tokens emits nothing
          val out = new scala.collection.mutable.ArrayBuffer[String](base.length)
          var i = 0
          while (i < base.length) {
            var n = mn
            while (n <= mx && i + n <= base.length) {
              out += base.slice(i, i + n).mkString(" ")
              n += 1
            }
            i += 1
          }
          out.toArray
      }
      edgeNgram match {
        case None => sh
        case Some((mn, mx)) =>
          // leading-edge grams mn..mx per token, position-major; tokens
          // shorter than mn are dropped (Lucene edge_ngram filter)
          val out = new scala.collection.mutable.ArrayBuffer[String](sh.length)
          var i = 0
          while (i < sh.length) {
            val t = sh(i)
            if (t.length >= mn) {
              var g = mn
              val top = math.min(mx, t.length)
              while (g <= top) { out += t.substring(0, g); g += 1 }
            }
            i += 1
          }
          out.toArray
      }
    }

  /** Canonical manifest form: "" for the default chain, else
    * `stop=a,b,c;stem=porter;shingle=2,3;edge=2,8` (stopwords sorted —
    * the set is order-independent, the serialization must be stable;
    * filter order in the string mirrors application order). */
  def spec: String =
    if (isDefault) ""
    else {
      val parts = Seq.newBuilder[String]
      if (stopwords.nonEmpty) parts += s"stop=${stopwords.toSeq.sorted.mkString(",")}"
      if (stem) parts += "stem=porter"
      shingles.foreach { case (mn, mx) => parts += s"shingle=$mn,$mx" }
      edgeNgram.foreach { case (mn, mx) => parts += s"edge=$mn,$mx" }
      parts.result().mkString(";")
    }

  /** Column form of [[analyze]]: the default chain is the bare
    * codegen'd [[CodeTokenize]]; a configured chain runs the whole
    * tokenize+filter pipeline in ONE static call ([[AnalyzeChain]]),
    * staying inside whole-stage codegen like the bare tokenizer. */
  def tokens(c: Column): Column =
    if (isDefault) CodeTokenize.tokens(c)
    else Bridge.columnOf(AnalyzeChain(Bridge.expressionOf(c), spec))
}

object AnalyzerConfig {

  val default: AnalyzerConfig = AnalyzerConfig()

  /** Stopword tokens may not contain the spec's structural characters;
    * gram bounds must be sane; shingles and edge grams don't compose
    * (OpenSearch's search_as_you_type keeps them in separate subfields —
    * an edge gram OF a shingle has no retrieval meaning here). */
  def validate(cfg: AnalyzerConfig): AnalyzerConfig = {
    cfg.stopwords.foreach { w =>
      require(w.nonEmpty && !w.exists(c => c == ',' || c == ';' || c == '='),
        s"stopword '$w' is empty or contains a spec delimiter")
    }
    (cfg.edgeNgram.toSeq ++ cfg.shingles).foreach { case (mn, mx) =>
      require(mn >= 1 && mx >= mn, s"gram bounds must satisfy 1 <= min <= max: ($mn,$mx)")
    }
    cfg.shingles.foreach { case (mn, _) =>
      require(mn >= 2, "shingle min size must be >= 2 (unigrams are the bare chain)")
    }
    require(cfg.edgeNgram.isEmpty || cfg.shingles.isEmpty,
      "edge_ngram and shingle filters don't compose in one chain")
    cfg
  }

  /** Inverse of [[AnalyzerConfig.spec]]; rejects unknown filters loudly
    * (a silently ignored filter would change scores without a trace). */
  def parse(spec: String): AnalyzerConfig = {
    if (spec == null || spec.isEmpty) return default
    var stop = Set.empty[String]
    var stem = false
    var edge: Option[(Int, Int)] = None
    var shin: Option[(Int, Int)] = None
    def bounds(v: String, k: String): (Int, Int) = v.split(",") match {
      case Array(a, b) if a.matches("\\d+") && b.matches("\\d+") => (a.toInt, b.toInt)
      case _ => throw new IllegalArgumentException(
        s"malformed $k bounds '$v' in spec '$spec' (want 'min,max')")
    }
    spec.split(";").filter(_.nonEmpty).foreach { part =>
      val i = part.indexOf('=')
      require(i > 0, s"malformed analyzer spec part '$part' in '$spec'")
      (part.substring(0, i), part.substring(i + 1)) match {
        case ("stop", ws)      => stop = ws.split(",").filter(_.nonEmpty).toSet
        case ("stem", "porter") => stem = true
        case ("edge", v)       => edge = Some(bounds(v, "edge"))
        case ("shingle", v)    => shin = Some(bounds(v, "shingle"))
        case (k, v) => throw new IllegalArgumentException(
          s"unknown analyzer filter '$k=$v' in spec '$spec'")
      }
    }
    validate(AnalyzerConfig(stop, stem, edge, shin))
  }
}

/** Native Catalyst expression running the FULL analysis chain
  * (tokenize + stop + stem) in one static call — the same
  * codegen-nativeness argument as [[CodeTokenize]], for indexes built
  * with a configured chain. The spec string is a plan-stable literal;
  * the parsed config is cached per JVM (executors parse it once). */
case class AnalyzeChain(child: Expression, spec: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"analyze_chain requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    AnalyzeChain.evalUtf8(v.asInstanceOf[UTF8String], spec)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val specRef = ctx.addReferenceObj("analyzerSpec", spec, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.analyze.AnalyzeChain.evalUtf8($c, $specRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): AnalyzeChain =
    copy(child = newChild)

  override def prettyName: String = "analyze_chain"
}

object AnalyzeChain {

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, AnalyzerConfig]()

  private def cfgOf(spec: String): AnalyzerConfig = {
    val hit = cache.get(spec)
    if (hit != null) hit
    else { val c = AnalyzerConfig.parse(spec); cache.putIfAbsent(spec, c); c }
  }

  /** Static entry the generated code calls. */
  def evalUtf8(s: UTF8String, spec: String): ArrayData = {
    val toks = cfgOf(spec).analyze(s.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }
}
