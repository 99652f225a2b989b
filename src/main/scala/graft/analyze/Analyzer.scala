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
                                stem: Boolean = false) {

  def isDefault: Boolean = stopwords.isEmpty && !stem

  /** Analyze one text: tokenize, then the filter chain. */
  def analyze(s: String): Array[String] = filter(Tokenizer.tokenize(s))

  /** The filter chain over already-tokenized (lowercased) tokens. */
  def filter(toks: Array[String]): Array[String] =
    if (isDefault) toks
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

  /** Canonical manifest form: "" for the default chain, else
    * `stop=a,b,c;stem=porter` (stopwords sorted — the set is
    * order-independent, the serialization must be stable). */
  def spec: String =
    if (isDefault) ""
    else {
      val parts = Seq.newBuilder[String]
      if (stopwords.nonEmpty) parts += s"stop=${stopwords.toSeq.sorted.mkString(",")}"
      if (stem) parts += "stem=porter"
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

  /** Stopword tokens may not contain the spec's structural characters. */
  def validate(cfg: AnalyzerConfig): AnalyzerConfig = {
    cfg.stopwords.foreach { w =>
      require(w.nonEmpty && !w.exists(c => c == ',' || c == ';' || c == '='),
        s"stopword '$w' is empty or contains a spec delimiter")
    }
    cfg
  }

  /** Inverse of [[AnalyzerConfig.spec]]; rejects unknown filters loudly
    * (a silently ignored filter would change scores without a trace). */
  def parse(spec: String): AnalyzerConfig = {
    if (spec == null || spec.isEmpty) return default
    var stop = Set.empty[String]
    var stem = false
    spec.split(";").filter(_.nonEmpty).foreach { part =>
      val i = part.indexOf('=')
      require(i > 0, s"malformed analyzer spec part '$part' in '$spec'")
      (part.substring(0, i), part.substring(i + 1)) match {
        case ("stop", ws)      => stop = ws.split(",").filter(_.nonEmpty).toSet
        case ("stem", "porter") => stem = true
        case (k, v) => throw new IllegalArgumentException(
          s"unknown analyzer filter '$k=$v' in spec '$spec'")
      }
    }
    AnalyzerConfig(stop, stem)
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
