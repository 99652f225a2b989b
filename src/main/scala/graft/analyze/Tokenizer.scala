package graft.analyze

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Code-aware tokenizer: the analysis chain of the engine.
  *
  * Splits source text on non-alphanumeric boundaries (which covers
  * snake_case), then splits each chunk at camelCase boundaries
  * (lower→Upper, acronym→TitleCase, letter↔digit), and lowercases.
  * Mirrors the reference's normalize-before-compare discipline
  * (reference: data.py:100-124 normalizes responses before diffing);
  * here normalization happens before indexing so the index and the
  * golden scorer agree token-for-token.
  *
  * Pure, deterministic, null-safe — Catalyst-friendly as a UDF; the
  * core loop is allocation-light (single pass, no regex) so it stays
  * cheap inside whole-stage-codegen'd plans that call the UDF.
  */
object Tokenizer extends Serializable {

  /** Max emitted token length; longer runs are split (degenerate inputs
    * like minified blobs must not produce unbounded dictionary terms). */
  final val MaxTokenLen = 64

  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  private def isUpper(c: Char): Boolean = c >= 'A' && c <= 'Z'
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** Tokenize one document. Never returns null; empty array for null/empty input. */
  def tokenize(s: String): Array[String] = {
    if (s == null || s.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = s.length
    var i = 0
    while (i < n) {
      // skip separators
      while (i < n && !isAlnum(s.charAt(i))) i += 1
      val start = i
      while (i < n && isAlnum(s.charAt(i))) i += 1
      if (i > start) emitChunk(s, start, i, out)
    }
    out.toArray
  }

  /** Split one alphanumeric chunk [from, until) at camelCase / digit
    * boundaries and append lowercased tokens. Boundary rules:
    *  - lower|Upper          → split before Upper        (parseHttp → parse, http)
    *  - Upper+|Upper lower   → split before last Upper   (HTTPResponse → http, response)
    *  - letter|digit, digit|letter → split               (utf8Codec → utf, 8, codec)
    */
  private def emitChunk(s: String, from: Int, until: Int,
                        out: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    var tokStart = from
    var i = from + 1
    while (i <= until) {
      val boundary = if (i == until) true else {
        val p = s.charAt(i - 1); val c = s.charAt(i)
        (!isUpper(p) && !isDigit(p) && isUpper(c)) ||            // lower|Upper
        (isUpper(p) && isUpper(c) && i + 1 < until && !isUpper(s.charAt(i + 1)) && !isDigit(s.charAt(i + 1))) || // ACROn|ym
        (isDigit(p) != isDigit(c))                               // letter|digit
      }
      if (boundary && i > tokStart) {
        var a = tokStart
        while (a < i) {
          val b = math.min(a + MaxTokenLen, i)
          out += s.substring(a, b).toLowerCase(java.util.Locale.ROOT)
          a = b
        }
        tokStart = i
      }
      i += 1
    }
  }

  /** UDF form (kept for comparison/tests); [[tokens]] uses the native
    * Catalyst expression [[CodeTokenize]] which stays inside whole-stage
    * codegen without ScalaUDF conversion plumbing. */
  val tokensUdf = udf((s: String) => tokenize(s))

  def tokens(c: Column): Column = CodeTokenize.tokens(c)
}
