package graft.compare

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import scala.jdk.CollectionConverters._

/** One reported difference between two JSON documents. */
case class DiffEntry(path: String, kind: String, oldValue: String, newValue: String)

/** Structural deep-diff of two JSON documents — the reference's semantic
  * core (reference: response_comparison.py:42-46; change taxonomy and path
  * grammar pinned by its README "Understanding the output" section and
  * test_response_comparison.py:48-83).
  *
  * Reproduces the four pinned change kinds plus list add/remove:
  *  - `dictionary_item_added` / `dictionary_item_removed` — object key
  *    present on one side only
  *  - `values_changed` — same JSON type, different value (old/new carried)
  *  - `type_changes` — different JSON type at the same path (old/new carried)
  *  - `iterable_item_added` / `iterable_item_removed` — list length
  *    mismatch tail (lists compare by index: order is significant, as in
  *    the reference where a reordered list reports values_changed per slot)
  *
  * Paths use the reference's grammar: `root['key'][0]['nested']`.
  *
  * `excludePaths` masks volatile fields before comparison (reference mask
  * list: response_comparison.py:26-29) — any path equal to or nested under
  * an excluded path is ignored. Deterministic: keys are visited in sorted
  * order, output order is the visit order.
  */
object JsonDiff extends Serializable {

  final val DictAdded = "dictionary_item_added"
  final val DictRemoved = "dictionary_item_removed"
  final val ValuesChanged = "values_changed"
  final val TypeChanges = "type_changes"
  final val ItemAdded = "iterable_item_added"
  final val ItemRemoved = "iterable_item_removed"

  @transient private lazy val mapper = new ObjectMapper()

  private def kindOf(n: JsonNode): String =
    if (n.isObject) "object"
    else if (n.isArray) "array"
    else if (n.isTextual) "string"
    else if (n.isIntegralNumber) "int"
    else if (n.isNumber) "float"
    else if (n.isBoolean) "bool"
    else "null"

  private def render(n: JsonNode): String =
    if (n == null) "" else if (n.isTextual) n.asText() else n.toString

  /** Diff two JSON strings. A side that fails to parse is treated as a
    * plain string scalar (the reference's parse-with-string-fallback,
    * data.py:26-32). Nulls are treated as JSON null. */
  def diff(left: String, right: String, excludePaths: Seq[String]): Array[DiffEntry] = {
    val l = parseLenient(left)
    val r = parseLenient(right)
    val excluded = excludePaths.toSet
    val out = scala.collection.mutable.ArrayBuffer.empty[DiffEntry]
    walk(l, r, "root", excluded, out)
    out.toArray
  }

  private def parseLenient(s: String): JsonNode = {
    if (s == null) return mapper.nullNode()
    try mapper.readTree(s)
    catch { case _: Exception => mapper.getNodeFactory.textNode(s) }
  }

  private def walk(l: JsonNode, r: JsonNode, path: String, excluded: Set[String],
                   out: scala.collection.mutable.ArrayBuffer[DiffEntry]): Unit = {
    if (excluded.contains(path)) return
    val (lk, rk) = (kindOf(l), kindOf(r))
    if (lk != rk) {
      out += DiffEntry(path, TypeChanges, render(l), render(r))
      return
    }
    lk match {
      case "object" =>
        val lKeys = l.fieldNames().asScala.toVector
        val rKeys = r.fieldNames().asScala.toVector
        val lSet = lKeys.toSet
        val rSet = rKeys.toSet
        (lKeys ++ rKeys.filterNot(lSet)).sorted.foreach { k =>
          val p = s"$path['$k']"
          if (!excluded.contains(p)) {
            if (!rSet.contains(k)) out += DiffEntry(p, DictRemoved, render(l.get(k)), "")
            else if (!lSet.contains(k)) out += DiffEntry(p, DictAdded, "", render(r.get(k)))
            else walk(l.get(k), r.get(k), p, excluded, out)
          }
        }
      case "array" =>
        val n = math.min(l.size(), r.size())
        var i = 0
        while (i < n) { walk(l.get(i), r.get(i), s"$path[$i]", excluded, out); i += 1 }
        while (i < l.size()) {
          out += DiffEntry(s"$path[$i]", ItemRemoved, render(l.get(i)), ""); i += 1
        }
        while (i < r.size()) {
          out += DiffEntry(s"$path[$i]", ItemAdded, "", render(r.get(i))); i += 1
        }
      case _ =>
        if (!l.equals(r)) out += DiffEntry(path, ValuesChanged, render(l), render(r))
    }
  }

  /** UDF: (leftJson, rightJson, excludePaths) → array<struct<path,kind,oldValue,newValue>>. */
  val diffUdf = udf((l: String, r: String, ex: Seq[String]) =>
    diff(l, r, if (ex == null) Nil else ex))

  def diffCol(l: Column, r: Column, ex: Column): Column = diffUdf(l, r, ex)
}
