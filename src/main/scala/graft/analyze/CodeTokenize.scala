package graft.analyze

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for code-aware tokenization.
  *
  * A `ScalaUDF` pays per-row conversion plumbing (catalyst→scala arg
  * conversion, boxed function dispatch, scala→catalyst result conversion).
  * This expression stays inside whole-stage codegen: the generated code
  * calls the static [[CodeTokenize.evalUtf8]] directly and materializes
  * the token array as `ArrayData` without intermediate Scala collections'
  * conversions — the tokenizer is the hottest scalar in the index build's
  * staging scan, so this is where codegen-nativeness pays.
  */
case class CodeTokenize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"code_tokenize requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    CodeTokenize.evalUtf8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.analyze.CodeTokenize.evalUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): CodeTokenize =
    copy(child = newChild)

  override def prettyName: String = "code_tokenize"
}

object CodeTokenize {
  /** Static entry the generated code calls. */
  def evalUtf8(s: UTF8String): ArrayData = {
    val toks = Tokenizer.tokenize(s.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  def tokens(c: Column): Column =
    Bridge.columnOf(CodeTokenize(Bridge.expressionOf(c)))
}
