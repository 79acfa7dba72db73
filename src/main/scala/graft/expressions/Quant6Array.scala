package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Micro-unit quantization of a whole float embedding in one codegen'd
  * pass — the native form of `transform(vec, x -> floor(x·1e6 + 0.5))`
  * ([[graft.llmdata.Embeddings.quantArray]]), which ran as an
  * interpreted lambda with a boxed call per component. Null elements
  * propagate to null slots, exactly like the transform.
  */
case class Quant6Array(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "quant6arr"

  override protected def nullSafeEval(input: Any): Any =
    Quant6Array.quantAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Quant6Array.quantAll($c)")

  override protected def withNewChildInternal(newChild: Expression): Quant6Array =
    copy(child = newChild)
}

object Quant6Array {
  def quantAll(a: ArrayData): GenericArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (a.isNullAt(i)) null
        else java.lang.Long.valueOf(DotQuant6.quant6(a.getFloat(i)))
      i += 1
    }
    new GenericArrayData(out)
  }
}
