package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Bin index per payload byte — `(b & 0xFF) % bins` over a binary column,
  * as one codegen'd array build. The builtin route (hex() → lookbehind
  * regex split into 2-char strings → conv(_,16,10) per byte) allocates
  * three strings per byte and dominated the multimodal feature pass
  * (~4.5 s at sf0.1); this is the byte-histogram front half with zero
  * string work, feeding the same explode/groupBy sparse aggregation. */
case class ByteBins(child: Expression, bins: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if bins > 0 => TypeCheckResult.TypeCheckSuccess
    case BinaryType => TypeCheckResult.TypeCheckFailure("byte_bins: bins must be > 0")
    case t => TypeCheckResult.TypeCheckFailure(s"byte_bins expects binary, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_bins"

  override def nullSafeEval(input: Any): Any =
    ByteBins.bin(input.asInstanceOf[Array[Byte]], bins)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("byteBins", ByteBins, "graft.plans.ByteBins$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $obj.bin($c, $bins);")
  }

  override protected def withNewChildInternal(newChild: Expression): ByteBins =
    copy(child = newChild)
}

object ByteBins {
  def apply(bytes: Column, bins: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(new ByteBins(ColumnShim.expression(bytes), bins))
  }

  def bin(bytes: Array[Byte], bins: Int): ArrayData = {
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = (bytes(i) & 0xFF) % bins
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}
