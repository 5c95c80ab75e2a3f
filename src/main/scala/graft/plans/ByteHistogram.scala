package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Dense per-row byte histogram: `bins` counts of `(b & 0xFF) % bins`
  * over a binary payload — optionally L2-normalized (round-6, the same
  * HALF_UP grid as Spark's round) — in ONE codegen'd pass. The dense
  * twin of the sparse explode/groupBy table
  * ([[graft.operators.Multimodal.byteHistogramTable]], the oracle-checked
  * form): identical counts, but per-ROW, so the feature pass is a narrow
  * scan with no explode and no shuffle (the sparse route pushed every
  * payload byte through an exchange — ~35 M rows at sf0.1 for 8 k
  * assets). Normalization lives INSIDE the expression because a
  * `transform(hist, x -> x / norm)` lambda would re-evaluate the
  * norm subtree per element (Spark's subexpression elimination does not
  * descend into higher-order-function lambdas). */
case class ByteHistogram(child: Expression, bins: Int,
                         normalized: Boolean = false) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if bins > 0 => TypeCheckResult.TypeCheckSuccess
    case BinaryType => TypeCheckResult.TypeCheckFailure("byte_histogram: bins must be > 0")
    case t => TypeCheckResult.TypeCheckFailure(s"byte_histogram expects binary, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_histogram"

  override def nullSafeEval(input: Any): Any =
    ByteHistogram.hist(input.asInstanceOf[Array[Byte]], bins, normalized)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("byteHistogram", ByteHistogram, "graft.plans.ByteHistogram$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $obj.hist($c, $bins, $normalized);")
  }

  override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
    copy(child = newChild)
}

object ByteHistogram {
  def apply(bytes: Column, bins: Int, normalized: Boolean): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(new ByteHistogram(ColumnShim.expression(bytes), bins, normalized))
  }
  def apply(bytes: Column, bins: Int): Column = apply(bytes, bins, normalized = false)

  def hist(bytes: Array[Byte], bins: Int, normalized: Boolean): ArrayData = {
    val counts = new Array[Double](bins)
    var i = 0
    while (i < bytes.length) {
      counts((bytes(i) & 0xFF) % bins) += 1.0
      i += 1
    }
    if (normalized) {
      var ss = 0.0
      var j = 0
      while (j < bins) { ss += counts(j) * counts(j); j += 1 }
      val n = math.sqrt(ss)
      if (n > 0) {
        j = 0
        while (j < bins) {
          // same rounding as Spark's round(x, 6): decimal HALF_UP
          counts(j) = java.math.BigDecimal.valueOf(counts(j) / n)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          j += 1
        }
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(counts)
  }
}
