package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row term frequencies: token array → `array<struct<term, tf>>`,
  * first-occurrence order. This is the postings build's aggregation
  * moved INSIDE the document row: `groupBy(doc_id, dl, term).count`
  * needs a full shuffle of the postings to meet each group's rows,
  * but a document's term counts depend on nothing outside the
  * document — one hash map per row computes them in the scan, no
  * exchange, no aggregation state. With it, [[graft.operators.
  * Postings.build]] is shuffle-FREE and the only index-build exchange
  * left is the term-clustering repartition — at 100 TB that halves
  * the build's shuffle bytes (r12 telemetry: the two quran cold
  * builds were the suite's top movers at 165 MB each, most of it this
  * doubled postings movement).
  *
  * A declarative per-row form exists (`aggregate` over the array
  * rebuilding a map per element) but is quadratic per document
  * (map_concat copies the accumulator each step) — the same reason
  * ByteBins/ByteHistogram are native. Precondition shared with the
  * old groupBy form's callers: corpus ids are unique (a duplicated
  * doc_id now yields its own postings rows per duplicate instead of
  * merged counts — corpus tables are keyed by construction).
  */
case class TermTf(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"term_tf expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", IntegerType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "term_tf"

  override def nullSafeEval(input: Any): Any =
    TermTf.counts(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("termTf", TermTf, "graft.plans.TermTf$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $obj.counts($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TermTf =
    copy(child = newChild)
}

object TermTf {
  def apply(tokens: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(new TermTf(ColumnShim.expression(tokens)))
  }

  /** One pass + one LinkedHashMap per row (first-occurrence order keeps
    * the result deterministic; downstream explodes it, so order is
    * semantically irrelevant anyway). NULL elements are skipped — the
    * tokenizer never yields them, but checkInputDataTypes accepts
    * `containsNull = true` arrays (Spark marks split/transform output
    * conservatively), and a null token must not become a null `term` in
    * a non-nullable field (r13 advice). */
  def counts(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val m = new java.util.LinkedHashMap[UTF8String, Array[Int]]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val c = m.get(t)
        if (c == null) m.put(t, Array(1)) else c(0) += 1
      }
      i += 1
    }
    val out = new Array[Any](m.size())
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      j += 1
    }
    new GenericArrayData(out)
  }
}
