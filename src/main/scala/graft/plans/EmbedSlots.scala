package graft.plans

import graft.functions.{TextFns, VecFns}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}

/** Per-row hashed-embedding SLOTS: token array → the document's sparse
  * normalized-quantized vector `struct<buckets array<long>, qs
  * array<double>, na double>` (bucket-ascending), or NULL for a
  * token-less / fully-sign-cancelled document (no direction — the old
  * chain's `n > 0` filter).
  *
  * This is [[graft.operators.Hybrid.embedSlots]]'s whole
  * explode → groupBy(doc, bucket) → groupBy(doc) norm-join →
  * collect_list pipeline moved INSIDE the document row: every quantity
  * depends on nothing outside the document, so the build needs ZERO
  * exchanges (r12 telemetry: the hadith cold build shuffled 22 MB at
  * sf0.1, most of it these doc-keyed regroupings; at 100 TB the slots
  * layer becomes a pure scan projection). Bit-equal to the old chain by
  * construction — same md5 hash/sign family ([[TextFns.hash31Local]],
  * the pinned twin of the `hash31` column), signed counts summed as
  * exact integer doubles (order-free), the same
  * `round(round(v/n, 6) · Scale)` HALF_UP grid (`BigDecimal.valueOf`
  * semantics, Spark's own Round implementation for doubles), buckets
  * ascending (the old sort_array order; buckets are unique per doc),
  * and `na` folded over exact integral qs² — pinned against a
  * re-implementation of the old chain in EmbedSlotsSpec.
  *
  * Cancel-to-zero buckets are KEPT (they mark touched buckets, matching
  * the entry-level form); only the whole-vector zero norm nulls out.
  */
case class EmbedSlots(child: Expression, dim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"embed_slots expects array<string>, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("buckets", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("qs", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("na", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "embed_slots"

  override def nullSafeEval(input: Any): Any =
    EmbedSlots.slots(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("embedSlots", EmbedSlots, "graft.plans.EmbedSlots$")
    val code = nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = (InternalRow) $obj.slots($c, $dim);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
    code
  }

  override protected def withNewChildInternal(newChild: Expression): EmbedSlots =
    copy(child = newChild)
}

object EmbedSlots {
  def apply(tokens: Column, dim: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(new EmbedSlots(ColumnShim.expression(tokens), dim))
  }

  /** One TreeMap per row (bucket-ascending iteration = the old
    * sort_array order). Returns null for a zero-norm document. One
    * MessageDigest per ROW, bytes straight from the UTF8String — no
    * String, no hex formatting ([[TextFns.hash31Bytes]]). NULL elements
    * are skipped — same doctrine as [[TermTf.counts]]: the tokenizer
    * never yields them, but a conservatively-marked containsNull array
    * must not NPE on getUTF8String (r13 advice). */
  def slots(arr: ArrayData, dim: Int): InternalRow = {
    val n = arr.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val acc = new java.util.TreeMap[java.lang.Long, Array[Double]]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = TextFns.hash31Bytes(md, arr.getUTF8String(i).getBytes)
        val b = java.lang.Long.valueOf(h % dim)
        val s = if ((h / dim) % 2 == 0) 1.0 else -1.0
        val c = acc.get(b)
        if (c == null) acc.put(b, Array(s)) else c(0) += s
      }
      i += 1
    }
    if (acc.isEmpty) return null
    var s2 = 0.0
    val vs = acc.values.iterator()
    while (vs.hasNext) { val v = vs.next()(0); s2 += v * v }
    val norm = math.sqrt(s2)
    if (!(norm > 0.0)) return null
    val m = acc.size()
    val bs = new Array[Any](m)
    val qs = new Array[Any](m)
    var na2 = 0.0
    var j = 0
    val it = acc.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val r6 = BigDecimal(e.getValue()(0) / norm)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val q = BigDecimal(r6 * VecFns.Scale)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble
      bs(j) = e.getKey.longValue()
      qs(j) = q
      na2 += q * q
      j += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(bs), new GenericArrayData(qs), math.sqrt(na2)))
  }
}
