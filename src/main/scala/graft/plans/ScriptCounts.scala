package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-script character counts in ONE pass: Arabic block (U+0600–U+06FF),
  * CJK unified ideographs (U+4E00–U+9FFF), and ASCII Latin letters —
  * exactly the classes the language-ID heuristic and the is_arabic ratio
  * measure. The builtin route pays `length(x) - length(regexp_replace(x,
  * class, ''))` per class — two regex passes each, eight passes total in
  * langId. Counts are over code points in the classes; astral characters
  * belong to none of them, so iterating UTF-16 units is equivalent. */
case class ScriptCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"script_counts expects string, got $t")
  }
  override def dataType: DataType = ScriptCounts.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "script_counts"

  override def nullSafeEval(input: Any): Any =
    ScriptCounts.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("scriptCounts", ScriptCounts, "graft.plans.ScriptCounts$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $obj.count($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ScriptCounts =
    copy(child = newChild)
}

object ScriptCounts {
  val schema: StructType = StructType(Seq(
    StructField("n_ar", LongType, nullable = false),
    StructField("n_cjk", LongType, nullable = false),
    StructField("n_latin", LongType, nullable = false)))

  def apply(text: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(new ScriptCounts(ColumnShim.expression(text)))
  }

  /** Allocation-free byte scan (no String decode): Arabic U+0600–U+06FF
    * is exactly the 2-byte lead range 0xD8–0xDB; CJK U+4E00–U+9FFF is the
    * 3-byte leads 0xE5–0xE9 plus 0xE4 with second byte ≥ 0xB8
    * (0xE4 0xB8 0x80 == U+4E00; 0xE9 0xBF 0xBF == U+9FFF). */
  def count(s: UTF8String): InternalRow = {
    val b = s.getBytes
    val n = b.length
    var ar = 0L; var cjk = 0L; var latin = 0L
    var i = 0
    while (i < n) {
      val c = b(i) & 0xFF
      if (c < 0x80) {
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) latin += 1
        i += 1
      } else if (c >= 0xD8 && c <= 0xDB) { ar += 1; i += 2 }
      else if (c >= 0xE4 && c <= 0xE9) {
        if (c != 0xE4 || (i + 1 < n && (b(i + 1) & 0xFF) >= 0xB8)) cjk += 1
        i += 3
      }
      else if (c < 0xC0) i += 1 // stray continuation byte
      else if (c < 0xE0) i += 2 // other 2-byte char
      else if (c < 0xF0) i += 3 // other 3-byte char
      else i += 4               // 4-byte char (astral — in no class)
    }
    new GenericInternalRow(Array[Any](ar, cjk, latin))
  }
}
