package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizer for the engine's F2 token class — maximal runs of
  * `[a-z0-9_؀-ۿ]` over an (already lowercased) string. Semantically
  * IDENTICAL to `filter(split(lower(x), "[^a-z0-9_؀-ۿ]+"), t -> len(t)>0)`
  * and to the DuckDB oracles' regexp_split/regexp_extract_all twins, but
  * executed as a single byte scan instead of a Java-regex NFA walk: the
  * Arabic block U+0600–U+06FF is exactly the two-byte UTF-8 lead range
  * 0xD8–0xDB, so class membership is a byte-range test and tokens are
  * byte slices — no decoding, no per-token regex machinery.
  *
  * Tokenization sits in the hot path of every FTS/dedup/minhash build
  * (at 100 TB it is the single most-executed expression in the engine);
  * the regex form measured ~5 s of the ~10 s tafsir postings build at
  * sf0.1, this scan removes most of that (see BENCH).
  */
case class ClassTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"class_tokens expects string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "class_tokens"

  override def nullSafeEval(input: Any): Any =
    ClassTokens.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("classTokens", ClassTokens, "graft.plans.ClassTokens$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $obj.split($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ClassTokens =
    copy(child = newChild)
}

object ClassTokens {
  /** Column API entry — callers pass `lower(text)`; lowering stays a
    * builtin so locale-sensitive case mappings match the oracle exactly. */
  def apply(lowered: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(new ClassTokens(ColumnShim.expression(lowered)))
  }

  // token byte: ASCII [a-z0-9_], an Arabic-block lead (0xD8–0xDB ⇔
  // U+0600–U+06FF in 2-byte UTF-8), or a continuation byte FOLLOWING one
  // (handled positionally in the scan loop below)
  @inline private def asciiTokenByte(b: Int): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == '_'
  @inline private def arabicLead(b: Int): Boolean = b >= 0xD8 && b <= 0xDB

  /** Maximal class runs as byte slices. */
  def split(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < n) {
      // skip separators (any byte that does not start a token char)
      var b = bytes(i) & 0xFF
      while (i < n && !asciiTokenByte(b) && !arabicLead(b)) {
        i += 1
        // skip the continuation bytes of a non-Arabic multibyte char
        while (i < n && (bytes(i) & 0xC0) == 0x80) i += 1
        if (i < n) b = bytes(i) & 0xFF
      }
      val start = i
      // consume the token run
      var run = true
      while (i < n && run) {
        val c = bytes(i) & 0xFF
        if (asciiTokenByte(c)) i += 1
        else if (arabicLead(c) && i + 1 < n && (bytes(i + 1) & 0xC0) == 0x80) i += 2
        else run = false
      }
      if (i > start)
        out.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, start, i)))
      else if (i < n) i += 1 // malformed lone lead byte: treat as separator
    }
    new GenericArrayData(out.toArray(Array.empty[AnyRef]))
  }
}
