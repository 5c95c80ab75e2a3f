package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused portable 60-bit hash — the native form of
  * `conv(substring(md5(x), 1, 15), 16, 10) :: long` (TextFns.hash60).
  *
  * The composed builtin chain allocates a 32-char hex STRING per row
  * (md5's output), substrings it, and re-parses the hex back into a
  * long via conv — three UTF8String allocations and a radix parse per
  * hashed value, on the hottest rows of the dedup suite (one hash per
  * (doc, token) in minhash, per term in simhash bands, per token in
  * the rolling fingerprint). This expression computes the identical
  * value straight from the digest bytes: the first 15 hex chars of an
  * md5 are bytes 0-6 plus the high nibble of byte 7
  * ([[graft.functions.TextFns.hash31Bytes]] has carried the same
  * identity since r12, pinned by EmbedSlotsSpec), with one reused
  * thread-local MessageDigest and zero string formatting. Equality
  * with the composed form is pinned in PropertySpec.
  *
  * Input must be STRING (same contract as the composed form — md5's
  * implicit cast accepts only strings); the digest runs over the
  * UTF-8 bytes, exactly what `cast(string as binary)` feeds md5. */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hash60 expects string, got $t")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hash60"

  override def nullSafeEval(input: Any): Any =
    Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("hash60", Hash60, "graft.plans.Hash60$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $obj.hash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(new Hash60(ColumnShim.expression(c)))
  }

  // MessageDigest is stateful — one per executor thread, reset by each
  // digest() call; codegen'd rows on different task threads never share
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** The 60-bit value (bytes 0-6 + high nibble of byte 7 of the md5) —
    * [[graft.functions.TextFns.hash31Bytes]] without its final mod. */
  def hash(s: UTF8String): Long = {
    val d = md.get().digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xffL) >>> 4)
  }
}
