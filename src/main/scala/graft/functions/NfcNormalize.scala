package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization + SIMPLE per-codepoint lowercasing as one
  * native Catalyst expression — the canonicalization step text dedup
  * depends on ("é" as U+00E9 vs e + U+0301 must hash identically).
  *
  * Lowercasing is `Character.toLowerCase` per codepoint, NOT
  * `String.toLowerCase`: the full (context/locale-sensitive) algorithm
  * maps final-position Σ to ς and dotted İ to i + combining dot, while
  * utf8proc-based engines (the DuckDB oracle) apply the simple 1:1
  * mapping (σ, i). Simple casing keeps the dedup key engine-portable
  * and length-stable.
  *
  * Spark has no NFC built-in and a Scala UDF would break whole-stage
  * codegen on the cleaning path, so this generates a direct static
  * call. Already-normalized all-lowercase strings (ASCII corpora in
  * particular) pass without allocating a new buffer.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  // reject non-string input at ANALYSIS time: without this, a SQL call
  // like graft_nfc(42) passes analysis and dies mid-query with a
  // ClassCastException on the interpreted fallback
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NfcNormalize {
  /** Static entry shared by interpreted and generated paths: NFC, then
    * simple per-codepoint lowercase. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    val nfc =
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) str
      else Normalizer.normalize(str, Normalizer.Form.NFC)
    var changed = false
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    while (i < nfc.length) {
      val cp = nfc.codePointAt(i)
      val lo = Character.toLowerCase(cp)
      if (lo != cp) changed = true
      sb.appendCodePoint(lo)
      i += Character.charCount(cp)
    }
    if (!changed && (nfc eq str)) s
    else UTF8String.fromString(sb.toString)
  }
}
