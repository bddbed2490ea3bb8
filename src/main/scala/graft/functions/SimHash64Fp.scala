package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the IN-ROW 64-bit SimHash
  * fingerprint — the streaming path's per-document hot loop.
  *
  * The composable form ([[graft.operators.NearDup]]'s previous
  * `simHash64Row`: transform → md5 → aggregate/zip_with over a
  * 64-element vote array) is a tower of higher-order functions, which
  * Spark evaluates INTERPRETED — ~64 boxed `when` trees per token per
  * document. Measured on the sf1 online-dedup stream (q178): the
  * single micro-batch spent 30.4 s in addBatch with only ~7.5 s of
  * state management — the fingerprint tree was the batch. This
  * expression computes the identical fingerprint in one tight
  * primitive pass (per-thread MessageDigest, no allocation beyond the
  * token bytes) and inlines into whole-stage codegen via a static
  * call.
  *
  * EXACTNESS contract (what the q178 oracle replays): tokens are
  * `split(text, ' ')` with trailing empties kept (Spark's `split`
  * semantics — an empty text still contributes one empty token);
  * per token, v1/v2 are the first/second 8 hex digits of md5 read as
  * big-endian 32-bit values; the vote for fingerprint bit b reads bit
  * (4·(7 − b'/4) + b'%4) of its half (b' = b mod 32) — the exact
  * `sumBit` nibble map of the batch [[graft.operators.NearDup
  * .simHash64]]; bit b of the fingerprint is set iff its vote sum is
  * strictly positive. Equality with both the previous HOF form and
  * the batch aggregation form is spec-pinned. */
case class SimHash64Fp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("fp_hi", LongType, nullable = false),
    StructField("fp_lo", LongType, nullable = false)))

  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(v: Any): Any =
    SimHash64Fp.fp(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash64Fp.fp($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SimHash64Fp {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry shared by interpreted and generated paths. */
  def fp(s: UTF8String): InternalRow = {
    val votes = new Array[Int](64)
    val md = mdLocal.get()
    val str = s.toString
    val n = str.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        md.reset()
        val d = md.digest(str.substring(start, i)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val v1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val v2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        var b = 0
        while (b < 64) {
          val bb = if (b < 32) b else b - 32
          val src = if (b < 32) v1 else v2
          val pos = 4 * (7 - bb / 4) + bb % 4
          votes(b) += (if (((src >> pos) & 1L) == 1L) 1 else -1)
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < 32) { if (votes(b) > 0) lo |= 1L << b; b += 1 }
    while (b < 64) { if (votes(b) > 0) hi |= 1L << (b - 32); b += 1 }
    new GenericInternalRow(Array[Any](hi, lo))
  }
}
