package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Generator}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst generator scoring one BLOCK PAIR of an all-pairs
  * cosine computation: children are two arrays of (vec_id, v) structs;
  * the output rows are every (vec_a < vec_b) pair across the two blocks
  * with rounded cosine ≥ `minCosine`.
  *
  * Why a generator and not a pair join: a row-per-pair nested-loop join
  * evaluates the scoring expression through the interpreted join-
  * condition path (BroadcastNestedLoopJoin is outside whole-stage
  * codegen), costing microseconds per pair. Here the pair loop is a
  * tight JIT'd Scala loop over primitive double arrays — the blocked
  * layout of dense all-pairs scoring (same shape as block matrix
  * multiply), with each block's vectors unpacked from ArrayData exactly
  * once per block-pair evaluation.
  *
  * Parity contract (must match the expression form and the DuckDB
  * oracle bit for bit): dot products sum left-to-right like
  * [[DotProduct]]; norms are sqrt(dot(v,v)); cosine is rounded
  * HALF_UP to 6 decimals like Spark's `round`; NaN cosines (zero-norm
  * vectors) pass the threshold, because SQL comparison semantics in
  * both engines order NaN above every number.
  */
case class CosineBlockPairs(left: Expression, right: Expression,
                            minCosine: Double)
    extends BinaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(
    StructField("vec_a", LongType, nullable = false) ::
    StructField("vec_b", LongType, nullable = false) ::
    StructField("cosine", DoubleType, nullable = false) :: Nil)

  override def prettyName: String = "graft_cosine_block_pairs"

  private def dot(x: Array[Double], y: Array[Double]): Double = {
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  /** Spark `round(_, 6)` on DoubleType: BigDecimal HALF_UP, with
    * non-finite values passed through. */
  private def round6(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def unpack(a: ArrayData): (Array[Long], Array[Array[Double]], Array[Double]) = {
    val n = a.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = a.getStruct(i, 2)
      ids(i) = r.getLong(0)
      vecs(i) = r.getArray(1).toDoubleArray()
      norms(i) = math.sqrt(dot(vecs(i), vecs(i)))
      i += 1
    }
    (ids, vecs, norms)
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) Nil
    else {
      val (idsA, vecsA, normsA) = unpack(a.asInstanceOf[ArrayData])
      val (idsB, vecsB, normsB) = unpack(b.asInstanceOf[ArrayData])
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      var i = 0
      while (i < idsA.length) {
        var j = 0
        while (j < idsB.length) {
          if (idsA(i) < idsB(j)) {
            val c = round6(dot(vecsA(i), vecsB(j)) / (normsA(i) * normsB(j)))
            // SQL comparison semantics, not Java's: Spark and DuckDB both
            // treat NaN as greater than any number, so a zero-norm vector
            // (NaN cosine) passes the threshold on the expression path
            // and must pass here too
            if (c.isNaN || c >= minCosine) out += InternalRow(idsA(i), idsB(j), c)
          }
          j += 1
        }
        i += 1
      }
      out
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
