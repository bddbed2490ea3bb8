package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy hitters [Metwally et al., "Efficient Computation
  * of Frequent and Top-k Elements in Data Streams"] as a Catalyst
  * `TypedImperativeAggregate` — the last rung of the custom-aggregate
  * ladder (after `Aggregator` in SlopeAggregator): an arbitrary
  * JVM-object buffer with explicit serialize/merge, the shape Spark
  * itself uses for HLL++ and percentile_approx.
  *
  * The buffer holds at most `k` counters. Seeing a tracked item
  * increments it; an untracked item replaces the MINIMUM counter,
  * inheriting its count as overestimation `error`. Guarantees: any item
  * with true count > n/k IS present, and for every reported item
  * `count − error ≤ true ≤ count`. Memory is O(k) per partition
  * regardless of cardinality — the bounded-state analog of groupBy
  * count for "what are the top domains/tokens in 100 TB".
  *
  * Merge (partial aggregation) sums counts of the union and re-prunes
  * to k by inflating absent-side counts with that side's minimum — the
  * standard mergeable-summaries construction; bounds still hold.
  *
  * Output: array<struct<item string, cnt long, err long>> sorted by
  * (cnt desc, item asc) — deterministic for a deterministic input
  * ORDER of merges? No: like every sketch, tie handling under
  * different partition splits can differ, so this is test-gated by its
  * ERROR BOUNDS (q36-style), not by a hash oracle.
  */
case class SpaceSaving(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, (Long, Long)]] {
  require(k > 1, "space-saving needs k > 1 counters")

  type Buf = scala.collection.mutable.HashMap[String, (Long, Long)]

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.HashMap.empty

  private def pruneToK(b: Buf): Unit =
    while (b.size > k) {
      val (minItem, _) = b.minBy { case (i, (c, _)) => (c, i) }
      b.remove(minItem)
    }

  override def update(b: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      b.get(item) match {
        case Some((c, e)) => b.update(item, (c + 1, e))
        case None if b.size < k => b.update(item, (1L, 0L))
        case None =>
          val (minItem, (minC, _)) = b.minBy { case (i, (c, _)) => (c, i) }
          b.remove(minItem)
          b.update(item, (minC + 1, minC))
      }
    }
    b
  }

  override def merge(b: Buf, other: Buf): Buf = {
    val minB = if (b.size < k) 0L else b.values.map(_._1).min
    val minO = if (other.size < k) 0L else other.values.map(_._1).min
    val items = b.keySet ++ other.keySet
    val merged: Buf = scala.collection.mutable.HashMap.empty
    items.foreach { i =>
      val (cB, eB) = b.getOrElse(i, (minB, minB))
      val (cO, eO) = other.getOrElse(i, (minO, minO))
      merged.update(i, (cB + cO, eB + eO))
    }
    pruneToK(merged)
    merged
  }

  override def eval(b: Buf): Any = {
    val rows = b.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.map {
      case (i, (c, e)) =>
        InternalRow(UTF8String.fromString(i), c, e)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(b: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (i, (c, e)) =>
      val bytes = i.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b: Buf = scala.collection.mutable.HashMap.empty
    (1 to n).foreach { _ =>
      val len = in.readInt()
      val arr = new Array[Byte](len); in.readFully(arr)
      b.update(new String(arr, "UTF-8"), (in.readLong(), in.readLong()))
    }
    b
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType),
    StructField("err", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): SpaceSaving =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSaving =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "graft_heavy_hitters"
}

object SpaceSaving {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  /** Column form: `approxHeavyHitters(col("domain"), 64)` aggregates to
    * the top-≤k (item, cnt, err) array. */
  def approxHeavyHitters(col: Column, k: Int): Column =
    GraftSqlBridge.column(
      SpaceSaving(GraftSqlBridge.expression(col), k).toAggregateExpression())
}
