package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst generator emitting the distinct 3-token shingles of a
  * text column — the row-expansion twin of [[DotProduct]]: where the typed
  * `flatMap` form pays a DeserializeToObject/SerializeFromObject boundary
  * around the lambda, a `Generator` runs inside `GenerateExec` directly on
  * InternalRow/UTF8String, so the scan → generate → aggregate pipeline
  * stays in Tungsten representation end to end.
  *
  * Same tokenization contract as the SQL oracle: split on single spaces
  * keeping empty tokens (`split(" ", -1)`), docs with < 3 tokens emit
  * nothing, per-document duplicates are dropped (insertion order kept).
  */
case class ShingleGenerator(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val t = v.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (t.length < 3) Nil
      else {
        val seen = new java.util.LinkedHashSet[String]((t.length - 2) * 2)
        var i = 0
        while (i <= t.length - 3) {
          seen.add(t(i) + " " + t(i + 1) + " " + t(i + 2))
          i += 1
        }
        val out = new Array[InternalRow](seen.size)
        val it = seen.iterator()
        var j = 0
        while (it.hasNext) {
          out(j) = InternalRow(UTF8String.fromString(it.next()))
          j += 1
        }
        out
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
