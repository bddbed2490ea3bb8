package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-local measurement (guide §1): the driver fixtures are ONE
  * parquet file with ONE row group per table, so every scan stage runs
  * as a single task — `local[32]` parallelism never reaches the
  * scan→join→partial-agg pipeline. This probe times the q11-shaped
  * star pipeline with and without a deterministic hash repartition
  * injected after the read (§2.5 "one huge unsplittable file …
  * repartition immediately after the read"), plus the bare decode and
  * bare shuffle, to split the unavoidable single-threaded work (decode
  * + shuffle write) from the parallelizable work (probe + decimal agg).
  *
  * Usage: runMain graft.tools.SplitProbe <sfDir> [reps]
  */
object SplitProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-34s min=${ts.min}%6.2f  runs=[${ts.map(t => f"$t%.2f").mkString(", ")}]")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val li = graft.engine.Sources.table(spark, dir, "lineitem")
    def star(fact: org.apache.spark.sql.DataFrame) = {
      val o = graft.engine.Sources.table(spark, dir, "orders")
      val joined = graft.engine.Joins.starBroadcast(
        fact.join(o, col("l_orderkey") === col("o_orderkey")),
        Seq(
          graft.engine.Sources.table(spark, dir, "customer") -> (col("o_custkey") === col("c_custkey")),
          graft.engine.Sources.table(spark, dir, "nation") -> (col("c_nationkey") === col("n_nationkey")),
          graft.engine.Sources.table(spark, dir, "region") -> (col("n_regionkey") === col("r_regionkey"))))
      joined.groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_items"),
          graft.engine.Aggregates.exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    }
    val rep = li.repartition(32, pmod(xxhash64(col("l_orderkey")), lit(3200)))

    time("scan->noop (decode floor)") { noop(li) }
    time("scan->shuffle->noop") { noop(rep) }
    time("star current (no repartition)") { noop(star(li)) }
    time("star with hash repartition") { noop(star(rep)) }
    // groupBy-only shape (the decimal tier: q83/q95/q152/q38/q39)
    def dec(fact: org.apache.spark.sql.DataFrame) = fact
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(graft.engine.Aggregates.exactSum(
        col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    time("decimal agg current") { noop(dec(li)) }
    time("decimal agg with repartition") { noop(dec(rep)) }

    // window shape (q15-class): the first exchange follows a cheap scan,
    // so injection can only add a hop — measure the loss
    def win(fact: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_suppkey"))
        .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
          col("l_partkey").asc, col("l_quantity").asc, col("l_extendedprice").asc)
      fact.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .withColumn("rn", row_number().over(w))
        .withColumn("rsum", sum(col("l_quantity")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    }
    time("window current") { noop(win(li)) }
    time("window with repartition") { noop(win(rep)) }

    // text shape (q110/q200-class): explode+agg over documents — per-row
    // work far above decode cost even though the file is small
    val docs = graft.engine.Sources.table(spark, dir, "documents")
    val docsRep = docs.repartition(32, pmod(xxhash64(col("doc_id")), lit(3200)))
    def lm(d: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalysis.unigramLogprob(d)
    time("unigram LM current") { noop(lm(docs)) }
    time("unigram LM with repartition") { noop(lm(docsRep)) }

    // tiny top-k shape (q14-class) over orders: injection pure overhead?
    val o2 = graft.engine.Sources.table(spark, dir, "orders")
    val o2rep = o2.repartition(32, pmod(xxhash64(col("o_orderkey")), lit(3200)))
    def topk(d: org.apache.spark.sql.DataFrame) =
      d.orderBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(20)
    time("topk current") { noop(topk(o2)) }
    time("topk with repartition") { noop(topk(o2rep)) }
    spark.stop()
  }
}
