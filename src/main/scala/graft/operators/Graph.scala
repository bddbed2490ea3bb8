package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that
  * turns pairwise near-duplicate CANDIDATES (minhash/simhash/jaccard
  * pairs) into duplicate CLUSTERS a dedup pass can act on: keep one
  * canonical document per component, drop the rest.
  *
  * An extension beyond reference parity (the reference has no graph
  * surface); standard in training-data pipelines, where transitive
  * closure matters (A≈B, B≈C ⇒ {A,B,C} is one duplicate group even if
  * A≉C pairwise).
  */
object Graph {

  /** Label every node with the smallest node id reachable from it
    * (`component`), via iterative min-label propagation:
    *
    *   labels ← node id; repeat: label(n) ← min over m ∈ N(n) ∪ {n}
    *   of label(m) until a fixpoint.
    *
    * The self-loop rows added to the edge table make each round exactly
    * ONE join + min-aggregate (no separate "keep my own label" left
    * join), and the edge table is hash-partitioned on the label-source
    * key once up front, so each round shuffles only the label side
    * (O(nodes)) plus the aggregate — fully distributed, nothing on the
    * driver. Convergence is detected by an exact DECIMAL sum of labels:
    * labels only ever decrease, so an unchanged sum ⟺ fixpoint, one
    * scalar job per round instead of a change-count join. Rounds needed
    * = the graph diameter, small for near-dup graphs (duplicate groups
    * are near-cliques, typically 2–4 rounds). `localCheckpoint` cuts
    * the lineage each round so the plan does not grow with iteration
    * count (at cluster scale, use a reliable checkpoint dir instead;
    * for adversarially long path graphs, the alternating large-star /
    * small-star variant [Kiveris et al., "Connected Components in
    * MapReduce and Beyond"] bounds rounds at O(log n) — same join
    * shape, different edge rewrite).
    *
    * Input: `edges` with two node-id columns; direction is ignored.
    * Duplicate edges are harmless (min is idempotent) — they inflate
    * the per-round join input, so pre-`distinct` heavily duplicated
    * edge sets. Output: (`n`, `component`) for every node appearing in
    * any edge.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 50): DataFrame = {
    // checkpoint the projected edge list BEFORE symmetrizing: the union
    // references it twice, and an unmaterialized subtree would evaluate
    // the (possibly expensive) upstream pair pipeline once per branch
    val e1 = edges.select(col(srcCol).as("n"), col(dstCol).as("m"))
      .localCheckpoint()
    // symmetric relation; input pairs (a<b) are unique by convention so
    // the two directions never collide
    val sym = e1.union(e1.select(col("m").as("n"), col("n").as("m")))
    var labels = sym.select(col("n")).distinct()
      .withColumn("lbl", col("n"))
      .localCheckpoint()
    // self-loops fold "own label" into the neighbour min; partition on
    // the join key once so rounds reuse the exchange
    val symSelf = sym
      .union(labels.select(col("n"), col("n").as("m")))
      .repartition(col("m"))
      .localCheckpoint()
    // exact decimal: monotone decreasing, overflow-free at any scale;
    // sum over an EMPTY frame is NULL → normalize to zero so a pairless
    // input converges to the empty result instead of an NPE
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val s = df.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s
    }
    var prevSum = labelSum(labels)
    var converged = prevSum.signum == 0 && labels.isEmpty
    var i = 0
    while (!converged && i < maxIter) {
      // propagate: min label over neighbours ∪ self
      val prop = symSelf
        .join(labels.select(col("n").as("m"), col("lbl")), "m")
        .groupBy(col("n")).agg(min(col("lbl")).as("lbl"))
      // pointer-jump: lbl(n) ← lbl(lbl(n)). Labels are node ids, so the
      // self-join resolves one extra hop per round, turning O(diameter)
      // rounds into O(log diameter) — the sf0.1 near-dup graph needs 5
      // combined rounds where plain propagation needed 13. Catalyst
      // reuses `prop`'s exchange for both sides (ReusedExchange), so
      // the jump costs one extra tiny join, not a recompute.
      labels = prop.as("x")
        .join(prop.select(col("n").as("j"), col("lbl").as("jl")),
          col("x.lbl") === col("j"), "left")
        .select(col("x.n").as("n"), coalesce(col("jl"), col("x.lbl")).as("lbl"))
        .localCheckpoint()
      val s = labelSum(labels)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      i += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "graph diameter exceeds the bound; raise maxIter or switch to " +
        "the large-star/small-star variant")
    labels.select(col("n"), col("lbl").as("component"))
  }

  /** The dedup application of [[connectedComponents]]: given documents
    * and near-dup candidate pairs, keep each component's smallest
    * doc id as canonical and return the surviving corpus (canonical
    * docs + everything untouched by any pair). Anti-join ships only
    * the non-canonical id set. */
  def dedupSurvivors(docs: DataFrame, idCol: String, pairs: DataFrame,
                     aCol: String, bCol: String): DataFrame = {
    val dropIds = connectedComponents(pairs, aCol, bCol)
      .filter(col("n") =!= col("component"))
      .select(col("n"))
    docs.join(dropIds, docs(idCol) === dropIds("n"), "left_anti")
  }
}
