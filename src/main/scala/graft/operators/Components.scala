package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering step a
  * dedup pipeline needs after pair generation ([[Dedup.ngramJaccard]] /
  * [[Dedup.minHashLsh]] emit pairs; picking one survivor per duplicate
  * GROUP requires the transitive closure: a~b, b~c ⇒ {a,b,c} share one
  * canonical id). The reference's upsert (`dags/jira/db_ops.py:29-43`)
  * collapses exact key matches only; this generalizes to similarity edges.
  *
  * Algorithm: iterative min-label propagation to a fixpoint. Labels are
  * monotonically non-increasing, so convergence needs at most `diameter`
  * rounds; near-dup clusters in practice have diameter ≤ 3 (a dup of a dup
  * of X is still a near-dup of X), so the loop runs 2–4 shuffles total.
  *
  * 100 TB posture: each round is one equi-join on the edge src + one
  * map-side-combined min-agg — both hash-partitioned on id, no cross
  * product, edge list persisted once. The driver-side loop only compares
  * two scalar counts per round (no collect of data rows). For adversarial
  * high-diameter graphs (paths of length k force k rounds) the production
  * fix is the large-star/small-star contraction of Kiveris et al.
  * ("Connected Components in MapReduce and Beyond", SoCC'14), which
  * converges in O(log²Δ) rounds; not needed for dedup-shaped graphs.
  */
object Components {

  /** (id, cluster) for every node incident to an edge; cluster = min node
    * id reachable. Input columns `srcCol`/`dstCol`; direction is ignored.
    */
  def connectedComponents(edges: DataFrame, srcCol: String,
      dstCol: String, maxIters: Int = 20): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
    val both = e.union(e.select(col("d").as("s"), col("s").as("d"))).persist()
    // localCheckpoint (not persist): each round's frame derives from the
    // last, so without lineage truncation the logical plan doubles per
    // round — analysis alone goes exponential past ~10 rounds. On a real
    // cluster swap for reliable checkpoint(): localCheckpoint pins lineage
    // to executor block storage and does not survive executor loss.
    // labels only ever decrease ⇒ fixpoint iff the label multiset is
    // unchanged; sum(cluster) is a sufficient monotone witness and costs
    // one scalar per round (carried forward, not recomputed) instead of a
    // row-level diff join. Decimal sum: a long sum of ~10^12 node ids
    // would overflow at cluster scale.
    val wit = sum(col("cluster").cast("decimal(38,0)"))
    var labels = both.select(col("s").as("id"), col("s").as("cluster"))
      .groupBy("id").agg(min("cluster").as("cluster")).localCheckpoint()
    var witness = labels.agg(wit).first().getDecimal(0)
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      // label(x) := min(label(x), min over neighbors n of label(n))
      val prop = labels.join(both, labels("id") === both("s"))
        .select(col("d").as("id"), col("cluster"))
      val next = labels.select("id", "cluster").union(prop)
        .groupBy("id").agg(min("cluster").as("cluster")).localCheckpoint()
      val nextWitness = next.agg(wit).first().getDecimal(0)
      labels = next
      converged = witness == nextWitness
      witness = nextWitness
      iters += 1
    }
    both.unpersist()
    labels
  }
}
