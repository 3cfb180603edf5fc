package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank in EXACT integer arithmetic — the Pregel-as-joins
  * pattern ([[graft.dedup.ConnectedComponents]]'s shape with a sum instead
  * of a min): per iteration, ranks flow along edges (one join), contributions
  * aggregate per destination (one partial-agg shuffle), and the damping
  * update is a left join back onto the node set. Ranks are millionths
  * (start = 1_000_000 per node; update r' = 0.15 + 0.85 * Σ r_v / deg_v in
  * scaled integers with truncating division), so every step is
  * order-independent long arithmetic that a SQL oracle can replay term for
  * term — no float reduction anywhere.
  *
  * 100 TB shape: per iteration exactly one edge-keyed join and one
  * dst-keyed aggregate; the edge list (with out-degrees attached once) is
  * the only large operand and is reused across iterations; ranks are
  * 16 B/node. [[graft.IterState.checkpoint]] after each iteration caps plan
  * growth the same way the label-propagation loop does, each iteration
  * releasing the previous one's blocks once the new ranks are materialized;
  * the final ranks are copied out file-backed so no block-manager state
  * survives the call. Magnitudes are bounded by the
  * conserved total mass (n_nodes * 10^6), so the scaled multiply stays far
  * inside a signed long for any graph below ~10^12 nodes.
  */
object PageRank {

  /** (id, rank_millionths) after `iterations` damped rounds over the
    * directed edge list (`s` → `d`). Every node appearing as a source or
    * destination participates; dangling mass is not redistributed (nodes
    * with no in-edges keep the 0.15 floor), matching the plain power-iter
    * formulation the oracle unrolls.
    */
  def ranksMillionths(edges: DataFrame, iterations: Int,
                      checkpoint: Boolean = true): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    val e = edges.select(col("s").cast("long").as("s"), col("d").cast("long").as("d"))
    val deg = e.groupBy(col("s")).agg(count(lit(1)).as("dg"))
    val ewd = e.join(deg, "s").persist()
    val nodes = e.select(col("s").as("id"))
      .union(e.select(col("d").as("id"))).distinct().persist()
    var ranks = nodes.withColumn("r", lit(1000000L))
    var releaseRanks: () => Unit = () => ()
    for (_ <- 1 to iterations) {
      val contribs = ewd.join(ranks, ewd("s") === ranks("id"))
        .select(col("d"), expr("r div dg").as("c"))
        .groupBy(col("d")).agg(sum(col("c")).as("cs"))
      val next = nodes.join(contribs, nodes("id") === contribs("d"), "left")
        .select(nodes("id"),
          expr("150000L + (850000L * coalesce(cs, 0L)) div 1000000L").as("r"))
      if (checkpoint) {
        val (ck, rel) = graft.IterState.checkpoint(next)
        releaseRanks() // ck is materialized; previous iteration's blocks go
        ranks = ck
        releaseRanks = rel
      } else ranks = next
    }
    val res = ranks.select(col("id"), col("r").as("rank_millionths"))
    if (checkpoint) {
      val out = graft.IterState.copyOut(res)
      releaseRanks()
      ewd.unpersist()
      nodes.unpersist()
      out
    } else {
      ewd.unpersist()
      nodes.unpersist()
      res
    }
  }
}
