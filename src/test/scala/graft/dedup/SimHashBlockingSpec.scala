package graft.dedup

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** End-to-end check that the q77 blocking gate actually exercises the
  * pigeonhole claim beyond distance 0: the planted perturbation must move
  * at least one signature into Hamming [1, 3] — otherwise the maxHamming=3
  * recovery gate would be vacuously satisfiable by a blocker that only
  * finds exact signature matches. Uses the SAME fixture builder as the q77
  * query ([[graft.SparkEntry.simhashGateCorpus]]) so a fixture tweak there
  * cannot silently de-fang the gate while this spec keeps passing.
  */
class SimHashBlockingSpec extends SparkSpec {

  /** Each planted pair's DIRECT signature distance (no blocking). */
  private def plantedDistances(sfDir: String): Map[Long, Int] = {
    val (base, perturbed) = graft.SparkEntry.simhashGateCorpus(
      Tables.documents(spark, sfDir))
    val sigs = SimHashDedup.signatures(base.unionByName(perturbed))
    base.select(col("doc_id").as("id1"), (col("doc_id") + 1000000).as("id2"))
      .join(sigs.select(col("id").as("id1"), col("sim").as("s1")), Seq("id1"))
      .join(sigs.select(col("id").as("id2"), col("sim").as("s2")), Seq("id2"))
      .select(col("id1"), bit_count(col("s1").bitwiseXOR(col("s2"))).as("d"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("q77 fixture is non-vacuous: planted pairs populate Hamming [1, 3]") {
    val dists = plantedDistances(sf("sf0.001"))
    info(s"hamming histogram: ${dists.values.groupBy(identity).view.mapValues(_.size).toMap.toSeq.sorted}")
    assert(dists.size === 20)
    assert(dists.values.exists(d => d >= 1 && d <= 3),
      s"no planted pair landed in Hamming [1,3] — gate is vacuous: $dists")
    // the far side of the boundary must be populated too, or the "verify
    // may not ADMIT a far pair" half of q77's gate is vacuously true
    assert(dists.values.exists(_ > 3),
      s"no planted pair landed at Hamming > 3 — admit-side gate is vacuous: $dists")
  }

  test("blocking at maxHamming=3 recovers EXACTLY the pairs at direct distance <= 3") {
    val (base, perturbed) = graft.SparkEntry.simhashGateCorpus(
      Tables.documents(spark, sf("sf0.001")))
    val recovered = SimHashDedup.nearDuplicates(base.unionByName(perturbed), maxHamming = 3)
      .filter(col("id2") - col("id1") === 1000000)
      .collect().map(r => r.getLong(0)).toSet
    val expected = plantedDistances(sf("sf0.001")).filter(_._2 <= 3).keySet
    assert(recovered === expected)
  }
}
