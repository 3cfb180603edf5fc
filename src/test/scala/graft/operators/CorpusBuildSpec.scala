package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed five-stage composition: every stage count and every card
  * number on a corpus engineered so each stage drops EXACTLY one known doc
  * kind — a near-dup loser, an exact-dup loser, a contaminated doc — and
  * the pack boundaries are forced by a small shard size.
  *
  * Lang counts are BALANCED (6 en / 6 de) so the temperature rates are both
  * exactly 1.0 and the mix stage is the identity here (the computed-rate
  * path is oracle-gated corpus-wide by q152/q153); doc 104 shares an
  * 8-gram with eval doc 0 but sits at 3-gram Jaccard 6/30 = 0.2 < 0.3, so
  * it must survive near-dup dedup and then fall to decontamination — the
  * case that distinguishes the two stages.
  */
class CorpusBuildSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // eval slice (doc_id < 50)
    (0L, "a b c d e f g h i j", "en", "test"),
    (1L, "q r s t u v", "en", "test"),
    // en train: near-dup pair (60, 61), exact-dup pair (62, 63)
    (60L, "m n o p m2 n2 o2 p2 m3 n3", "en", "test"),
    (61L, "m n o p m2 n2 o2 p2 m3 zz", "en", "test"),
    (62L, "dup dup2 dup3 dup4 dup5", "en", "test"),
    (63L, "dup dup2 dup3 dup4 dup5", "en", "test"),
    // de train: four clean docs, one contaminated, one clean
    (100L, "d1a d1b d1c d1d", "de", "test"),
    (101L, "d2a d2b d2c d2d", "de", "test"),
    (102L, "d3a d3b d3c d3d", "de", "test"),
    (103L, "d4a d4b d4c d4d", "de", "test"),
    (104L, ("a b c d e f g h " +
      (1 to 22).map(i => s"w$i").mkString(" ")), "de", "test"),
    (105L, "zza zzb zzc zzd", "de", "test"))
    .toDF("doc_id", "text", "lang", "source")

  test("each stage drops exactly its doc; card numbers are exact") {
    val row = CorpusBuild.card(docs, shardTokens = 16L).collect()(0)
    def l(n: String): Long = row.getAs[Long](n)
    assert(l("n_mixed") === 12, "balanced langs -> rate 1.0 -> identity mix")
    assert(l("n_exact") === 11, "exact dedup drops 63 (md5 twin of 62)")
    assert(l("n_clean") === 10, "near-dup components drop 61 (jaccard 7/9)")
    assert(l("n_contaminated") === 1, "decon drops 104 (shares an 8-gram with eval doc 0)")
    assert(l("n_docs") === 7 && l("total_tokens") === 35 && l("max_tokens") === 10)
    assert(l("n_langs") === 2 && l("n_sources") === 1)
    assert(row.getAs[Double]("mean_tokens") === 5.0)
    // pack at 16: en = one 15-token shard; de = 16 + 4 across two shards
    assert(l("n_shards") === 3 && l("max_shard_tokens") === 16)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "CorpusBuild must leave no block-manager state (IterState discipline)")
  }

  test("a whole-stratum slice reports only that stratum's card") {
    val row = CorpusBuild.card(docs, slice = col("doc_id") >= 100,
      shardTokens = 16L).collect()(0)
    def l(n: String): Long = row.getAs[Long](n)
    assert(l("n_mixed") === 6 && l("n_exact") === 6 && l("n_clean") === 6)
    assert(l("n_contaminated") === 1 && l("n_docs") === 5)
    assert(l("total_tokens") === 20 && l("max_tokens") === 4)
    assert(l("n_langs") === 1 && l("n_sources") === 1)
    assert(row.getAs[Double]("mean_tokens") === 4.0)
    assert(l("n_shards") === 2 && l("max_shard_tokens") === 16)
  }
}
