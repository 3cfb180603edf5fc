package graft.operators

import graft.SparkSpec
import graft.functions.KmvKernels
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 8 // tiny bucket space so buckets genuinely collide

  /** Independent reference model: same tokens, hash, smoothing and floor
    * quantization, computed with plain Scala collections.
    */
  private def referenceScores(docs: Seq[(Long, String, String)], target: String)
      : Map[Long, (Long, Long)] = {
    def buckets(text: String): Seq[Long] =
      text.trim.split(" +").filter(_.nonEmpty).toSeq
        .map(t => KmvKernels.kmvKey(UTF8String.fromString(t)) % B)
    val all = docs.flatMap { case (id, lang, text) =>
      buckets(text).map(b => (id, lang, b))
    }
    val cr = all.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = all.filter(_._2 == target).groupBy(_._3)
      .view.mapValues(_.size.toLong).toMap
    val (nr, nt) = (all.size.toLong, all.count(_._2 == target).toLong)
    def lnNanos(c: Long, n: Long): Long =
      math.floor(math.log((c + 1).toDouble / (n + B).toDouble) * 1.0e9).toLong
    val wn = cr.keys.map { b =>
      b -> (lnNanos(ct.getOrElse(b, 0L), nt) - lnNanos(cr(b), nr))
    }.toMap
    all.groupBy(_._1).map { case (id, rows) =>
      id -> (rows.size.toLong, rows.map(r => wn(r._3)).sum)
    }
  }

  test("scores equal the independent floor-quantized reference model") {
    val docs = Seq(
      (1L, "en", "the quick brown fox"),
      (2L, "en", "the the the quick"),
      (3L, "de", "der schnelle braune fuchs"),
      (4L, "de", "the quick der fuchs"),
      (5L, "zh", ""),
      (6L, "en", "  quick   fox  "))
    val got = Dsir.importanceScores(
        docs.toDF("doc_id", "lang", "text"), col("lang") === "en", B)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val want = referenceScores(docs, "en")
    assert(got === want)
    assert(!got.contains(5L)) // token-less doc has no score row
  }

  test("target-typical docs outrank off-target docs") {
    // target tokens and raw-only tokens are disjoint, so any en-vocab doc
    // must score strictly higher than any de-vocab doc
    val docs = (1L to 20L).map(i => (i, "en", "alpha beta gamma delta")) ++
      (21L to 40L).map(i => (i, "de", "eins zwei drei vier"))
    val top = Dsir.topByImportance(
        docs.toDF("doc_id", "lang", "text"), col("lang") === "en", 20, B)
      .collect().map(_.getLong(0)).toSet
    assert(top === (1L to 20L).toSet)
  }

  test("the weight side stays bucket-sized (broadcast, not shuffled wide)") {
    val docs = Seq((1L, "en", "a b c"), (2L, "de", "d e f"))
    val plan = Dsir.importanceScores(
        docs.toDF("doc_id", "lang", "text"), col("lang") === "en", B)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected the 512-row weight table to broadcast:\n$plan")
  }
}
