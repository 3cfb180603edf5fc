package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  test("A-ES key matches the exact sqrt-chain model for every weight") {
    val ids = Seq(0L, 1L, 7L, 12345L, (1L << 31) - 1, (1L << 31) + 3, 1L << 62)
    for (w <- Seq(1, 2, 4)) {
      val got = ids.toDF("id")
        .select(WeightedSample.aresKey($"id", lit(w)).as("k"))
        .as[Double].collect()
      ids.zip(got).foreach { case (id, k) =>
        val hv = (BigInt(id) * Mixing.A).mod(BigInt(Mixing.M)).toLong
        val u = (hv + 1).toDouble / Mixing.M.toDouble
        val expect = w match {
          case 4 => math.sqrt(math.sqrt(u))
          case 2 => math.sqrt(u)
          case _ => u
        }
        assert(k === expect, s"id=$id w=$w")
      }
    }
  }

  test("per-stratum budget is exact and ordered; heavier docs over-selected") {
    val d = Tables.documents(spark, sf("sf0.01"))
      .select($"doc_id", $"lang", $"n_chars")
    val weight = when($"n_chars" > 500, lit(4))
      .when($"n_chars" > 200, lit(2)).otherwise(lit(1))
    val sampled = WeightedSample.topKPerStratum(d, "lang", weight, k = 10)
    val perLang = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    val langSizes = d.groupBy("lang").count().as[(String, Long)].collect().toMap
    langSizes.foreach { case (lang, n) =>
      assert(perLang(lang) === math.min(10L, n), lang)
    }
    // ranks are 1..k and scores non-increasing within a stratum
    val rows = sampled.select($"lang", $"rank", $"score")
      .as[(String, Int, Double)].collect().groupBy(_._1)
    rows.values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      })
    }
    // weight-4 docs should win a larger share of the sample than their
    // share of the corpus (the point of weighting)
    val heavy = d.filter($"n_chars" > 500).select("doc_id").as[Long].collect().toSet
    val corpusShare = heavy.size.toDouble / d.count()
    val winners = sampled.select("doc_id").as[Long].collect()
    val sampleShare = winners.count(heavy).toDouble / winners.length
    assert(sampleShare > corpusShare, s"sample=$sampleShare corpus=$corpusShare")
  }
}
