package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  // strata of UNEQUAL depth: de has 2 docs, en has 3
  private def docs = Seq(
    ("en", 1L, 3.0), ("en", 2L, 2.0), ("en", 3L, 1.0),
    ("de", 10L, 2.0), ("de", 11L, 1.0)).toDF("lang", "doc_id", "q")

  test("round-robin across strata, best-first within each stratum") {
    val got = Curriculum.interleave(docs, "lang", "doc_id", col("q"), take = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // stratum_idx: de=0, en=1; pos = (rank-1)*2 + idx
    // de exhausts after rank 2, so pos 4 is a legitimate gap and en's rank-3
    // doc (pos 5) falls outside take=5
    assert(got === Array(
      (0L, "de", 10L), (1L, "en", 1L), (2L, "de", 11L), (3L, "en", 2L)))
  }

  test("positions are a bijection: no two docs collide") {
    val many = (1L to 200L).map(i => (s"s${i % 7}", i, (i * 31 % 50).toDouble))
      .toDF("lang", "doc_id", "q")
    val pos = Curriculum.interleave(many, "lang", "doc_id", col("q"), take = 100)
      .collect().map(_.getLong(0))
    assert(pos.distinct.length == pos.length)
    assert(pos.forall(_ < 100))
  }

  test("rank ties break by id ascending") {
    val tied = Seq(("en", 5L, 1.0), ("en", 2L, 1.0)).toDF("lang", "doc_id", "q")
    val got = Curriculum.interleave(tied, "lang", "doc_id", col("q"), take = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got === Array((0L, 2L), (1L, 5L)))
  }

  test("rank prunes before ordering: the final sort sees <= take rows") {
    val many = (1L to 500L).map(i => (s"s${i % 3}", i, i.toDouble))
      .toDF("lang", "doc_id", "q")
    val df = Curriculum.interleave(many, "lang", "doc_id", col("q"), take = 9)
    assert(df.count() == 9) // 3 strata x 3 ranks fill positions 0..8 exactly
    // the rank filter must sit below the position sort in the plan
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("rank"), plan)
  }
}
