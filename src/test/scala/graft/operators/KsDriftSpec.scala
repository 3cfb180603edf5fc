package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-math truth tables for the bucketed two-sample KS statistic:
  * identical slices score 0, disjoint slices score 1, and a hand-sized
  * example matches a driver-side replay of the same integer arithmetic.
  */
class KsDriftSpec extends SparkSpec {
  import spark.implicits._

  private def ksOf(rows: Seq[(String, Double)], centsPerBucket: Int = 100)
      : (Long, Long, Long, Double) = {
    val r = KsDrift.ks(rows.toDF("side", "v"), "side", "A", "B", "v",
      centsPerBucket).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
  }

  test("identical distributions: ks = 0") {
    val vals = Seq(1.0, 2.5, 2.5, 7.75, 30.0)
    val (na, nb, _, ks) =
      ksOf(vals.map(("A", _)) ++ vals.map(("B", _)))
    assert((na, nb) == (5L, 5L))
    assert(ks == 0.0)
  }

  test("disjoint distributions: ks = 1 at A's last bucket") {
    val (na, nb, at, ks) = ksOf(
      Seq(("A", 1.0), ("A", 2.0), ("B", 100.0), ("B", 250.0), ("B", 251.0)))
    assert((na, nb) == (2L, 3L))
    assert(ks == 1.0)
    assert(at == 2L) // bucket of 2.0 cents=200 / 100
  }

  test("hand example matches the exact integer replay") {
    // A: buckets 0,0,1  B: buckets 0,2 — cumulative gaps (x3 resp x2):
    // b0: |2*2-1*3|=1, b1: |3*2-1*3|=3, b2: |3*2-2*3|=0 -> max 3 at b1
    val (na, nb, at, ks) = ksOf(
      Seq(("A", 0.10), ("A", 0.20), ("A", 1.10), ("B", 0.30), ("B", 2.50)))
    assert((na, nb) == (3L, 2L))
    assert(at == 1L)
    assert(ks == 0.5) // 3 / (3*2)
  }

  test("unmatched side values are ignored; bucket boundaries are exact") {
    val (na, nb, _, ks) = ksOf(
      Seq(("A", 0.99), ("B", 1.00), ("C", 500.0)), centsPerBucket = 100)
    // 0.99 -> cents 99 -> bucket 0; 1.00 -> cents 100 -> bucket 1
    assert((na, nb) == (1L, 1L))
    assert(ks == 1.0)
  }
}
