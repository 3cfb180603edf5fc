package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Truth tables for the sorted-set kernels: merge-intersection vs the
  * built-in, and the varint-delta codec (round-trip, multi-byte deltas,
  * packed intersection equivalence, wire-size claim).
  */
class SetExprsSpec extends SparkSpec {
  import spark.implicits._

  private def df(a: Seq[Long], b: Seq[Long]) =
    Seq((a, b)).toDF("a", "b")

  test("sorted_intersect equals array_intersect on sorted inputs") {
    val cases = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(2L, 3L, 6L, 7L, 9L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(4L), Seq(4L)),
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)))
    cases.foreach { case (a, b) =>
      val got = df(a, b)
        .select(SetExprs.sortedIntersect(col("a"), col("b")))
        .head.getSeq[Long](0)
      assert(got == a.intersect(b), s"$a ^ $b")
    }
  }

  test("vdelta round-trip: identity for sorted sets incl. multi-byte deltas") {
    val cases = Seq(
      Seq.empty[Long],
      Seq(0L),
      Seq(5L, 6L, 7L),
      Seq(127L, 128L, 300L, 16384L, 1L << 40, (1L << 40) + 1),
      (0L until 100L).map(_ * 999983L).toSeq) // ~20-bit deltas
    cases.foreach { a =>
      val got = Seq(Tuple1(a)).toDF("a")
        .select(SetExprs.vdeltaUnpack(SetExprs.vdeltaPack(col("a"))))
        .head.getSeq[Long](0)
      assert(got == a, s"round-trip $a")
    }
  }

  test("vdelta_intersect equals sorted_intersect on every pair") {
    val sets = Seq(
      Seq(1L, 3L, 5L, 1000000L, 1000001L),
      Seq(3L, 5L, 9L, 1000001L),
      Seq.empty[Long],
      (0L until 64L).map(_ * 12345L).toSeq)
    for (a <- sets; b <- sets) {
      val got = df(a, b)
        .select(SetExprs.vdeltaIntersect(
          SetExprs.vdeltaPack(col("a")), SetExprs.vdeltaPack(col("b"))))
        .head.getSeq[Long](0)
      assert(got == a.intersect(b), s"$a ^ $b")
    }
  }

  test("packing a dense-range neighbor list is ~3 bytes/element") {
    // ids spaced ~33k apart (the sf1 adjacency profile): 3-byte varints
    val a = (0L until 60L).map(_ * 33000L + 7L)
    val bytes = Seq(Tuple1(a)).toDF("a")
      .select(length(SetExprs.vdeltaPack(col("a")))).head.getInt(0)
    assert(bytes <= 3 * 60, s"packed $bytes bytes")
  }
}
