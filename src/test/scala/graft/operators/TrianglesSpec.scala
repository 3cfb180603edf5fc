package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Truth tables for the degree-oriented triangle counter: known closed
  * forms (K_n, path, star), duplicate/reversed-edge tolerance, and the
  * orientation-invariance claim the q123 oracle relies on.
  */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perVertexCounts(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: every vertex sits in C(3,2)=3 triangles; 4 triangles total") {
    val k4 = for {
      i <- 0L to 3L; j <- (i + 1) to 3L
    } yield (i, j)
    val c = counts(k4)
    assert(c == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    assert(c.values.sum / 3 == 4)
  }

  test("path and star graphs are triangle-free") {
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    assert(counts(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))).isEmpty)
  }

  test("duplicate and reversed edges do not inflate counts") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val noisy = tri ++ tri.map(_.swap) ++ tri
    assert(counts(noisy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangle-with-tail: only the cycle vertices count") {
    // 1-2-3 triangle plus pendant 4 off vertex 3 (degree tie-breaks hit
    // the (degree, id) secondary order)
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(counts(g) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two triangles sharing an edge: shared endpoints count twice") {
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
    assert(counts(g) == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("hub skew: wedge enumeration never explodes at the hub") {
    // star hub 0 with 40 spokes + one triangle hanging off two spokes.
    // With degree orientation the hub (degree 41) ranks last — it is the
    // TARGET of every oriented edge and enumerates zero wedges; the
    // result must still find exactly the one planted triangle.
    val star = (1L to 40L).map(i => (0L, i))
    val g = star ++ Seq((1L, 2L))
    assert(counts(g) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }
}
