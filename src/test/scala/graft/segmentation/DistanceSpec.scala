package graft.segmentation

import org.scalatest.funsuite.AnyFunSuite

class DistanceSpec extends AnyFunSuite {

  test("euclidean distance basics") {
    assert(Distance.euclidean(Array(0.0, 0.0), Array(3.0, 4.0)) === 5.0)
    assert(Distance.euclidean(Array(1.0), Array(1.0)) === 0.0)
  }

  test("euclidean truncates to shorter vector (reference zip semantics)") {
    // codeText.txt:66 zips the vectors: extra dims on either side are ignored
    assert(Distance.euclidean(Array(3.0, 4.0, 99.0), Array(0.0, 0.0)) === 5.0)
    assert(Distance.euclidean(Array(3.0), Array(0.0, 100.0)) === 3.0)
  }

  test("assign picks nearest centroid") {
    val cents = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    assert(Distance.assign(Array(1.0, 1.0), cents) === 0)
    assert(Distance.assign(Array(9.0, 9.0), cents) === 1)
  }

  test("assign tie-break: strict < means lowest index wins") {
    // point equidistant from both centroids (FIXTURES.md tie_point)
    val cents = Array(Array(0.0, 0.0), Array(2.0, 0.0))
    assert(Distance.assign(Array(1.0, 0.0), cents) === 0)
    // and with the duplicate-centroid degenerate init (codeText.txt:783)
    val dup = Array(Array(6.0, 4.0), Array(5.0, 16.0), Array(6.0, 4.0))
    assert(Distance.assign(Array(6.0, 4.0), dup) === 0)
  }

  test("clustersSame is exact, not tolerant") {
    val a = Array(Array(1.0, 2.0), Array(3.0, 4.0))
    val b = Array(Array(1.0, 2.0), Array(3.0, 4.0))
    val c = Array(Array(1.0, 2.0), Array(3.0, 4.0 + 1e-15))
    assert(Distance.clustersSame(a, b))
    assert(!Distance.clustersSame(a, c))
    assert(!Distance.clustersSame(a, a.take(1))) // shrunk k is not converged
    assert(Distance.clustersWithin(a, c, 1e-9))
  }

  test("property: assign returns the lowest index attaining the min distance") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val p = Array.fill(2)(rnd.nextDouble() * 100 - 50)
      val k = 1 + rnd.nextInt(6)
      // coarse grid so exact-equal ties actually occur
      val cs = Array.fill(k)(Array.fill(2)((rnd.nextInt(11) - 5).toDouble))
      val i = Distance.assign(p, cs)
      assert(i >= 0 && i < cs.length)
      val dmin = cs.map(c => Distance.sqDist(p, c)).min
      assert(Distance.sqDist(p, cs(i)) === dmin)
      assert(i === cs.indexWhere(c => Distance.sqDist(p, c) == dmin))
    }
  }
}
