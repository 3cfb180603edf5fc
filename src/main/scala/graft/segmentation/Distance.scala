package graft.segmentation

/** Pure-Scala distance / assignment / convergence kernel.
  *
  * Semantics mirror the reference's driver-defined functions
  * (reference: codeText.txt:46-72):
  *  - Euclidean distance zips the two vectors and silently truncates to the
  *    shorter one (codeText.txt:66 uses `zip`).
  *  - Cluster assignment is argmin with a strict `<` comparison, so ties go
  *    to the lowest centroid index (codeText.txt:61-72).
  *  - Convergence is EXACT element equality, not epsilon tolerance
  *    (codeText.txt:46-49, np.array_equal).
  *
  * Kept free of any Spark dependency so it is trivially unit-testable and
  * usable both driver-side (convergence checks) and executor-side (inside
  * closures), though the distributed path builds Catalyst expressions
  * instead — see [[KMeansMR.assignExpr]].
  */
object Distance {

  /** Euclidean distance; truncates to the shorter vector like the reference's
    * `zip` (codeText.txt:66).
    */
  def euclidean(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var i = 0
    var acc = 0.0
    while (i < n) {
      val d = a(i) - b(i)
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  /** Squared Euclidean distance (same truncation semantics). */
  def sqDist(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var i = 0
    var acc = 0.0
    while (i < n) {
      val d = a(i) - b(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Argmin over distances to `centroids`, strict-`<` so the lowest index
    * wins ties (codeText.txt:61-72). Distance and squared distance share an
    * argmin, so this uses the cheaper squared form.
    */
  def assign(point: Array[Double], centroids: Array[Array[Double]]): Int = {
    require(centroids.nonEmpty, "assign() needs at least one centroid")
    var best = 0
    var bestD = sqDist(point, centroids(0))
    var j = 1
    while (j < centroids.length) {
      val d = sqDist(point, centroids(j))
      if (d < bestD) { best = j; bestD = d }
      j += 1
    }
    best
  }

  /** Exact-equality convergence test (codeText.txt:46-49). Lengths must match
    * too: a dropped (empty) cluster means "not converged" unless both sides
    * shrank identically.
    */
  def clustersSame(c1: Array[Array[Double]], c2: Array[Array[Double]]): Boolean =
    c1.length == c2.length &&
      c1.zip(c2).forall { case (a, b) => a.sameElements(b) }

  /** Tolerance variant (extension knob; default path is exact). */
  def clustersWithin(c1: Array[Array[Double]], c2: Array[Array[Double]], tol: Double): Boolean =
    c1.length == c2.length &&
      c1.zip(c2).forall { case (a, b) =>
        a.length == b.length && a.zip(b).forall { case (x, y) => math.abs(x - y) <= tol }
      }
}
