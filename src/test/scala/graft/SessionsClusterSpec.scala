package graft
class SessionsClusterSpec extends SparkSpec {
  test("clusterBuilder carries engine semantics and scale knobs") {
    // assert on the builder's config map without creating a 2000-core session
    val b = Sessions.clusterBuilder(totalCores = 1000)
    val f = Iterator.iterate[Class[_]](b.getClass)(_.getSuperclass)
      .takeWhile(_ != null)
      .flatMap(_.getDeclaredFields.find(_.getName == "options"))
      .next()
    f.setAccessible(true)
    val opts = f.get(b).asInstanceOf[scala.collection.Map[String, String]]
    assert(opts("spark.sql.shuffle.partitions") === "2000")
    assert(opts("spark.sql.ansi.enabled") === "false")
    assert(opts("spark.sql.extensions") === classOf[GraftExtensions].getName)
    assert(opts("spark.sql.adaptive.skewJoin.enabled") === "true")
  }
}
