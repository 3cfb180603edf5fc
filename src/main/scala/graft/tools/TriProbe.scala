package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables, IterState}

/** Phase-timing probe for q123_triangle_count — attributes the query's
  * wall time to its physical stages so plan work targets the real cost.
  * Usage: `runMain graft.tools.TriProbe <sfDir>`. Probe-only (not part of
  * the library surface); mirrors the exact construction in
  * [[graft.operators.Triangles.perVertexCounts]] with a count() after
  * each staged phase.
  */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("graft-triprobe")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    // q123's shipped edge build: sorted-distinct part pairs emitted
    // map-side from one groupBy(order)
    val rawPairs = li.groupBy(col("ok"))
      .agg(sort_array(collect_set(col("pk"))).as("ps"))
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps")) - i - lit(1)),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val pairs = timed("edges: pairgen (multiset)") {
      IterState.copyOut(rawPairs.filter(col("a") =!= col("b")))
    }
    println(s"  m = ${pairs.count()} edge slots (incl. cross-order dups)")
    val deg = pairs.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val withDeg = pairs
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val orient = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("s"),
      when(aFirst, col("b")).otherwise(col("a")).as("t"))
    val adj = timed("deg+orient+adj (stage)") {
      IterState.copyOut(orient.groupBy(col("s"))
        .agg(graft.functions.SetExprs.vdeltaPack(
          sort_array(collect_set(col("t")))).as("nbrs")))
    }
    val stats = adj.select(count(lit(1)).as("n"),
      sum(length(col("nbrs"))).as("bytes"), max(length(col("nbrs"))).as("mx"))
      .collect()(0)
    println(s"  adj: n=${stats.getLong(0)} packedBytes=${stats.getLong(1)} maxBytes=${stats.getInt(2)}")
    // probe-join skew evidence: the join is keyed by t, so its hot-key risk
    // is max IN-degree under orientation (hubs become targets); compare to
    // the median to adjudicate guide §2.5's 5-10x bar
    val inDeg = orient.groupBy(col("t")).agg(count(lit(1)).as("ind"))
    val Array(q50) = inDeg.stat.approxQuantile("ind", Array(0.5), 0.001)
    val mxIn = inDeg.agg(max(col("ind"))).collect()(0).getLong(0)
    val totDegMax = deg.agg(max(col("d"))).collect()(0).getLong(0)
    println(f"  probe-key skew: max in-degree=$mxIn median=$q50%.0f " +
      f"ratio=${mxIn / math.max(q50, 1.0)}%.1f  (max total degree=$totDegMax)")
    val probes = adj.select(col("s"), col("nbrs").as("nbrs_s"),
      explode(graft.functions.SetExprs.vdeltaUnpack(col("nbrs"))).as("t"))
    val closed = probes.join(
        adj.select(col("s").as("t"), col("nbrs").as("nbrs_t")).hint("shuffle_hash"),
        Seq("t"))
      .select(col("s"), col("t"),
        graft.functions.SetExprs.vdeltaIntersect(col("nbrs_s"), col("nbrs_t")).as("ws"))
      .filter(size(col("ws")) > 0)
    val staged = timed("probe joins + intersect") { IterState.copyOut(closed) }
    println(s"  closed edges = ${staged.count()}")
    val nTri = timed("credits explode + agg") {
      val vc = struct(col("s").as("v"), size(col("ws")).cast("bigint").as("c"))
      staged.select(explode(concat(
          array(vc, struct(col("t").as("v"), size(col("ws")).cast("bigint").as("c"))),
          transform(col("ws"), w => struct(w.as("v"), lit(1L).as("c"))))).as("e"))
        .select(col("e.v").as("v"), col("e.c").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("n_tri"))
        .agg(sum(col("n_tri"))).collect()(0).getLong(0)
    }
    println(s"  3*triangles = $nTri")
    IterState.purge(spark)
    spark.stop()
  }
}
