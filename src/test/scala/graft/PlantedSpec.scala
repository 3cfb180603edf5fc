package graft

import org.scalatest.funsuite.AnyFunSuite

/** Construction invariants of the planted gate corpus — driver-side
  * recomputation of the closed forms the q140–q146 oracles assert, so a
  * drift in the generator breaks HERE before it breaks a gate.
  */
class PlantedSpec extends AnyFunSuite {

  private def shingles(text: String, n: Int): Set[String] = {
    val tk = text.trim.split(" +").toSeq
    if (tk.length >= n) tk.sliding(n).map(_.mkString(" ")).toSet
    else Set(tk.mkString(" "))
  }

  private def jaccard(a: Set[String], b: Set[String]): Double =
    a.intersect(b).size.toDouble / a.union(b).size

  test("doc groups realize exactly the closed-form 3/5-gram jaccards") {
    val byId = Planted.docRows.map(r => r._1 -> r._2).toMap
    for {
      g <- 0 until Planted.nearGroups
      m1 <- 0 until Planted.groupSize(g)
      m2 <- (m1 + 1) until Planted.groupSize(g)
    } {
      val (t1, t2) = (byId(Planted.base + g * 10 + m1), byId(Planted.base + g * 10 + m2))
      val want3 = 28.0 / (if (m1 == 0) 29 else 30)
      assert(jaccard(shingles(t1, 3), shingles(t2, 3)) === want3, s"g=$g $m1-$m2")
      val s5a = shingles(t1, 5); val s5b = shingles(t2, 5)
      assert(s5a.intersect(s5b).size === 26)
      assert(s5a.union(s5b).size === (if (m1 == 0) 27 else 28))
    }
  }

  test("vocabulary is disjoint across planted groups (no cross-group pairs)") {
    val texts = Planted.docRows.map(r => (r._1, r._2))
    val vocab = texts.map { case (id, t) => (id / 10) -> t.split(" ").toSet }
      .groupBy(_._1).view.mapValues(_.flatMap(_._2).toSet).toMap
    val keys = vocab.keys.toSeq
    for (i <- keys.indices; j <- (i + 1) until keys.size)
      assert(vocab(keys(i)).intersect(vocab(keys(j))).isEmpty,
        s"groups ${keys(i)} and ${keys(j)} share vocabulary")
  }

  test("chain constants: 58 kept docs, 1441 kept tokens, 145 planted docs") {
    assert(Planted.docCount === 145L)
    // kept = the min-id member of every group/pair + singletons — in this
    // construction exactly the slot-0 ids
    val kept = Planted.docRows.filter { case (id, _, _, _, _) =>
      (id - Planted.base) % 10 == 0
    }
    assert(kept.size === Planted.nearGroups + Planted.exactPairs + Planted.singletons)
    assert(kept.size === 58)
    val tokens = kept.map(_._2.split(" ").length.toLong).sum
    assert(tokens === 1441L)
  }

  test("customer names: within-group distance 1, cross-group >= 2") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rows = Planted.customerRows
    for (i <- rows.indices; j <- (i + 1) until rows.size) {
      val ((id1, n1), (id2, n2)) = (rows(i), rows(j))
      val sameGroup = (id1 - Planted.base) / 10 == (id2 - Planted.base) / 10
      val d = lev(n1, n2)
      if (sameGroup) assert(d === 1, s"$n1 / $n2")
      else assert(d >= 2, s"$n1 / $n2 are cross-group at distance $d")
    }
  }
}
