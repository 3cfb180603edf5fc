package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SoftDedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta", "en"),
    (2L, "alpha beta", "en"),   // copy of 1
    (3L, "alpha beta", "de"),   // copy of 1 in another lang
    (4L, "gamma delta epsilon", "en"),
    (5L, "", "en"))             // empty doc, 0 tokens
    .toDF("doc_id", "text", "lang")

  test("weights: every copy keeps its row; weight is the exact rational 1/n") {
    val w = SoftDedup.weights(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_copies"), r.getAs[Long]("weight_num"), r.getAs[Long]("weight_den")))
      .toMap
    assert(w.size == 5) // nothing dropped
    assert(w(1L) == ((3L, 1L, 3L)) && w(2L) == ((3L, 1L, 3L)) && w(3L) == ((3L, 1L, 3L)))
    assert(w(4L) == ((1L, 1L, 1L)) && w(5L) == ((1L, 1L, 1L)))
    // total sampling mass per distinct content is exactly 1:
    // sum over copies of 1/n_copies = n_copies * (1/n_copies)
  }

  test("massProfile strata are internally consistent and token-exact") {
    val rows = SoftDedup.massProfile(corpus).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_contents"), r.getAs[Long]("sum_tokens")))
      .toMap
    // the cross-lang copy group (n=3) splits 2 docs into en, 1 into de —
    // so within a (lang, n_copies) row n_docs = n_contents * copies-in-
    // THIS-lang, not necessarily n_copies; the global identity holds:
    assert(rows(("en", 3L)) == ((2L, 1L, 4L)))   // docs 1,2: 2 tokens each
    assert(rows(("de", 3L)) == ((1L, 1L, 2L)))
    assert(rows(("en", 1L)) == ((2L, 2L, 3L)))   // doc 4 (3 toks) + doc 5 (0)
    val globalDocs = rows.values.map(_._1).sum
    assert(globalDocs == 5)
  }
}
