package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Truth tables for the domain-level curation pair: URL→domain parsing,
  * blocklist filter/audit agreement, the exact-integer cap keep rule, and
  * the determinism properties the 100 TB design leans on (row order and
  * partitioning never change a decision).
  */
class DomainFilterSpec extends SparkSpec {
  import spark.implicits._

  test("domainOf handles scheme, www, port, path, userinfo, and bare-host misses") {
    val cases = Seq(
      "https://www.example.com/path?q=1" -> "example.com",
      "http://sub.example.co.uk:8080/x" -> "sub.example.co.uk",
      "//cdn.example.org/asset.js" -> "cdn.example.org",
      "ftp://user:pw@files.example.net/f" -> "files.example.net",
      "HTTPS://WWW.UPPER.COM/" -> "upper.com",
      "not a url" -> "")
    val got = cases.map(_._1).toDF("url")
      .select(DomainFilter.domainOf(col("url"))).collect().map(_.getString(0))
    assert(got.toSeq == cases.map(_._2))
  }

  test("blocklist: filter drops exactly the blocked domains; audit agrees with filter") {
    val docs = Seq(
      (1L, "bad.com", "en", 10L), (2L, "good.com", "en", 20L),
      (3L, "bad.com", "de", 30L), (4L, "other.org", "de", 40L),
      (5L, "good.com", "en", 50L)).toDF("doc_id", "source", "lang", "n_chars")
    val bl = Seq("bad.com").toDF("domain")
    val kept = DomainFilter.applyBlocklist(docs, "source", bl)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L, 5L))
    val audit = DomainFilter.blocklistAudit(docs, "source", "lang", "n_chars", bl)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(audit.toSeq == Seq(("de", 2L, 1L, 1L, 40L), ("en", 3L, 1L, 2L, 70L)))
  }

  test("cap: under-cap domains are untouched, over-cap domains thin to ~capN") {
    // 1000 docs: domain "big" holds 900, "small" holds 100; cap = 20% = 200
    val docs = (0L until 1000L)
      .map(i => (i, if (i < 900) "big" else "small")).toDF("doc_id", "source")
    val audit = DomainFilter.capAudit(docs, "source", "doc_id", capPpm = 200000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byDomain = audit.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byDomain("small") == ((100L, 100L))) // under cap: all kept
    val (bigDocs, bigKept) = byDomain("big")
    assert(bigDocs == 900L)
    // hash thinning targets capN = 200 in expectation; binomial(900, 2/9)
    // is within +-60 of 200 at > 5-sigma certainty
    assert(bigKept > 140L && bigKept < 260L, s"bigKept=$bigKept")
    // the capped corpus is exactly the audit's kept count
    val corpus = DomainFilter.capDomainMass(docs, "source", "doc_id", 200000L)
    assert(corpus.count() == 100L + bigKept)
    assert(corpus.columns.toSeq == Seq("doc_id", "source")) // schema untouched
  }

  test("cap decisions are independent of row order and partitioning") {
    val docs = (0L until 500L)
      .map(i => (i, s"d${i % 3}")).toDF("doc_id", "source")
    val a = DomainFilter.capDomainMass(docs, "source", "doc_id", 150000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = DomainFilter.capDomainMass(
        docs.orderBy(rand(7)).repartition(13), "source", "doc_id", 150000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("keep rule survives ids past the 32-bit spread domain (mod-first, no overflow)") {
    // ids near Long.MaxValue: the mod-999999937-first spread must neither
    // overflow nor collapse; with a 50% cap over one domain of 4 docs the
    // rule is exercised end to end on the extreme ids
    val big = Seq(Long.MaxValue - 3, Long.MaxValue - 2, Long.MaxValue - 1,
      Long.MaxValue).map(i => (i, "one")).toDF("doc_id", "source")
    val out = DomainFilter.capAudit(big, "source", "doc_id", 500000L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(out._1 == 4L && out._2 <= 4L) // no crash, sane counts
    val spreads = big.select(DomainFilter.idSpread(col("doc_id")))
      .collect().map(_.getLong(0))
    assert(spreads.forall(s => s >= 0L && s < 4294967296L))
    assert(spreads.distinct.length == 4) // consecutive ids spread apart
  }

  test("capPpm outside (0, 1e6] is rejected") {
    val docs = Seq((1L, "a")).toDF("doc_id", "source")
    intercept[IllegalArgumentException] {
      DomainFilter.capAudit(docs, "source", "doc_id", 0L).collect()
    }
    intercept[IllegalArgumentException] {
      DomainFilter.capAudit(docs, "source", "doc_id", 1000001L).collect()
    }
  }

  test("plan shape: no shuffle of the corpus below the audit aggregates") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val df = DomainFilter.capDomainMass(docs, "source", "doc_id", 40000L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the corpus side reaches the threshold join without an exchange:
    // every join below the output must be a broadcast
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus-side shuffle join leaked into the cap plan:\n$plan")
  }
}
