package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrubOne(s: String): String =
    Seq(Tuple1(s)).toDF("t").select(PiiScrub.scrub(col("t"))).head.getString(0)

  test("emails and IPv4 literals are replaced by the [PII] token") {
    assert(scrubOne("mail me at jane.doe+x@corp-mail.example.org today")
      == "mail me at [PII] today")
    assert(scrubOne("gateway 10.0.255.7 responded")
      == "gateway [PII] responded")
    assert(scrubOne("a@b.co and 1.2.3.4") == "[PII] and [PII]")
  }

  test("near-misses survive: no boundary-less IPs, no uppercase emails") {
    // 4567 has no word boundary after the third digit — not an IPv4
    assert(scrubOne("version 1.2.3.4567 shipped") == "version 1.2.3.4567 shipped")
    // the email pattern is lowercase-only BY CONTRACT (the corpus is
    // lowercased upstream; a mixed-case corpus must lowercase first) —
    // an uppercase domain blocks the whole match
    assert(scrubOne("Write User@Example.com") == "Write User@Example.com")
  }

  test("audit counts docs, matches and removed chars exactly") {
    val docs = Seq(
      ("en", "reach a@b.co or c@d.org"),            // 2 emails
      ("en", "host 10.0.0.1 mail a@b.co"),          // 1 ip + 1 email
      ("en", "nothing sensitive here"),
      ("de", "ip 192.168.1.100 only"))
      .toDF("lang", "text")
    val got = PiiScrub.audit(docs, "text", "lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // chars_removed: "a@b.co"(6) + "c@d.org"(7) -> 13 - 2*5([PII]) = 3;
    // "10.0.0.1"(8) + "a@b.co"(6) -> 14 - 10 = 4; en total 7
    // de: "192.168.1.100"(13) - 5 = 8
    assert(got === Array(
      ("de", 1L, 0L, 0L, 1L, 1L, 8L),
      ("en", 3L, 2L, 3L, 1L, 1L, 7L)))
  }

  test("audit is map-only: no join, no window before the lang aggregate") {
    val docs = Seq(("en", "x")).toDF("lang", "text")
    val plan = PiiScrub.audit(docs, "text", "lang")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"), plan)
  }
}
