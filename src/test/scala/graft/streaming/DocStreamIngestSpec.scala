package graft.streaming

import graft.SparkSpec

/** The streaming store-ingest: every construction-pinned cross-batch
  * verdict bit must hold — batch 0's append suppressing batch 1's
  * copies through the persisted store is the property under test.
  */
class DocStreamIngestSpec extends SparkSpec {

  test("cross-batch verdicts flow through the persisted store") {
    val row = DocStreamIngest
      .ingestVerdictsBounded(spark, sf("sf0.001")).collect()(0)
    row.schema.fieldNames.foreach { f =>
      assert(row.getAs[Boolean](f), s"bit $f is false: $row")
    }
    assert(row.schema.fieldNames.length === 8)
  }

  test("restart resumes from the checkpoint with store-held state") {
    val row = DocStreamIngest
      .ingestVerdictsRestartBounded(spark, sf("sf0.001")).collect()(0)
    row.schema.fieldNames.foreach { f =>
      assert(row.getAs[Boolean](f), s"bit $f is false: $row")
    }
    assert(row.schema.fieldNames.length === 9)
    assert(row.schema.fieldNames.contains("exactly_once"))
  }
}
