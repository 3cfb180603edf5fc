package graft.segmentation

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.IntegerType

/** P3/P4 recode truth tables over dow ∈ {0..6, null, non-numeric}
  * (FIXTURES.md dow_truth; reference codeText.txt:26-41).
  */
class RecodeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dowTruth = Seq(
    "0", "1", "2", "3", "4", "5", "6", null, "x"
  ).toDF("order_dow")
    .withColumn("order_dow", col("order_dow").cast(IntegerType))

  test("dowBucket truth table incl. null/dirty → otherwise branch") {
    val got = Recode.withDowBucket(dowTruth)
      .select("order_dow", "order_dow_updated")
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getInt(0), r.getInt(1)))
      .toMap
    assert(got(0) === 0 && got(1) === 0)
    assert(got(2) === 1 && got(3) === 1 && got(4) === 1)
    assert(got(5) === 2 && got(6) === 2)
    assert(got(null) === 2) // isin(null) is null-false → otherwise
  }

  test("dayName replicates the reference's (nonstandard) 0→Monday mapping") {
    val got = Recode.withDayName(dowTruth)
      .select("order_dow", "days")
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getInt(0), r.getString(1)))
      .toMap
    assert(got(0) === "Monday")
    assert(got(1) === "Tuesday")
    assert(got(2) === "Wednesday")
    assert(got(3) === "Thursday")
    assert(got(4) === "Friday")
    assert(got(5) === "Saturday")
    assert(got(6) === "Sunday")
    assert(got(null) === "None")
  }

  test("castInt: non-numeric strings become NULL (ANSI-off contract)") {
    val df = Seq("7", "x", "", null).toDF("c")
    val got = Ingest.castInt(df, "c").collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(got.toSeq === Seq(7, null, null, null))
  }

  test("copyColumn duplicates values (codeText.txt:169)") {
    val df = Seq(1, 2, 3).toDF("a")
    val got = Recode.copyColumn(df, "a", "b").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got.forall { case (a, b) => a == b })
  }
}
