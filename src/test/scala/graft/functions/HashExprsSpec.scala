package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HashExprsSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint: whitespace-layout and case invariant, content sensitive") {
    val df = Seq(
      (1L, "The quick  brown fox"),
      (2L, "the QUICK brown\tfox"),
      (3L, "  the quick brown fox  "),
      (4L, "the quick brown fax")
    ).toDF("id", "text")
    val fps = df.select($"id", HashExprs.fingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) === fps(3L))
    assert(fps(1L) !== fps(4L))
  }

  test("fingerprint: deterministic across executions and null-safe") {
    val df = Seq(Some("hello world"), None).toDF("text")
    val a = df.select(HashExprs.fingerprint($"text")).collect()
    val b = df.select(HashExprs.fingerprint($"text")).collect()
    assert(a.toSeq === b.toSeq)
    assert(a(1).isNullAt(0))
  }

  test("simhash64: near-identical token sets → small Hamming distance") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (1 to 60).map(i => if (i == 30) "changed" else s"tok$i").mkString(" ")
    val far = (100 to 160).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "text")
      .select($"id", HashExprs.simhash64($"text").as("h"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) <= 8, s"near pair hamming ${ham(m(1L), m(2L))}")
    assert(ham(m(1L), m(3L)) >= 16, s"far pair hamming ${ham(m(1L), m(3L))}")
    assert(ham(m(1L), m(1L)) === 0)
  }

  test("custom expressions stay inside whole-stage codegen") {
    // spark.range keeps the plan non-local so codegen actually applies
    // (a Seq.toDF constant-folds to LocalTableScan)
    val df = spark.range(2)
      .select(concat(lit("tok a b "), $"id".cast("string")).as("text"))
      .select(HashExprs.fingerprint($"text").as("fp"),
        HashExprs.simhash64($"text").as("sh"))
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    val planLines = df.queryExecution.executedPlan.toString.linesIterator.toSeq
    val fpLine = planLines.find(_.contains("fingerprint")).getOrElse("")
    assert(fpLine.trim.startsWith("*"), s"fingerprint not codegen'd:\n${planLines.mkString("\n")}")
    assert(df.collect().length === 2)
  }

  test("SQL registration: fingerprint/simhash64 callable from spark.sql") {
    HashExprs.register(spark)
    Seq((1L, "hello world")).toDF("id", "text").createOrReplaceTempView("t_hash")
    val r = spark.sql("SELECT fingerprint(text) AS fp, simhash64(text) AS sh FROM t_hash")
      .collect()(0)
    val e = Seq((1L, "hello world")).toDF("id", "text")
      .select(HashExprs.fingerprint($"text"), HashExprs.simhash64($"text")).collect()(0)
    assert(r.getLong(0) === e.getLong(0))
    assert(r.getLong(1) === e.getLong(1))
  }
}
