package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

class SqlAndSinksSpec extends SparkSpec {
  import spark.implicits._

  test("Sql.register exposes tables and custom functions to spark.sql") {
    Sql.register(spark, sf("sf0.001"))
    val r = spark.sql(
      """SELECT d.doc_id, fingerprint(d.text) AS fp, simhash64(d.text) AS sh
         FROM documents d WHERE d.doc_id < 3 ORDER BY d.doc_id""").collect()
    assert(r.length === 3)
    val direct = Tables.documents(spark, sf("sf0.001"))
      .filter($"doc_id" < 3)
      .select(graft.functions.HashExprs.fingerprint($"text"))
      .orderBy("doc_id")
      .as[Long].collect()
    assert(r.map(_.getLong(1)).toSeq === direct.toSeq)
  }

  test("SQL joins across registered views match the DataFrame path") {
    Sql.register(spark, sf("sf0.001"))
    val viaSql = spark.sql(
      """SELECT n_name, COUNT(*) AS n FROM customer
         JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name""")
      .as[(String, Long)].collect().toSeq
    val viaDf = Tables.customer(spark, sf("sf0.001"))
      .join(Tables.nation(spark, sf("sf0.001")), $"c_nationkey" === $"n_nationkey")
      .groupBy("n_name").agg(count(lit(1)).as("n")).orderBy("n_name")
      .as[(String, Long)].collect().toSeq
    assert(viaSql === viaDf)
  }

  test("partitioned parquet sink round-trips with partition pruning") {
    val out = Files.createTempDirectory("graft_sink").toString + "/docs"
    val docs = Tables.documents(spark, sf("sf0.001"))
    graft.sources.Sinks.parquet(docs, out, partitionBy = Seq("lang"))
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    // partition filter prunes to one directory
    val one = back.filter($"lang" === "en")
    val fmt = { val w = new java.io.ByteArrayOutputStream()
      Console.withOut(w) { one.explain("formatted") }; w.toString }
    assert(fmt.contains("PartitionFilters: [isnotnull(lang"), fmt)
    assert(one.count() === docs.filter($"lang" === "en").count())
  }

  test("csv sink writes header and round-trips strings") {
    val out = Files.createTempDirectory("graft_csv").toString + "/nation"
    graft.sources.Sinks.csv(Tables.nation(spark, sf("sf0.001")), out)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() === 25)
    assert(back.columns.toSeq === Seq("n_nationkey", "n_name", "n_regionkey"))
  }

  test("display sink (S2): show() renders header and rows to the console") {
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      Tables.region(spark, sf("sf0.001")).show(5, truncate = false)
    }
    val rendered = buf.toString("UTF-8")
    assert(rendered.contains("r_name"), rendered)
    assert(rendered.contains("AFRICA"), rendered)
    assert(rendered.linesIterator.count(_.startsWith("|")) >= 6) // header + 5 rows
  }
}
