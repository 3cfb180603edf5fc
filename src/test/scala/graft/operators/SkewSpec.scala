package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain inner join (skewed fact side)") {
    // skewed: 80% of rows share key 1
    val rnd = new scala.util.Random(1)
    val big = Seq.fill(2000)(if (rnd.nextDouble() < 0.8) 1 else 1 + rnd.nextInt(10))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val small = (1 to 10).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
      .as[(Int, Long, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(big, small, "k", nSalts = 4)
      .select("k", "payload", "name")
      .as[(Int, Long, String)].collect().sorted.toSeq
    assert(salted === plain)
  }

  test("saltedJoin spreads a hot key over multiple partitions pre-join") {
    val big = Seq.fill(100)((1, "x")).toDF("k", "v")
    val salted = big.withColumn("__salt", (rand(42L) * 4).cast("int"))
    assert(salted.select("__salt").distinct().count() > 1)
  }

  test("saltedDistinctCount equals plain countDistinct on real data") {
    val li = Tables.lineitem(spark, sf("sf0.001"))
    val plain = li.groupBy("l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_distinct_l_partkey"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedDistinctCount(li, "l_returnflag", "l_partkey", nSalts = 4)
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
  }
}
