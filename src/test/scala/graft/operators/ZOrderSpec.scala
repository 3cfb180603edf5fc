package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bit-level truth of the Morton interleave and the file-layout contract of
  * `cluster`: disjoint per-file z-ranges are what make 2-D min/max file
  * skipping work (the q135 evidence).
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference interleave, one bit at a time — deliberately the naive form
    * the shift-mask spreads must agree with.
    */
  private def refZ(a: Int, b: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc |
        (((a >> i) & 1).toLong << (2 * i)) |
        (((b >> i) & 1).toLong << (2 * i + 1))
    }

  test("zvalue matches the bit-by-bit reference on edge and random values") {
    val samples = Seq((0, 0), (1, 0), (0, 1), (0xFFFF, 0xFFFF), (0xFFFF, 0),
      (0, 0xFFFF), (0x5555, 0xAAAA), (12345, 54321), (1, 65535), (43200, 14999))
    val got = samples.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zvalue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    got.foreach { case (a, b, z) => assert(z == refZ(a, b), s"($a,$b)") }
  }

  test("zvalue is invertible: distinct (a,b) pairs never collide") {
    val pairs = for { a <- 0 to 63; b <- 0 to 63 } yield (a, b)
    val zs = pairs.toDF("a", "b")
      .select(ZOrder.zvalue(col("a"), col("b"))).distinct().count()
    assert(zs == pairs.size)
  }

  test("zvalue truncates to the low 16 bits of each dimension") {
    val got = Seq((0x10000, 0x20000)).toDF("a", "b")
      .select(ZOrder.zvalue(col("a"), col("b"))).head().getLong(0)
    assert(got == refZ(0, 0))
  }

  test("cluster writes files whose z-ranges are pairwise disjoint") {
    val out = java.nio.file.Files.createTempDirectory("zorder_spec").toString
    val df = spark.range(4000).select(
      (col("id") % 61).cast("int").as("x"),
      (col("id") * 31 % 997).cast("int").as("y"))
    ZOrder.cluster(df, col("x"), col("y"), numFiles = 8)
      .write.mode("overwrite").parquet(out)
    val ranges = spark.read.parquet(out)
      .withColumn("f", input_file_name())
      .select(col("f"), ZOrder.zvalue(col("x"), col("y")).as("z"))
      .groupBy(col("f")).agg(min(col("z")).as("lo"), max(col("z")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }
}
