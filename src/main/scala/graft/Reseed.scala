package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic second-seed differential dataset (VERDICT r6 task 5).
  *
  * Each scale ships ONE driver-generated dataset, so a hash gate can in
  * principle pass by data-dependent coincidence (an aggregate that happens
  * to collide, a tie that happens to break the same way). This generator
  * derives a STRUCTURE-PRESERVING but value-distinct dataset from an sf dir;
  * running the same Verify + DuckDB oracle gate over it re-checks every
  * hash-gated query against materially different data.
  *
  * What changes (all Murmur3-keyed by `seed`, no RNG):
  *  - document `text` via [[ScaleUp.revocab]] (vocabulary isomorphism:
  *    exact-copy and shingle-overlap structure is preserved word for word,
  *    but ~80% of the vocabulary is relabeled); `n_chars` recomputed;
  *  - `embedding` via [[ScaleUp.jitterEmbedding]] (±0.01, geometry kept);
  *  - measures: `l_quantity` (re-drawn on the same 1..50 grid),
  *    `l_extendedprice`, `o_totalprice` (±10%, 2 dp), events `value`
  *    (±20% of cents, floored at 1 cent).
  *
  * What does NOT change: every key, date/timestamp, flag and string
  * dimension — referential integrity, fixture id-boundaries, the events
  * (ts, event_id) total order, and the planted dedup structure are exactly
  * those of the source dataset. Oracles recompute from the transformed
  * parquet, so the gate stays self-contained.
  *
  * Events `ts` is re-written as native TIMESTAMP micros (same contract as
  * [[ScaleUp]]; `Tables.events` re-derives `ts_ns`).
  *
  * Usage: `runMain graft.Reseed [srcDir] [dstDir] [seed]`
  * (defaults: /root/testdata/sf0.01  testdata/sf0.01-seed2  2).
  */
object Reseed {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val dst = args.lift(1).getOrElse("testdata/sf0.01-seed2")
    val seed = args.lift(2).map(_.toInt).getOrElse(2)
    require(seed != 0, "seed 0 is the identity of the hash family — use >= 1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, src, dst, seed)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, dst: String, seed: Int): Unit = {
    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$dst/$t.parquet")

    // ±`pct` multiplicative perturbation, 2 dp, keyed by (cols..., seed, salt)
    def scale2dp(c: org.apache.spark.sql.Column, pct: Double, salt: Int,
                 keys: org.apache.spark.sql.Column*) = {
      val u = pmod(hash(keys :+ lit(seed) :+ lit(salt): _*), lit(10001))
        .cast("double") / 10000.0 // uniform [0,1] on a 1e-4 grid
      round(c * (lit(1.0 - pct) + u * (2.0 * pct)), 2)
    }

    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      write(read(t), t, 1)

    write(read("orders").withColumn("o_totalprice",
      scale2dp(col("o_totalprice"), 0.10, 1, col("o_orderkey"))), "orders", 4)

    write(read("lineitem")
      .withColumn("l_quantity",
        (pmod(hash(col("l_orderkey"), col("l_linenumber"), lit(seed)), lit(50)) + 1)
          .cast("double"))
      .withColumn("l_extendedprice",
        scale2dp(col("l_extendedprice"), 0.10, 2, col("l_orderkey"), col("l_linenumber"))),
      "lineitem", 8)

    // value: ±20% of the cent amount, floored at 1 cent (domain stays > 0)
    val events = read("events")
    write(events
      .withColumn("ts",
        expr(s"timestamp_micros(${ScaleUp.eventsTsMicrosExpr(events)})"))
      .withColumn("value",
        greatest(lit(1L),
          round(round(col("value") * 100) *
            (lit(0.8) + pmod(hash(col("event_id"), lit(seed), lit(3)), lit(4001))
              .cast("double") / 10000.0)).cast("long"))
          .cast("double") / 100.0),
      "events", 8)

    write(read("documents")
      .withColumn("text", ScaleUp.revocab(col("text"), seed))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents", 2)

    write(read("embeddings")
      .withColumn("embedding",
        ScaleUp.jitterEmbedding(col("embedding"), col("vec_id"), seed)),
      "embeddings", 1)
  }
}
