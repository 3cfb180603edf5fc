package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10x scale-up generator: `sf0.1` -> `sf1`.
  *
  * The driver ships sf0.001/0.01/0.1 only; the third scaling decade
  * (VERDICT r6 task 1) needs an sf1 dataset that preserves the driver
  * generator's cross-scale behavior, observed from sf0.01 -> sf0.1:
  *
  *   - every key space grows 10x per decade (customer/supplier/part/
  *     orders/lineitem/events/users/documents), EXCEPT embeddings which
  *     grow 4x (500 -> 2000);
  *   - region/nation are fixed dimensions (5 / 25 rows at every scale);
  *   - date/timestamp RANGES are fixed (orders 1995..2001, events
  *     Jan 2024) — density grows, span doesn't, exactly like TPC-H.
  *
  * Mechanism: tile each table `factor` times with key offsets of
  * (max_key+1) per copy, so referential integrity and per-entity fan-outs
  * (orders per customer, lineitems per order, events per user) are
  * preserved exactly. Copy 0 is the identity — sf0.1 is a literal subset
  * of sf1. Derived columns are kept consistent:
  *
  *   - c_name/s_name are reformatted from the offset key (the source data
  *     uses `Customer#%09d` / `Supplier#%09d` of the key);
  *   - document TEXT is re-vocabularied per copy (each word maps through a
  *     pure function of (word, copy): ~20% kept, ~80% relabeled to a
  *     hash-derived pseudo-word). Within a copy this is a vocabulary
  *     isomorphism, so the planted exact-dup/near-dup structure that the
  *     dedup suite (MinHash/SimHash/Jaccard) measures is preserved copy by
  *     copy; ACROSS copies the shared-shingle rate is ~0.8%, far below any
  *     LSH band threshold. Naive tiling of identical text would hand every
  *     doc 9 exact duplicates and blow candidate-pair counts up 100x — a
  *     fake superlinearity the scaling gate would (correctly) flag.
  *     n_chars is recomputed (source invariant: n_chars == length(text));
  *   - embeddings get a deterministic per-(vec_id, dim, copy) jitter of
  *     at most ±0.01, enough to break exact-distance ties (identical
  *     vectors would make brute-force top-k order ill-defined) while
  *     keeping the label/cluster geometry the IVF/PQ recall gates measure;
  *   - event ts gets +copy microseconds so the (ts, event_id) total order
  *     the streaming fixtures rely on never sees 10-way exact ties.
  *
  * Everything is Spark `hash()` (Murmur3) based — no RNG, so the output
  * is bit-identical across runs and across partitionings.
  *
  * Usage: `runMain graft.ScaleUp [srcDir] [dstDir] [factor]`
  * (defaults: /root/testdata/sf0.1  testdata/sf1  10).
  */
object ScaleUp {

  import org.apache.spark.sql.Column

  /** Seed-keyed vocabulary isomorphism: every word maps through a pure
    * function of (word, seed) — ~20% kept, ~80% relabeled to a hash-derived
    * pseudo-word. Within one seed this preserves word-level equality (exact
    * copies stay exact copies, shingle Jaccard is invariant), while texts
    * from different seeds share ~1% of their vocabulary.
    */
  private[graft] def revocab(text: Column, seed: Int): Column =
    array_join(
      transform(split(text, " "), w =>
        when(pmod(hash(w, lit(seed)), lit(10)) < 2, w)
          .otherwise(concat(lit("w"), pmod(hash(w, lit(seed), lit(7919)), lit(50021))))),
      " ")

  /** Deterministic per-(id, dim, seed) jitter of at most ±0.01 — enough to
    * break exact-distance ties while keeping the cluster geometry the
    * IVF/PQ recall gates measure.
    */
  private[graft] def jitterEmbedding(emb: Column, id: Column, seed: Int): Column =
    transform(emb, (x, i) =>
      (x + (pmod(hash(id, i, lit(seed)), lit(1001)).cast("double") / 1000.0 - 0.5) * 0.02)
        .cast("float"))

  /** SQL fragment turning the source `ts` column into micros-since-epoch,
    * whichever dataset generation it came from: LongType nanos (older
    * driver data scanned under nanosAsLong) or native TIMESTAMP micros —
    * LTZ (our generators' output) or NTZ (current driver data; the cast is
    * wall-value-exact under the pinned UTC session tz).
    */
  private[graft] def eventsTsMicrosExpr(events: DataFrame): String =
    events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => "ts div 1000"
      case _ => "unix_micros(cast(ts as timestamp))"
    }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("testdata/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, src, dst, factor)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    // fixed dimensions: copied verbatim, never tiled
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    // tile(df)(perCopy): union of `factor` transformed copies; copy 0 is identity
    def tile(df: DataFrame, n: Int = factor)(perCopy: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until n).map(c => perCopy(df, c)).reduce(_ unionAll _)

    val customer = read("customer")
    val nCust = span(customer, "c_custkey")
    write(tile(customer) { (df, c) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(c * nCust))
        .withColumn("c_name", format_string("Customer#%09d", col("c_custkey")))
    }, "customer", 4)

    val supplier = read("supplier")
    val nSupp = span(supplier, "s_suppkey")
    write(tile(supplier) { (df, c) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(c * nSupp))
        .withColumn("s_name", format_string("Supplier#%09d", col("s_suppkey")))
    }, "supplier", 1)

    val part = read("part")
    val nPart = span(part, "p_partkey")
    write(tile(part) { (df, c) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(c * nPart))
    }, "part", 4)

    val orders = read("orders")
    val nOrd = span(orders, "o_orderkey")
    write(tile(orders) { (df, c) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(c * nOrd))
        .withColumn("o_custkey", col("o_custkey") + lit(c * nCust))
    }, "orders", 8)

    write(tile(read("lineitem")) { (df, c) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(c * nOrd))
        .withColumn("l_partkey", col("l_partkey") + lit(c * nPart))
        .withColumn("l_suppkey", col("l_suppkey") + lit(c * nSupp))
    }, "lineitem", 16)

    // source ts arrives either as LongType nanos (older driver data under
    // nanosAsLong) or native TIMESTAMP micros (current generation) — same
    // dual contract Tables.events handles. Output always ships native
    // TIMESTAMP(MICROS) (Spark cannot write nanos back), +copy microseconds
    // to break cross-copy exact ties; Tables.events re-derives ts_ns.
    val events = read("events")
    val tsMicros = eventsTsMicrosExpr(events)
    val nEv = span(events, "event_id")
    val nUser = events.agg(max(col("user_id"))).head().getLong(0) + 1L
    write(tile(events) { (df, c) =>
      df.withColumn("event_id", col("event_id") + lit(c * nEv))
        .withColumn("user_id", col("user_id") + lit(c * nUser))
        .withColumn("ts", expr(s"timestamp_micros($tsMicros + $c)"))
    }, "events", 8)

    val documents = read("documents")
    val nDoc = span(documents, "doc_id")
    write(tile(documents) { (df, c) =>
      val text = if (c == 0) col("text") else revocab(col("text"), c)
      df.withColumn("doc_id", col("doc_id") + lit(c * nDoc))
        .withColumn("text", text)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents", 4)

    // embeddings grow 4x per decade in the driver's own data (500 -> 2000)
    val embeddings = read("embeddings")
    val nVec = span(embeddings, "vec_id")
    val embFactor = math.max(1, (factor * 4) / 10)
    write(tile(embeddings, embFactor) { (df, c) =>
      val emb = if (c == 0) col("embedding")
        else jitterEmbedding(col("embedding"), col("vec_id"), c)
      df.withColumn("vec_id", col("vec_id") + lit(c * nVec))
        .withColumn("embedding", emb)
    }, "embeddings", 2)
  }
}
