package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** K-minimum-values (KMV / bottom-k) distinct sketch — the order-statistics
  * cousin of HLL (Bar-Yossef et al., "Counting distinct elements in a data
  * stream", RANDOM 2002; Beyer et al. SIGMOD 2007 for the unbiased
  * estimator and set operations). Where HLL only estimates cardinality, a
  * KMV sketch supports SET ALGEBRA: the k smallest hash values of A∪B are
  * computable from the two sketches alone, and the fraction of them present
  * in both sketches estimates the Jaccard similarity — which makes KMV the
  * sketch a corpus builder uses to ask "how much does this new crawl
  * overlap what I already have?" WITHOUT an exact distinct-join (q96's
  * exact form) over 100 TB.
  *
  * Everything here is DETERMINISTIC and engine-replayable, unlike a
  * seeded-RNG sketch: the element key is a rolling-31 polynomial hash of
  * the normalized text modulo the prime 999999937 (the q155 list_reduce
  * contract — fold fits int64 on any engine), spread through Knuth's
  * multiplicative constant modulo 2^32 (the q69/q114 keep-gate hash; the
  * product stays < 2^62, no overflow splitting needed). Same corpus → same
  * k minima → same estimates, on Spark and on the SQL oracle.
  *
  * State is a sorted array of at most k distinct keys (k=128 → 1 KiB),
  * merged by sorted-merge + truncate — algebraic, so partial aggregation
  * reduces each partition to k values before the exchange, exactly the
  * HLL/TopK wire shape. A sketch holding FEWER than k values is exact (it
  * has seen the whole distinct set); at or above k, D̂ = (k-1)·2^32 / h_k
  * with h_k the kth minimum (the classic unbiased KMV estimator).
  */
object KmvKernels {
  val P = 999999937L     // prime modulus of the rolling text hash (< 2^30)
  val A = 2654435761L    // Knuth's multiplicative spread constant
  val M = 4294967296L    // 2^32 key space

  /** Rolling-31 fold of the chars mod P, seeded with the first char code
    * (list_reduce semantics, as q155); empty input → 0.
    */
  def rollHash(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    if (n == 0) return 0L
    var h = str.charAt(0).toLong
    var i = 1
    while (i < n) {
      h = (h * 31 + str.charAt(i)) % P
      i += 1
    }
    h
  }

  /** Sketch key: rollHash spread over the 2^32 key space. h < 2^30 keeps
    * h·A < 2^62 — plain long arithmetic, replayable as
    * `(list_reduce(...) * 2654435761) % 4294967296` on any engine.
    */
  def kmvKey(s: UTF8String): Long = (rollHash(s) * A) % M
}

/** `kmv_key(text) → bigint`: codegen'd sketch-key expression. */
case class KmvKeyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_key"
  override protected def nullSafeEval(input: Any): Any =
    KmvKernels.kmvKey(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KmvKernels.kmvKey($c)")
  override protected def withNewChildInternal(newChild: Expression): KmvKeyExpr =
    copy(child = newChild)
}

/** Bottom-k distinct-key aggregator: O(k) sorted state, algebraic merge. */
class KmvAggregator(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, "k must be positive")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, key)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (buf.length >= k && ins >= k) buf // larger than the kth minimum
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = key
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // sorted-merge, skip duplicates, stop at k
    val out = new Array[Long](math.min(a.length + b.length, k))
    var (i, j, n) = (0, 0, 0)
    while (n < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) {
        out(n) = v
        n += 1
      }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KmvSketch {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  def kmvKey(c: Column): Column = column(KmvKeyExpr(expression(c)))

  /** `kmv_sketch(keyCol)` → array<bigint>: the k minima of the group. */
  def sketch(k: Int)(key: Column): Column = udaf(new KmvAggregator(k)).apply(key)

  /** Register `kmv_key` for spark.sql(...) use. */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graft.bridge.registerFunction(spark, "kmv_key",
      exprs => KmvKeyExpr(exprs.head))

  /** KMV distinct estimate from a sketch: exact below k, (k-1)·2^32/h_k at
    * or above (positive operands — floor division equals truncation on
    * every engine).
    */
  def estimate(k: Int, minima: Array[Long]): Long =
    if (minima.length < k) minima.length.toLong
    else (k - 1).toLong * KmvKernels.M / minima.last

  /** Sorted-merge of two sketches truncated to the k smallest — the
    * union-sketch operation (closed under merge: K(A∪B) from K(A), K(B)).
    */
  def union(k: Int, a: Array[Long], b: Array[Long]): Array[Long] =
    new KmvAggregator(k).merge(a, b)

  /** Jaccard estimate in exact parts-per-million: of the union sketch's
    * values, the fraction present in BOTH input sketches (Beyer et al.'s
    * ρ = |K(A∪B) ∩ K(A) ∩ K(B)| / |K(A∪B)|).
    */
  def jaccardPpm(k: Int, a: Array[Long], b: Array[Long]): (Long, Long) = {
    val u = union(k, a, b)
    if (u.isEmpty) return (0L, 0L)
    val sa = a.toSet
    val sb = b.toSet
    val common = u.count(v => sa.contains(v) && sb.contains(v)).toLong
    (common, 1000000L * common / u.length)
  }

  /** The q96 corpus-overlap question answered from sketches alone: side A =
    * even-numbered sources, side B = odd-numbered plus the planted overlap
    * slice (doc_id < 60 of side A), texts whitespace-normalized and
    * lowercased exactly as the exact-form query does. Returns ONE row of
    * exact-integer sketch outputs: per-side kth minima and estimates, the
    * union estimate, and the Jaccard estimate in ppm. Everything up to the
    * two k-length sketches is distributed; combining two 1-KiB sketches
    * happens on the driver (the sanctioned sketch-sized collect).
    */
  def corpusOverlapSketch(documents: DataFrame, k: Int = 128): DataFrame = {
    val spark = documents.sparkSession
    val norm = regexp_replace(lower(trim(col("text"))), "[ \\t\\n\\f\\r]+", " ")
    val src = documents
      .withColumn("sn", regexp_extract(col("source"), "(\\d+)", 1).cast("int"))
      .withColumn("h", kmvKey(norm))
    val sideA = src.filter(col("sn") % 2 === 0).select(lit("a").as("side"), col("h"))
    val sideB = src.filter(col("sn") % 2 === 1).select(col("h"))
      .unionAll(src.filter(col("sn") % 2 === 0 && col("doc_id") < 60).select(col("h")))
      .select(lit("b").as("side"), col("h"))
    val sketches = sideA.unionByName(sideB)
      .groupBy(col("side")).agg(sketch(k)(col("h")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    val (ka, kb) = (sketches("a"), sketches("b"))
    val u = union(k, ka, kb)
    val (common, ppm) = jaccardPpm(k, ka, kb)
    val out = Row(k.toLong, ka.length.toLong, ka.last, estimate(k, ka),
      kb.length.toLong, kb.last, estimate(k, kb),
      u.length.toLong, u.last, estimate(k, u), common, ppm)
    val schema = StructType(Seq("k", "n_a", "kth_a", "est_a", "n_b", "kth_b",
      "est_b", "n_u", "kth_u", "est_u", "n_common_k", "jaccard_ppm")
      .map(StructField(_, LongType, nullable = false)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(out)), schema)
  }
}
