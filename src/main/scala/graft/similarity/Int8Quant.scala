package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization of embedding columns — the
  * standard 4x compression for vector stores and ANN serving (scale =
  * maxabs/127, q_i = round(x_i * 127 / maxabs) ∈ [-127, 127]) — plus the
  * dequantized dot product the compressed search path uses.
  *
  * Exactness discipline: the quantized codes are INTEGERS produced by one
  * fixed float expression — `round((x as double) * 127.0 / maxabs)` with
  * maxabs = max(|x_i|) — whose operands and operation order are mirrored
  * literally by the SQL oracle (float→double widening is exact, max of
  * exact values is exact, and both engines round half away from zero), so
  * every downstream integer statistic (code sums, weighted code sums,
  * integer dot products) compares bit-for-bit. The only genuinely
  * float-valued output is the dequantization error, which is gated as a
  * boolean against DOUBLE its analytic bound (err per component ≤
  * scale/2), never as a value.
  *
  * Scale shape: everything is a narrow per-row array expression (codegen,
  * no UDF, no shuffle); the quantized dot gate broadcasts one query
  * vector. At 100 TB the codes column is what ships to the vector store —
  * 64 B/vector for d=64 instead of 256 B.
  */
object Int8Quant {

  /** max(|x_i|) as double; 0.0 for all-zero or empty vectors. */
  def maxAbs(vec: Column): Column =
    coalesce(array_max(transform(vec, x => abs(x.cast("double")))), lit(0.0))

  /** int8 codes: round(x * 127 / maxabs), all-zero when maxabs = 0. */
  def codes(vec: Column, maxabs: Column): Column =
    when(maxabs === 0.0, transform(vec, _ => lit(0)))
      .otherwise(transform(vec,
        x => round(x.cast("double") * lit(127.0) / maxabs).cast("int")))

  /** Exact integer dot product of two code arrays. */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Per-vector quantization audit over `embeddings(idCol, vecCol)`:
    * (id, n_dims, sum_q, wsum_q, dot0_ok) — the integer code statistics
    * plus a boolean asserting the dequantized dot product against the
    * vector with the minimum id stays within 2x its analytic error bound.
    */
  def audit(embeddings: DataFrame, idCol: String = "vec_id",
            vecCol: String = "embedding"): DataFrame = {
    val base = embeddings.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v"))
      .withColumn("ma", maxAbs(col("v")))
      .withColumn("q", codes(col("v"), col("ma")))
    val q0 = base.orderBy(col("id")).limit(1)
      .select(col("v").as("v0"), col("ma").as("ma0"), col("q").as("q0"))
    val s = col("ma") / 127.0
    val s0 = col("ma0") / 127.0
    val l1 = (c: Column) => aggregate(
      transform(c, x => abs(x.cast("double"))), lit(0.0), (acc, x) => acc + x)
    base.crossJoin(broadcast(q0))
      .withColumn("float_dot", aggregate(
        zip_with(col("v"), col("v0"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("deq_dot", intDot(col("q"), col("q0")) * s * s0)
      .withColumn("bound",
        (l1(col("v")) * s0 / 2.0 + l1(col("v0")) * s / 2.0
          + size(col("v")).cast("double") * s * s0 / 4.0) * 2.0)
      .select(col("id").as(idCol),
        size(col("q")).as("n_dims"),
        aggregate(col("q"), lit(0L), (acc, x) => acc + x.cast("long"))
          .as("sum_q"),
        aggregate(zip_with(col("q"), sequence(lit(1), size(col("q"))),
          (qi, i) => qi.cast("long") * i.cast("long")),
          lit(0L), (acc, x) => acc + x).as("wsum_q"),
        (abs(col("deq_dot") - col("float_dot")) <= col("bound")).as("dot0_ok"))
  }
}
