package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.AuditExprs

/** Embedding-table data-quality audit — the vector-side counterpart of the
  * events DQ audit (q126): before an ANN index or a similarity-join runs
  * over 100 TB of vectors, the pipeline needs exact counts of the rows
  * that would silently poison it (dimension drift from a mixed-model
  * backfill, NaN/Inf from an overflowed encoder, all-zero vectors from a
  * failed fetch — cosine against a zero vector is 0/0).
  *
  * Every verdict is an integer fact both engines derive identically: the
  * vector is cast to array<double> (exact widening from the parquet
  * floats), non-finite elements are counted by a codegen'd kernel, and the
  * "zero vector" test uses the floor-quantized squared norm
  * ([[graft.functions.AuditExprs.quantSqNorm]], scale 1000) — exact BIGINT,
  * no float comparison anywhere. Note the dead band the per-element FLOOR
  * implies, and its asymmetry: an element quantizes to 0 exactly on
  * [0, 1/scale), so a vector with every element in that band reports as a
  * zero vector, while a tiny NEGATIVE element (floor(-eps·scale) = -1)
  * does not — the "zero vector" verdict means "no element at or above
  * +1/scale and none below 0", not "norm below a symmetric epsilon". That
  * one-sidedness is deliberate: floor has no round-half tie for the
  * engines to disagree on (the q159 rule), and the q168 oracle applies the
  * identical floor at the identical scale, so the classification is
  * engine-exact. Scale shape: one narrow map over the vectors (two kernel
  * calls per row), one label-keyed aggregate; nothing else.
  */
object EmbeddingAudit {

  /** Per-label audit: `(label, n_vecs, n_bad_dim, n_nonfinite_vecs,
    * n_zero_vecs, sum_qnorm, min_dim, max_dim)` ordered by label.
    * `expectedDim` is the contract dimension (bad_dim counts deviations).
    */
  def audit(embeddings: DataFrame, vecCol: Column, labelCol: Column,
            expectedDim: Int, scale: Double = 1000.0): DataFrame = {
    val v = vecCol.cast("array<double>")
    val perRow = embeddings.select(
      labelCol.as("label"),
      size(v).as("dim"),
      AuditExprs.nonFiniteCount(v).as("n_nonfinite"),
      AuditExprs.quantSqNorm(v, scale).as("qnorm"))
    perRow.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum((col("dim") =!= expectedDim).cast("bigint")).as("n_bad_dim"),
        sum((col("n_nonfinite") > 0).cast("bigint")).as("n_nonfinite_vecs"),
        sum((col("n_nonfinite") === 0 && col("qnorm") === 0).cast("bigint"))
          .as("n_zero_vecs"),
        sum(col("qnorm")).as("sum_qnorm"),
        min(col("dim")).as("min_dim"),
        max(col("dim")).as("max_dim"))
      .orderBy(col("label"))
  }
}
