package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}

/** Margin evidence for the q200 drift monitor: prints the FULL driftAudit
  * row (tvd, distortion_ratio, both axis bits) for the organic held-out
  * batch and the fixed-direction shifted batch at each given sf dir —
  * the numbers THREESCALE.md §15 adjudicates the default thresholds
  * (tauTvd=0.25, tauRho=2.0) against.
  *
  * Usage: runMain graft.tools.DriftProbe <sfDir> [<sfDir> ...]
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DriftProbe <sfDir> [<sfDir> ...]")
    val spark = Sessions.local("graft-drift-probe")
    args.foreach { dir =>
      val emb = Tables.embeddings(spark, dir)
      val out = java.nio.file.Files
        .createTempDirectory("graft_drift_probe_").toString
      graft.similarity.AnnIndex.write(
        emb.filter(col("vec_id") % 5 =!= 4), out,
        m = 8, k = 64, nLists = 16, maxIter = 3)
      val heldOut = emb.filter(col("vec_id") % 5 === 4)
      val shifted = heldOut.withColumn("embedding",
        expr("transform(embedding, x -> CAST(1.0 AS DOUBLE))"))
      println(s"== $dir control ==")
      graft.similarity.AnnIndex.driftAudit(spark, out, heldOut)
        .show(truncate = false)
      println(s"== $dir shifted ==")
      graft.similarity.AnnIndex.driftAudit(spark, out, shifted)
        .show(truncate = false)
      graft.io.SwapDir.deleteRecursively(java.nio.file.Paths.get(out))
    }
    spark.stop()
  }
}
