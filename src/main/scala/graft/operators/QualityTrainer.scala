package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.IterState
import graft.functions.QualityExprs

/** In-engine training for the q155 quality classifier — a real pipeline
  * does not ship fixed hashed weights, it TRAINS them on a labeled set
  * and serves inference through the same feature space.
  *
  * The learner is the batch PERCEPTRON (Rosenblatt 1958; the batch
  * variant is the textbook distributed form — each round is one full
  * pass, the update is a pure SUM over misclassified examples, so it is
  * order-independent and shuffle-parallel, unlike sequential SGD whose
  * result depends on visit order and which therefore cannot be
  * replayed cross-engine):
  *
  *   w_0 = 0;  w_{t+1} = w_t + Σ_{i misclassified} y_i · x_i
  *
  * with y ∈ {+1, −1}, x a document's integer feature-count vector over
  * the hashed unigram+bigram space of
  * [[graft.functions.QualityKernels]] (same rolling-31 mod-1000003
  * feature hash as the fixed q155 scorer — trained weights plug into
  * the identical gram extraction), and "misclassified" = `(margin > 0)
  * != (y > 0)` (the q155 keep rule: sigmoid is monotone, so the 0.5
  * boundary is margin 0). All arithmetic stays in exact integers:
  * weights are integer sums of integer counts — the quantization
  * convention q155 established, with no float step to drift
  * cross-engine.
  *
  * Each round is two vocab/corpus-keyed shuffles (margin agg keyed by
  * doc, delta agg keyed by feature) with the feature table persisted
  * once up front; the weight table is vocab-sized and never collected.
  * On a linearly separable set the loop terminates (perceptron
  * convergence theorem); `maxRounds` bounds the inseparable case. At
  * 100 TB this is the standard shape: featurize is a map-only explode,
  * every agg is partial→final, and the per-round driver work is one
  * count.
  *
  * Closed-form oracle hook (the q192 trick): on a planted set where
  * round 1 misclassifies exactly the positives and round 2 exactly the
  * negatives (class-disjoint exclusive grams + one shared token with
  * equal class totals — [[graft.Planted.qualityTrainDocs]]), the
  * converged weights are just `posCount(f) − negCount(f)`, derivable in
  * SQL per feature hash.
  */
object QualityTrainer {

  /** (idCol, feat, cnt): one row per document per DISTINCT feature id,
    * cnt = occurrences. Documents with no grams contribute no rows (they
    * have margin 0 under every weight table).
    */
  def featurize(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
        explode(QualityExprs.qualityFeatures(col(textCol))).as("feat"))
      .groupBy(col(idCol), col("feat"))
      .agg(count(lit(1)).as("cnt"))

  /** Train on `labeled` (`labelCol` ∈ {+1, −1}) and return the trained
    * weight table (feat BIGINT, weight BIGINT), zero-weight rows
    * dropped. Deterministic: the batch update is a sum, so no ordering
    * anywhere affects the result.
    *
    * Convergence is over documents WITH at least one gram: featurize
    * emits no rows for empty/whitespace-only text, so a gram-less doc
    * never appears in the margin scan — it scores margin 0 (dropped by
    * the keep rule) under EVERY weight table, and no update could ever
    * move it. A positive-labeled gram-less doc is therefore permanently
    * misclassified without blocking convergence; that is a property of
    * the feature space (there is nothing to weight), not of the loop.
    */
  def train(labeled: DataFrame, maxRounds: Int = 16, textCol: String = "text",
            labelCol: String = "label", idCol: String = "doc_id"): DataFrame = {
    val feats = featurize(labeled, textCol, idCol)
      .join(labeled.select(col(idCol),
        col(labelCol).cast("long").as("__y")), Seq(idCol))
    val (featsCp, releaseFeats) = IterState.checkpoint(feats)
    var weights = featsCp.select(col("feat")).distinct()
      .withColumn("weight", lit(0L))
    var (wCp, releaseW) = IterState.checkpoint(weights)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val margins = featsCp.join(wCp, Seq("feat"))
        .groupBy(col(idCol), col("__y"))
        .agg(sum(col("cnt") * col("weight")).as("__m"))
      val mis = margins
        .filter((col("__m") > 0) =!= (col("__y") > 0))
        .select(col(idCol))
      // converged ⟺ no misclassified doc ⟺ the update would be empty;
      // mis is checkpointed so the emptiness probe and the delta agg
      // share one materialization
      val (misCp, releaseMis) = IterState.checkpoint(mis)
      if (misCp.isEmpty) {
        converged = true
        releaseMis()
      } else {
        val delta = featsCp.join(misCp, Seq(idCol))
          .groupBy(col("feat"))
          .agg(sum(col("cnt") * col("__y")).as("__d"))
        val next = wCp.join(delta, Seq("feat"), "left")
          .select(col("feat"),
            (col("weight") + coalesce(col("__d"), lit(0L))).as("weight"))
        val (nextCp, releaseNext) = IterState.checkpoint(next)
        releaseMis()
        releaseW()
        wCp = nextCp; releaseW = releaseNext
      }
      rounds += 1
    }
    val out = IterState.copyOut(wCp.filter(col("weight") =!= 0L))
    releaseW()
    releaseFeats()
    out
  }

  /** AVERAGED batch perceptron (Freund & Schapire 1999's averaging
    * applied to the batch update) — the semantics [[train]] lacks on a
    * NON-separable set: there the plain loop runs `maxRounds` and ships
    * whatever iterate it last computed (the batch analog of the
    * perceptron's cycling), while the average over iterates is a stable
    * majority vote across the cycle. Classification by margin sign is
    * invariant to positive scaling, so the UNDIVIDED sum
    *
    *   weight_sum[f] = Σ_{t=1..rounds} w_t[f]
    *
    * is returned instead of the mean — it stays in exact integers (the
    * q155 quantization convention) with no float step to drift
    * cross-engine. Computed without retaining per-round tables via the
    * delta form: w_t = Σ_{r<=t} δ_r gives
    * Σ_t w_t = Σ_r (rounds − r + 1)·δ_r, so each round's (vocab-sized)
    * update aggregate is scaled by its remaining-round count and one
    * final feat-keyed sum folds them — order-independent and
    * shuffle-parallel exactly like [[train]], valid under early
    * convergence too (δ_r = 0 for every unexecuted round).
    *
    * `rounds` is part of the SEMANTICS here (the averaging horizon),
    * not just a safety bound — two calls with different `rounds` on a
    * non-separable set return different (sign-equivalent only on the
    * stable points) tables. Output: (feat BIGINT, weight_sum BIGINT),
    * zero rows dropped; rename to `weight` to feed [[scoreWith]].
    *
    * Closed-form oracle hook (q201): on the q194 planted set plus ONE
    * duplicated-and-flipped positive doc (identical text, label −1 —
    * doc-exclusive grams make any duplicate-free labeling separable,
    * so the duplicate pair is the minimal non-separable noise), the
    * schedule is derivable: rounds 1–2 replay q194's, and from round 3
    * the loop 2-cycles (exactly one of the pair misclassified,
    * alternating), giving weight_sum = rounds·posCount −
    * (rounds−1)·negCount + ((rounds−2)/2)·dupCount for even `rounds`,
    * with dupCount = the duplicated text's own counts.
    */
  def trainAveraged(labeled: DataFrame, rounds: Int = 8,
                    textCol: String = "text", labelCol: String = "label",
                    idCol: String = "doc_id"): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val feats = featurize(labeled, textCol, idCol)
      .join(labeled.select(col(idCol),
        col(labelCol).cast("long").as("__y")), Seq(idCol))
    val (featsCp, releaseFeats) = IterState.checkpoint(feats)
    var weights = featsCp.select(col("feat")).distinct()
      .withColumn("weight", lit(0L))
    var (wCp, releaseW) = IterState.checkpoint(weights)
    val deltas = scala.collection.mutable.ArrayBuffer
      .empty[(DataFrame, () => Unit, Int)]
    var t = 1
    var converged = false
    while (!converged && t <= rounds) {
      val margins = featsCp.join(wCp, Seq("feat"))
        .groupBy(col(idCol), col("__y"))
        .agg(sum(col("cnt") * col("weight")).as("__m"))
      val mis = margins
        .filter((col("__m") > 0) =!= (col("__y") > 0))
        .select(col(idCol))
      val (misCp, releaseMis) = IterState.checkpoint(mis)
      if (misCp.isEmpty) {
        converged = true
        releaseMis()
      } else {
        val delta = featsCp.join(misCp, Seq(idCol))
          .groupBy(col("feat"))
          .agg(sum(col("cnt") * col("__y")).as("__d"))
        val (deltaCp, releaseDelta) = IterState.checkpoint(delta)
        releaseMis()
        deltas += ((deltaCp, releaseDelta, rounds - t + 1))
        val next = wCp.join(deltaCp, Seq("feat"), "left")
          .select(col("feat"),
            (col("weight") + coalesce(col("__d"), lit(0L))).as("weight"))
        val (nextCp, releaseNext) = IterState.checkpoint(next)
        releaseW()
        wCp = nextCp; releaseW = releaseNext
      }
      t += 1
    }
    val out =
      if (deltas.isEmpty)
        // no update ever fired: every iterate is 0, zero rows drop to none
        IterState.copyOut(featsCp.select(col("feat"))
          .withColumn("weight_sum", lit(0L)).limit(0))
      else
        IterState.copyOut(
          deltas.map { case (d, _, mult) =>
            d.select(col("feat"), (col("__d") * lit(mult.toLong)).as("__w"))
          }.reduce(_ unionByName _)
            .groupBy(col("feat"))
            .agg(sum(col("__w")).as("weight_sum"))
            .filter(col("weight_sum") =!= 0L))
    deltas.foreach(_._2())
    releaseW()
    releaseFeats()
    out
  }

  /** Margin of every document under a TRAINED weight table — the
    * inference half: same gram ids, vocab-keyed join, one per-doc sum;
    * docs whose grams are all absent from the table (or that have no
    * grams) score 0, exactly as an untrained-feature weight of zero.
    * Output: (idCol, margin_units BIGINT, kept BOOLEAN).
    */
  def scoreWith(docs: DataFrame, weights: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val sums = featurize(docs, textCol, idCol)
      .join(weights, Seq("feat"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * col("weight")).as("__m"))
    docs.select(col(idCol))
      .join(sums, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__m"), lit(0L)).as("margin_units"))
      .withColumn("kept", col("margin_units") > 0)
  }
}
