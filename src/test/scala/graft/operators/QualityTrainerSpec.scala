package graft.operators

import graft.{Planted, SparkSpec}
import graft.functions.QualityKernels
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The in-engine classifier trainer: the batch-perceptron run on the
  * planted separable set must converge to the closed-form weights, the
  * feature extractor must agree with the margin kernel, and trained
  * inference must separate the held-out mixtures.
  */
class QualityTrainerSpec extends SparkSpec {
  import spark.implicits._

  private def labeled = Planted.qualityTrainDocs(spark)
    .withColumn("label", when($"lang" === "qpos", 1L).otherwise(-1L))

  /** Reference gram extraction (tokens = space runs; bigram = single-
    * space join) — independent of the kernel under test.
    */
  private def grams(text: String): Seq[String] = {
    val tk = text.trim.split(" +").filter(_.nonEmpty).toSeq
    tk ++ tk.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  private def refHash(g: String): Long =
    g.foldLeft(-1L)((h, c) => if (h < 0) c.toLong else (h * 31 + c) % QualityKernels.P)

  test("qualityFeatures agrees with qualityMargin and the reference hash") {
    val texts = Planted.qualityTrainRows.map(_._2) ++
      Planted.qualityEvalRows.map(_._2) ++
      Seq("", "   ", "one", "a b a b a")
    texts.foreach { t =>
      val feats = QualityKernels.qualityFeatures(UTF8String.fromString(t))
        .toLongArray().toSeq
      val expected = {
        // kernel order interleaves (uni, bigram-ending-here); compare as
        // multisets — training is order-independent
        grams(t).map(refHash)
      }
      assert(feats.sorted === expected.sorted, s"feature ids differ for '$t'")
      val margin = QualityKernels.qualityMargin(UTF8String.fromString(t))
      assert(margin === feats.map(h => (h % QualityKernels.NW) - 1000L).sum,
        s"margin != sum of feature weights for '$t'")
    }
  }

  test("the planted gram universe is hash-collision-free (schedule proof)") {
    val univ = (Planted.qualityTrainRows.map(_._2) ++
      Planted.qualityEvalRows.map(_._2)).flatMap(grams).distinct
    val byHash = univ.groupBy(refHash)
    val collided = byHash.filter(_._2.size > 1)
    assert(collided.isEmpty, s"hash collisions: $collided")
    info(s"${univ.size} distinct grams, 0 collisions")
  }

  test("training converges to the closed-form posCount - negCount weights") {
    // leak discipline via snapshot-diff: the full suite's shared session
    // may hold other suites' cached blocks — assert only that train()
    // itself pins nothing new
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val trained = QualityTrainer.train(labeled)
      .as[(Long, Long)].collect().toMap
    // closed form, derived independently from the reference extraction
    val expected = Planted.qualityTrainRows
      .flatMap { case (_, text, lang, _, _) =>
        val y = if (lang == "qpos") 1L else -1L
        grams(text).map(g => refHash(g) -> y)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      .filter(_._2 != 0L)
    assert(trained === expected)
    // the shared token nets to zero and is dropped
    assert(!trained.contains(refHash("qsh")))
    assert(spark.sparkContext.getPersistentRDDs.keySet === pinnedBefore)
  }

  test("trained weights separate the training set and score held-out mixtures") {
    val w = QualityTrainer.train(labeled)
    val trainScored = QualityTrainer.scoreWith(labeled, w)
      .join(labeled.select($"doc_id", $"label"), Seq("doc_id"))
    assert(trainScored.filter(($"margin_units" > 0) =!= ($"label" > 0)).isEmpty,
      "trained weights must classify the separable training set perfectly")
    val evalScored = QualityTrainer.scoreWith(Planted.qualityEvalDocs(spark), w)
      .select($"doc_id", $"kept").as[(Long, Boolean)].collect().toMap
    // pos-heavy mixtures (even e) keep, neg-heavy (odd e) drop
    (0 until 10).foreach { e =>
      assert(evalScored(Planted.qtBase + 200L + e) === (e % 2 == 0),
        s"eval doc $e mis-scored")
    }
  }

  test("inseparable input stops at maxRounds without diverging") {
    // identical text, opposite labels: no linear separator exists
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val docs = Seq(
      (1L, "same text twice", 1L),
      (2L, "same text twice", -1L)).toDF("doc_id", "text", "label")
    val w = QualityTrainer.train(docs, maxRounds = 4)
    // the duplicate-content updates cancel each round; weights stay empty
    assert(w.count() === 0)
    assert(spark.sparkContext.getPersistentRDDs.keySet === pinnedBefore)
  }

  private def noisyLabeled = Planted.qualityNoisyTrainDocs(spark)
    .withColumn("label", when($"lang" === "qpos", 1L).otherwise(-1L))

  test("averaged training matches the closed form on the noisy planted set") {
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val avg = QualityTrainer.trainAveraged(noisyLabeled, rounds = 8)
      .as[(Long, Long)].collect().toMap
    // closed form (trainAveraged scaladoc): per occurrence +8 pos, -7
    // neg, +3 extra in the duplicated text — derived independently via
    // the reference extraction
    val dupText = Planted.qualityTrainRows.head._2
    val contrib = Planted.qualityNoisyTrainRows
      .flatMap { case (_, text, lang, _, _) =>
        val base = if (lang == "qpos") 8L else -7L
        val dup = if (lang == "qflip") 3L else 0L
        grams(text).map(g => refHash(g) -> (base + dup))
      }
    val expected = contrib.groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap.filter(_._2 != 0L)
    assert(avg === expected)
    // spot values: shared token 8*20-7*21+3 = 16; a duplicated-doc
    // unigram 8-7+3 = 4; an untouched positive unigram 8
    assert(avg(refHash("qsh")) === 16L)
    assert(avg(refHash("qp0x0")) === 4L)
    assert(avg(refHash("qp1x0")) === 8L)
    assert(expected.keySet.contains(refHash(dupText.split(" ").head)))
    assert(spark.sparkContext.getPersistentRDDs.keySet === pinnedBefore)
  }

  test("averaged weights give stable verdicts where the last iterate cycles") {
    // the plain loop's verdict on the duplicated pair depends on the
    // PARITY of maxRounds (the 2-cycle); the averaged table's does not
    def pairVerdict(w: org.apache.spark.sql.DataFrame): Boolean =
      QualityTrainer.scoreWith(noisyLabeled, w)
        .filter($"doc_id" === Planted.qtBase)
        .select($"kept").as[Boolean].head()
    val odd = QualityTrainer.train(noisyLabeled, maxRounds = 7)
    val even = QualityTrainer.train(noisyLabeled, maxRounds = 8)
    assert(pairVerdict(odd) !== pairVerdict(even),
      "expected the last-iterate verdict to flip with round parity")
    val avg8 = QualityTrainer.trainAveraged(noisyLabeled, rounds = 8)
      .withColumnRenamed("weight_sum", "weight")
    val avg12 = QualityTrainer.trainAveraged(noisyLabeled, rounds = 12)
      .withColumnRenamed("weight_sum", "weight")
    assert(pairVerdict(avg8) && pairVerdict(avg12),
      "averaged verdict must be stable across horizons (majority vote)")
    // and the averaged table still classifies every non-duplicated doc
    val scored = QualityTrainer.scoreWith(noisyLabeled, avg8)
      .join(noisyLabeled.select($"doc_id", $"label"), Seq("doc_id"))
      .filter($"doc_id" =!= Planted.qtBase && $"doc_id" =!= Planted.qtBase + 500L)
    assert(scored.filter(($"margin_units" > 0) =!= ($"label" > 0)).isEmpty)
  }

  test("averaged training on a separable set converges and separates") {
    // early convergence: every unexecuted round contributes a frozen
    // iterate to the sum — the delta-multiplier bookkeeping must stay
    // consistent (sign-equivalence with the converged train() weights)
    val avg = QualityTrainer.trainAveraged(labeled, rounds = 8)
      .withColumnRenamed("weight_sum", "weight")
    val scored = QualityTrainer.scoreWith(labeled, avg)
      .join(labeled.select($"doc_id", $"label"), Seq("doc_id"))
    assert(scored.filter(($"margin_units" > 0) =!= ($"label" > 0)).isEmpty,
      "averaged weights must classify the separable training set perfectly")
  }
}
