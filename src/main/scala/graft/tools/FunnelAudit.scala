package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** One-off blocking-funnel adjudication across scale dirs — the numbers
  * behind THREESCALE.md's q136/q133 growth analysis (the round-11 verdict's
  * "no silent caps" order: candidate-pair and survivor counts per scale,
  * measured, not argued from scaladoc).
  *
  * Usage: `runMain graft.tools.FunnelAudit [--op=a,b] <sfDir> [...]` —
  * prints one JSON line per (dir, operator) with the [[graft.dedup
  * .EditDistanceJoin.blockingStats]] and [[graft.dedup.PrefixFilterJoin
  * .blockingStats]] rows plus wall seconds for the stats pass itself.
  * Ops: `editdist`, `prefix` (default both — the round-12 set), `bigram`
  * (the round-13 q165 adjudication: [[graft.operators.BigramLM
  * .funnelStats]] sizes + a timed dedicated crossEntropy run with the
  * final AQE join strategies read from the executed plan).
  */
object FunnelAudit {
  def main(rawArgs: Array[String]): Unit = {
    val (opArgs, args) = rawArgs.partition(_.startsWith("--op="))
    val ops: Set[String] = opArgs.headOption
      .map(_.stripPrefix("--op=").split(",").toSet)
      .getOrElse(Set("editdist", "prefix"))
    require(args.nonEmpty, "usage: FunnelAudit [--op=a,b] <sfDir> [...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries // touch the registry so Tables caches warm the same way
    args.foreach { dir =>
      if (ops("bigram")) {
        val docs = Tables.documents(spark, dir)
        val t0 = System.nanoTime()
        val f = graft.operators.BigramLM.funnelStats(docs).head()
        val tF = (System.nanoTime() - t0) / 1e9
        // dedicated timed run of the full operator. The join-strategy
        // counts must come from the plan that ACTUALLY RAN: a
        // DataFrameWriter.save builds its own QueryExecution, so reading
        // ce.queryExecution.executedPlan here would print the
        // pre-execution AQE plan (isFinalPlan=false) and miss runtime
        // SMJ->BHJ conversions — capture the executed QE via a
        // QueryExecutionListener on the (warm) second write instead.
        val ce = graft.operators.BigramLM.crossEntropy(docs)
        val t1 = System.nanoTime()
        ce.write.format("noop").mode("overwrite").save()
        val tCe = (System.nanoTime() - t1) / 1e9
        val captured = new java.util.concurrent.atomic.AtomicReference[String]("")
        val ql = new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            captured.compareAndSet("", qe.executedPlan.toString); ()
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        }
        spark.listenerManager.register(ql)
        val t2 = System.nanoTime()
        ce.write.format("noop").mode("overwrite").save()
        val tCe2 = (System.nanoTime() - t2) / 1e9
        // the listener fires on the async listener bus — poll briefly
        var waited = 0
        while (captured.get().isEmpty && waited < 5000) {
          Thread.sleep(100); waited += 100
        }
        spark.listenerManager.unregister(ql)
        val plan =
          if (captured.get().nonEmpty) captured.get()
          else ce.queryExecution.executedPlan.toString // fallback: static estimate
        def n(s: String) = s.r.findAllMatchIn(plan).size
        println(s"""{"dir":"$dir","op":"bigram","n_docs":${f.getLong(0)},""" +
          s""""n_events":${f.getLong(1)},"n_tf_rows":${f.getLong(2)},""" +
          s""""n_vocab":${f.getLong(3)},"n_left":${f.getLong(4)},""" +
          s""""n_uni":${f.getLong(5)},"bhj":${n("BroadcastHashJoin")},""" +
          s""""smj":${n("SortMergeJoin")},"shj":${n("ShuffledHashJoin")},""" +
          f""""stats_sec":$tF%.1f,"ce_sec":$tCe%.2f,"ce_sec2":$tCe2%.2f}""")
      }
      if (ops("bpe")) {
        // the round-13 tokenizer-training cost curve: 1000 merges on the
        // ORGANIC corpus (or to pair-table exhaustion on small vocabs),
        // with the batched selector's acceptance per driver trip — the
        // curve that shows how batch acceptance behaves as counts
        // flatten into ties (dominance prefix shrinking toward 1)
        val trips = scala.collection.mutable.ArrayBuffer.empty[Int]
        val t0 = System.nanoTime()
        val merges = graft.operators.BpeTrainer.learnMerges(
          Tables.documents(spark, dir), nMerges = 1000, batchLimit = 1024,
          onBatch = (_, n) => trips += n).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val a = trips.toSeq
        val deciles = if (a.isEmpty) Seq.empty
          else (0 to 9).map(d => a((a.length - 1) * d / 9))
        println(s"""{"dir":"$dir","op":"bpe","n_merges":$merges,""" +
          s""""n_trips":${a.length},"accepted_per_trip":[${deciles.mkString(",")}],""" +
          s""""min_accepted":${if (a.isEmpty) 0 else a.min},""" +
          s""""max_accepted":${if (a.isEmpty) 0 else a.max},""" +
          f""""sec":$sec%.1f}""")
      }
      if (ops("bpelocal")) {
        // the distill-then-local trainer: one cluster pass + an
        // in-memory merge loop; trips is definitionally 1 collect for
        // the whole run. SPARK_GRAFT_BPE_MERGES overrides the merge
        // count (default 1000; set 32768 for the 32k-regime headline —
        // the loop stops early at pair-table exhaustion)
        val nM = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "1000").toInt
        val t0 = System.nanoTime()
        val merges = graft.operators.BpeTrainer.learnMergesDistilled(
          Tables.documents(spark, dir), nMerges = nM).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(s"""{"dir":"$dir","op":"bpelocal","n_merges":$merges,""" +
          f""""n_trips":1,"sec":$sec%.1f}""")
      }
      if (ops("bpeencode")) {
        // the serving half end-to-end: train to exhaustion through the
        // distilled path, then count every document's subwords under the
        // FULL table via encodeWithTable (subwordCounts' chained
        // replaces cannot express a 1k+-merge table at all — the plan
        // itself would be O(table))
        val docs = Tables.documents(spark, dir)
        val t0 = System.nanoTime()
        val merges = graft.operators.BpeTrainer
          .learnMergesDistilled(docs, nMerges = 32768)
          .orderBy(org.apache.spark.sql.functions.col("round")).collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        val tTrain = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val agg = graft.operators.BpeTrainer.encodeWithTable(docs, merges)
          .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n_docs"),
            org.apache.spark.sql.functions.sum("n_words").as("w"),
            org.apache.spark.sql.functions.sum("n_subwords").as("s"))
          .head()
        val tEnc = (System.nanoTime() - t1) / 1e9
        println(s"""{"dir":"$dir","op":"bpeencode","n_merges":${merges.length},""" +
          s""""n_docs":${agg.getLong(0)},"n_words":${agg.getLong(1)},""" +
          s""""n_subwords":${agg.getLong(2)},""" +
          f""""train_sec":$tTrain%.1f,"encode_sec":$tEnc%.1f}""")
      }
      if (ops("editdist")) {
        val t0 = System.nanoTime()
        val ed = graft.dedup.EditDistanceJoin
          .blockingStats(Tables.customer(spark, dir), "c_custkey", "c_name")
          .head()
        val tEd = (System.nanoTime() - t0) / 1e9
        println(s"""{"dir":"$dir","op":"editdist","n_strings":${ed.getLong(0)},""" +
          s""""n_variant_rows":${ed.getLong(1)},"n_candidates":${ed.getLong(2)},""" +
          s""""n_verified":${ed.getLong(3)},"n_pairs":${ed.getLong(4)},""" +
          f""""sec":$tEd%.1f}""")
      }
      if (ops("prefix")) {
        val t1 = System.nanoTime()
        val pf = graft.dedup.PrefixFilterJoin
          .blockingStats(Tables.documents(spark, dir), num = 4, den = 5,
            shingleWords = 5)
          .head()
        val tPf = (System.nanoTime() - t1) / 1e9
        println(s"""{"dir":"$dir","op":"prefix","n_docs":${pf.getLong(0)},""" +
          s""""n_prefix_rows":${pf.getLong(1)},"n_candidate_slots":${pf.getLong(2)},""" +
          s""""n_candidate_pairs":${pf.getLong(3)},"n_result_pairs":${pf.getLong(4)},""" +
          f""""sec":$tPf%.1f}""")
      }
    }
    spark.stop()
  }
}
