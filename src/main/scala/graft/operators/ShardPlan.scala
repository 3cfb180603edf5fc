package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Balanced output-shard planning: assign every document to one of
  * `nShards` output shards so shard byte-totals balance — the write-side
  * twin of the mixing family (a 100 TB corpus is useless if shard 0 holds
  * half of it), done as the serpentine (boustrophedon) variant of
  * longest-processing-time: rows descend by size and snake across the
  * shards, so each shard receives the r-th largest item of every round of
  * 2·nShards and totals stay within one item of each other.
  *
  * The interesting part at scale is the GLOBAL RANK the serpentine needs.
  * A `row_number() OVER (ORDER BY size DESC)` window is a single-partition
  * sort — the one plan shape this repo bans. [[DistRank.byRange]] instead
  * range-repartitions on the order key and zips partition-local indexes
  * with per-partition offsets (the two-pass distributed rank: one count
  * per partition — a k-sized driver array — then a map-only index add).
  * Every stage is partition-parallel; nothing data-sized touches the
  * driver. The order key must be a TOTAL order (ties broken by id) so the
  * rank — and everything downstream — is engine-deterministic.
  */
object ShardPlan {

  /** Per-row shard assignment: `(idCol, sizeCol, rank, shard)` with rank
    * 1-based by (size desc, id asc) and the serpentine fold
    * `shard = pos` on even rounds, `nShards-1-pos` on odd rounds
    * (round = (rank-1) / nShards, pos = (rank-1) % nShards).
    */
  def assign(docs: DataFrame, idCol: String, sizeCol: Column, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val sized = docs.select(col(idCol), sizeCol.cast("bigint").as("size"))
    val ranked = DistRank.byRange(sized, Seq(col("size").desc, col(idCol).asc))
    val idx = col("rank") - 1
    val round = floor(idx / nShards)
    val pos = pmod(idx, lit(nShards))
    ranked.withColumn("shard",
      when(pmod(round, lit(2)) === 0, pos)
        .otherwise(lit(nShards - 1) - pos).cast("int"))
  }

  /** Shard-level plan summary: `(shard, n_docs, total_size, rank_sum)`. */
  def summary(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("size")).as("total_size"),
        sum(col("rank")).as("rank_sum"))
      .orderBy(col("shard"))
}

/** Distributed global rank over a total order, without a single-partition
  * window: range-repartition + in-partition sort, then per-partition row
  * counts (the only driver-side state — one long per partition) fold into
  * offsets added map-side. Same two-pass scheme as RDD.zipWithIndex, kept
  * at the DataFrame boundary so the result is a plain column.
  */
object DistRank {

  /** Append a 0-based EXCLUSIVE running sum of `valueField` following
    * `order` (must be total) as column `offset` — the prefix-sum twin of
    * [[byRange]], same two passes over one range shuffle: per-partition
    * VALUE totals (one long per partition on the driver) fold into
    * offsets added map-side beside a partition-local running sum. The
    * first row in the order gets offset 0; row i gets the sum of all
    * earlier rows' values. [[SequencePack]]'s global token stream.
    */
  def prefixSum(df: DataFrame, order: Seq[Column], valueField: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val vIdx = sorted.schema.fieldIndex(valueField)
    val rdd = sorted.rdd
    val sums = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(vIdx))
      Iterator.single(i -> s)
    }.collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _)
    val withOffset = rdd.mapPartitionsWithIndex { (i, it) =>
      var run = offsets(i)
      it.map { row =>
        val out = Row.fromSeq(row.toSeq :+ run)
        run += row.getLong(vIdx)
        out
      }
    }
    val schema = StructType(sorted.schema.fields :+
      StructField("offset", LongType, nullable = false))
    spark.createDataFrame(withOffset, schema)
  }

  /** Append a 1-based `rank` column following `order` (must be total). */
  def byRange(df: DataFrame, order: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    // No cache, deliberately: both passes share the one range-shuffle's
    // map files (same RDD lineage, so the exchange is written once and the
    // count pass re-reads it), and nothing survives in the block manager —
    // the IterState zero-persistent-RDDs discipline holds with no cleanup.
    val rdd = sorted.rdd
    val counts = rdd.mapPartitionsWithIndex { (i, it) =>
      Iterator.single(i -> it.size.toLong)
    }.collect().sortBy(_._1).map(_._2) // one long per partition
    val offsets = counts.scanLeft(1L)(_ + _) // rank is 1-based
    val indexed = rdd.mapPartitionsWithIndex { (i, it) =>
      val base = offsets(i)
      it.zipWithIndex.map { case (row, j) =>
        Row.fromSeq(row.toSeq :+ (base + j))
      }
    }
    val schema = StructType(sorted.schema.fields :+
      StructField("rank", LongType, nullable = false))
    spark.createDataFrame(indexed, schema)
  }
}
