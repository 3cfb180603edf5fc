package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomFilter

/** Runtime Bloom-filter join pruning: shrink the PROBE side of a selective
  * join BEFORE its shuffle, using a Bloom filter built from the (already
  * filtered, much smaller) BUILD side's join keys.
  *
  * The 100 TB problem this solves: `fact JOIN dim_filtered` shuffles the
  * ENTIRE fact table on the join key even when the dimension filter implies
  * that only a sliver of fact rows can match — the shuffle, not the join,
  * is the bottleneck. A Bloom filter over the build side's keys is a few
  * MB (~1.2 bits/key at 10 bits/key sizing) regardless of fact size; probing
  * it is a per-row codegen'd bit test applied at the SCAN, so non-matching
  * fact rows die before the exchange and the shuffle carries only true
  * matches plus the small false-positive sliver. Bloom filters admit false
  * positives only, so the join itself still runs and correctness is
  * unchanged — the filter is purely a row-volume reducer (the same
  * semi-join-reduction idea as Bloom joins in distributed databases; Spark's
  * own `runtime.bloomFilter` optimizer rule plants the same shape when
  * statistics allow — this operator is the explicit, deterministic form).
  *
  * Cost model: two actions over the BUILD side (a count to size the filter,
  * then the filter aggregate — both over the side the caller already made
  * small) and one driver round-trip of the filter bytes; the probe side
  * pays one codegen'd probe per row. The filter rides into tasks as a
  * BinaryType literal (one object reference, no per-row copy — see
  * [[graft.functions.BloomFilter]]).
  */
object BloomJoin {

  /** Build the Bloom bitset over `build`'s `key` column (collects only the
    * filter bytes — k-sized: `bitsPerKey` bits per build row).
    */
  def keyFilter(build: DataFrame, key: String, bitsPerKey: Int = 10,
                numHashes: Int = 7): Array[Byte] = {
    val n = math.max(build.count(), 1L)
    val bits = BloomFilter.suggestedNumBits(n, bitsPerKey)
    build
      .agg(BloomFilter.bloomAgg(xxhash64(col(key)), bits, numHashes).as("f"))
      .head().getAs[Array[Byte]](0)
  }

  /** `probe ⋈ build` with the probe side pre-pruned by a Bloom filter on
    * the build side's keys. Exact inner-join semantics: the filter has no
    * false negatives, and its false positives are removed by the join.
    */
  def prunedInnerJoin(probe: DataFrame, probeKey: String,
                      build: DataFrame, buildKey: String,
                      bitsPerKey: Int = 10, numHashes: Int = 7): DataFrame = {
    val bytes = keyFilter(build, buildKey, bitsPerKey, numHashes)
    val pruned = probe.filter(
      BloomFilter.mightContain(lit(bytes), xxhash64(col(probeKey)), numHashes))
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }
}
