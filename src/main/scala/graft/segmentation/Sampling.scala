package graft.segmentation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.rand

/** Random sampling / centroid initialization.
  *
  * The reference shuffles globally with `orderBy(rand())` and takes the first
  * k rows as initial centroids (reference: codeText.txt:17,53-56). Catalyst
  * plans sort+limit as TakeOrderedAndProject (a distributed top-k with only
  * k rows per partition surviving to the driver), so this stays cheap at any
  * scale — no global sort materializes.
  *
  * Deviation from the reference (documented per SURVEY §4): the reference's
  * `rand()` is unseeded and irreproducible; our contract takes an explicit
  * seed so tests and goldens are deterministic.
  */
object Sampling {

  /** O1: global random shuffle (codeText.txt:17). */
  def shuffled(df: DataFrame, seed: Long): DataFrame =
    df.orderBy(rand(seed))

  /** O2+O3: k uniform-random rows via seeded sort+limit (codeText.txt:55). */
  def randomRows(df: DataFrame, k: Int, seed: Long): DataFrame =
    df.orderBy(rand(seed)).limit(k)

  /** U2: random centroid initialization — sample k rows of the given numeric
    * columns and collect as dense points (codeText.txt:53-56).
    */
  def initialCentroids(df: DataFrame, dims: Seq[String], k: Int, seed: Long): Array[Array[Double]] = {
    import org.apache.spark.sql.functions.col
    val casted = df.select(dims.map(c => col(c).cast("double")): _*)
    // a sampled dirty row (NULL after permissive cast) must not NPE the
    // collect — K-means operates on the non-null point set (KMeansMR.fit
    // filters identically)
    val clean = casted.filter(dims.indices.map(i => casted(casted.columns(i)).isNotNull).reduce(_ && _))
    randomRows(clean, k, seed)
      .collect()
      .map(r => dims.indices.map(i => r.getDouble(i)).toArray)
  }
}
