package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-style smoke for the REAL extensions path: build a session with
  * `withExtensions(new GraftExtensions())` (what
  * `--conf spark.sql.extensions=graft.GraftExtensions` does at submit time)
  * and call every injected function from SQL. Run in its own JVM so no
  * pre-existing session can shadow the builder.
  */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-smoke")
      .withExtensions(new graft.GraftExtensions())
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val row = spark.sql(
      """SELECT fingerprint('The  quick fox') = fingerprint('the quick FOX') AS fp_norm,
               simhash64('a b c') IS NOT NULL AS sh,
               vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) = 11.0d AS vd,
               vec_norm(array(3.0d, 4.0d)) = 5.0d AS vn,
               stopword_count('the cat and the hat', 'the,and') = 3 AS sw,
               size(shingle_hashes(array('a','b','c','d'), 2)) = 3 AS sh2,
               size(minhash_sig(shingle_hashes(array('a','b','c','d'), 2), 16)) = 16 AS ms
      """).collect()(0)
    val ok = (0 until 7).forall(i => row.getBoolean(i))
    println(s"[extensions-smoke] ok=$ok row=$row")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
