package graft

import org.apache.spark.sql.SparkSessionExtensions

class GraftExtensionsSpec extends SparkSpec {

  test("extensions payload registers every SQL-spellable custom function") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    org.apache.spark.sql.graft.bridge.applyExtensionFunctions(spark, ext)

    val row = spark.sql(
      """SELECT fingerprint('The  quick fox') AS fp1,
                fingerprint('the quick FOX') AS fp2,
                simhash64('a b c') AS sh,
                vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                vec_norm(array(3.0d, 4.0d)) AS n,
                stopword_count('the cat and the hat', 'the,and') AS sw,
                size(shingle_hashes(array('a','b','c','d'), 2)) AS nsh,
                size(minhash_sig(shingle_hashes(array('a','b','c','d'), 2), 16)) AS nsig
      """).collect()(0)
    assert(row.getLong(0) === row.getLong(1)) // fingerprint normalization
    assert(row.getDouble(3) === 11.0)
    assert(row.getDouble(4) === 5.0)
    assert(row.getInt(5) === 3)
    assert(row.getInt(6) === 3)  // 4 tokens -> 3 distinct 2-gram shingles
    assert(row.getInt(7) === 16) // signature length = k
  }

  test("stopword_count rejects a non-literal word list") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    org.apache.spark.sql.graft.bridge.applyExtensionFunctions(spark, ext)
    val e = intercept[Exception] {
      spark.sql("SELECT stopword_count('x', lower('THE'))").collect()
    }
    assert(e.getMessage.contains("literal"))
  }
}
