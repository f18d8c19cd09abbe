package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkTestBase {

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT h32_array(array('a', 'b')) AS hs,
        |       minhash_signature(h32_array(array('a', 'b'))) AS sig,
        |       simhash32(h32_array(array('a', 'b'))) AS sh,
        |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp""".stripMargin).head()
    assert(row.getSeq[Long](0).length == 2)
    assert(row.getSeq[Long](1).length == graft.functions.Hashing.NumPerms)
    assert(row.getLong(2) >= 0L && row.getLong(2) < (1L << 32))
    assert(row.getDouble(3) == 11.0)
  }

  test("SQL h32_array matches the md5-derived Column formula") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT h32_array(array('hello'))[0]").head().getLong(0)
    val viaBuiltins = spark.sql(
      "SELECT CAST(conv(substring(md5('hello'), 1, 8), 16, 10) AS BIGINT)").head().getLong(0)
    assert(viaSql == viaBuiltins)
  }

  test("withExtensions builder path installs the functions") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val v = s2.sql("SELECT dot_product(array(2.0d), array(5.0d))").head().getDouble(0)
      assert(v == 10.0)
    } finally {
      // getOrCreate may return the shared suite session; only the SQL
      // registration needs checking, never stop the shared context here
    }
  }
}
