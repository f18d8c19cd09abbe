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

  // round-13: the three signature expressions moved off CodegenFallback to
  // real doGenCode. CODEGEN_ONLY forbids the interpreted fallback (a
  // generated-code compile error throws instead of silently degrading), so
  // this pins BOTH that the generated code compiles AND that it is
  // bit-identical to nullSafeEval across the edge shapes: null elements,
  // all-null arrays, empty arrays (all-NULL minhash signature), and wide
  // (128-perm) signatures.
  test("signature expressions: codegen and interpreted paths are bit-identical") {
    import graft.expressions.SignatureExpressions._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      Seq("a", "b", "c"),
      Seq.empty[String],
      Seq("hello world", "a", null),
      Seq(null.asInstanceOf[String]),
      Seq("x" * 1000, "", "δοκιμή"))
    def collectAll(mode: String): Seq[String] = {
      val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        import spark.implicits._
        rows.toDF("toks")
          .select(
            h32Array(col("toks")).as("hs"),
            minhashSignature(h32Array(col("toks"))).as("sig16"),
            minhashSignature(h32Array(col("toks")),
                             graft.functions.Hashing.NumPermsWide).as("sig128"),
            simhash32(h32Array(col("toks"))).as("sh"))
          .collect().toSeq.map(_.toString)
      } finally prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    val generated = collectAll("CODEGEN_ONLY")
    val interpreted = collectAll("NO_CODEGEN")
    assert(generated == interpreted)
    // and the values are real, not accidentally all-default
    assert(generated.head.nonEmpty)
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
