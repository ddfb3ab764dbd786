package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * The SQL-surface contract: a session configured with
 * `spark.sql.extensions=graft.functions.GraftExtensions` can call every
 * native kernel/aggregate from plain SQL, and the results match the
 * Column-API forms the rest of the suite already verifies.
 *
 * `spark.sql.extensions` is a STATIC config resolved from the
 * SparkContext's conf — on the suite-shared context it cannot bind, so
 * this spec uses the programmatic `builder.withExtensions(new
 * GraftExtensions())` route (the same injection code spark-submit runs
 * from the conf string), on a fresh session over the shared context, and
 * restores the previous default session afterwards (suites run
 * sequentially in the forked test JVM).
 */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var previousDefault: Option[SparkSession] = None

  // a dedicated session: extensions bind at session BUILD time
  private lazy val spark: SparkSession = {
    previousDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("extensions-spec")
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    previousDefault.foreach { s =>
      SparkSession.setDefaultSession(s)
      SparkSession.setActiveSession(s)
    }
    super.afterAll()
  }

  test("scalar kernels resolve and compute from plain SQL") {
    val r = spark.sql(
      """SELECT word_count('a b c') AS wc,
        |       regex_token_count('ab cd 12') AS rc,
        |       stopword_count('the cat and the hat', array('the', 'and')) AS sc,
        |       normalize_spaces('  A  b   C ') AS ns,
        |       size(shingle_hashes('a b c d', 3)) AS nsh,
        |       round(vec_dot(array(cast(1.0 as float), cast(2.0 as float)),
        |                     array(cast(3.0 as float), cast(4.0 as float))), 6) AS dot,
        |       round(vec_norm(array(cast(3.0 as float), cast(4.0 as float))), 6) AS nrm,
        |       round(rd_lat(155000.0d, 463000.0d), 6) AS lat,
        |       round(rd_lon(155000.0d, 463000.0d), 6) AS lon,
        |       hamming_dist(array(0L, 255L), array(3L, 255L)) AS ham,
        |       bpe_token_count('aaaa ab', array('aa', 'ab')) AS bpe
        |""".stripMargin).head()
    assert(r.getAs[Int]("wc") === 3)
    assert(r.getAs[Int]("rc") === 3)
    assert(r.getAs[Int]("sc") === 3)
    assert(r.getAs[String]("ns") === "a b c")
    assert(r.getAs[Int]("nsh") === 2)
    assert(r.getAs[Double]("dot") === 11.0)
    assert(r.getAs[Double]("nrm") === 5.0)
    // RD origin of the published transform: Amersfoort
    assert(math.abs(r.getAs[Double]("lat") - 52.155174) < 1e-4)
    assert(math.abs(r.getAs[Double]("lon") - 5.387206) < 1e-4)
    assert(r.getAs[Long]("ham") === 2L) // 0^3 = two bits differ, 255^255 = 0
    assert(r.getAs[Long]("bpe") === 3L) // aaaa -> aa+aa, ab -> ab
  }

  test("injected optimizer rule bands unbounded levenshtein comparisons") {
    val s = spark
    import s.implicits._
    // parquet-backed so the optimizer can't constant-fold the whole filter
    val tmp = java.nio.file.Files.createTempDirectory("graft_lev").toString
    Seq(("kitten", "sitting"), ("kitten", "kitten"), ("abc", "zzzzzz"))
      .toDF("a", "b").write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).createOrReplaceTempView("lv")
    val q = spark.sql("SELECT a, b FROM lv WHERE levenshtein(a, b) <= 3")
    // the optimized plan runs the 3-arg banded form, not the full DP
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("Some(3)) >= 0"), s"rewrite missing:\n$opt")
    // and semantics are unchanged (kitten->sitting = 3, identity = 0)
    assert(q.collect().map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("kitten", "sitting"), ("kitten", "kitten")))
    // strict < maps to k-1: distance 3 must now be excluded
    val strict = spark.sql("SELECT count(*) FROM lv WHERE levenshtein(a, b) < 3")
      .head.getLong(0)
    assert(strict === 1L)
  }

  test("native aggregates resolve from SQL and partial-aggregate") {
    val s = spark
    import s.implicits._
    Seq((1L, "a", 3.0, Seq(1.0f, 2.0f)), (2L, "a", 7.0, Seq(3.0f, 4.0f)),
        (3L, "b", 5.0, Seq(10.0f, 20.0f)))
      .toDF("id", "g", "v", "emb").createOrReplaceTempView("t")
    val top = spark.sql(
      """SELECT g, top_k(v, id, 1) AS top, vec_sum(emb) AS vs
        |FROM t GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(top.length === 2)
    val a = top(0)
    assert(a.getAs[Seq[org.apache.spark.sql.Row]]("top").head.getLong(1) === 2L)
    assert(a.getAs[Seq[Double]]("vs") === Seq(4.0, 6.0))
    val b = top(1)
    assert(b.getAs[Seq[org.apache.spark.sql.Row]]("top").head.getLong(1) === 3L)
    // the SQL aggregate runs with a map-side partial, same as the Column form
    val plan = spark.sql("SELECT g, top_k(v, id, 1) FROM t GROUP BY g")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k"), s"no partial aggregation:\n$plan")
  }

  test("arg_max and perceptual_hash resolve from SQL") {
    val s = spark
    import s.implicits._
    Seq((1L, "a", 3.0, "lo"), (2L, "a", 7.0, "hi"), (3L, "b", 5.0, "only"))
      .toDF("id", "g", "v", "name").createOrReplaceTempView("am")
    val r = spark.sql(
      """SELECT g, arg_max(named_struct('v', v, 'id', id), name) AS w
        |FROM am GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(r.map(x => x.getString(0) -> x.getString(1)).toSeq ===
      Seq("a" -> "hi", "b" -> "only"))
    // perceptual_hash('') = all-zero bands; spec equality for real bytes
    val ph = spark.sql(
      "SELECT perceptual_hash(cast('abc' as binary)) AS p," +
        " perceptual_hash(cast('' as binary)) AS z").head()
    assert(ph.getSeq[Long](0) ===
      graft.llm.Multimodal.MediaCodecStub.phash("abc".getBytes("UTF-8")).toSeq)
    assert(ph.getSeq[Long](1) === Seq(0L, 0L, 0L, 0L))
  }

  test("cms_estimate resolves from SQL through the extension") {
    val r = spark.sql(
      """WITH sk AS (SELECT count_min_sketch(t, 0.001d, 0.99d, 7) AS s
        |  FROM (SELECT explode(array('x','x','x','y')) AS t))
        |SELECT cms_estimate(s, 'x') AS ex, cms_estimate(s, 'y') AS ey
        |FROM sk""".stripMargin).head()
    assert(r.getAs[Long]("ex") === 3L && r.getAs[Long]("ey") === 1L)
  }

  test("bitmap_distinct resolves from SQL and matches count(distinct)") {
    val r = spark.sql(
      """SELECT g, bitmap_distinct(id) AS bd, count(DISTINCT id) AS cd
        |FROM (SELECT pmod(v, 2) AS g, pmod(v, 700) AS id
        |      FROM (SELECT explode(sequence(0, 4999)) AS v))
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(r.length === 2)
    r.foreach(row => assert(row.getAs[Long]("bd") === row.getAs[Long]("cd")))
  }
}
