package graft.llm

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Golden-offset tests for [[Dedup.exactSubstrSpans]] (d23): planted
  * cross-doc substrings must come back as exact word-offset spans. */
class ExactSubstrSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("exact-substr-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def spans(rows: Seq[(Long, String)], w: Int): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    Dedup.exactSubstrSpans(rows.toDF("doc_id", "text"), w)
      .orderBy("doc_id", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
  }

  test("planted shared run yields exact offsets in both docs; unique doc yields none") {
    val c = "common1 common2 common3 common4 common5 common6"
    val got = spans(Seq(
      1L -> s"x1 x2 $c a7 a8",        // shared run at words [2, 8)
      2L -> s"b1 $c b8 b9",           // shared run at words [1, 7)
      3L -> "u1 u2 u3 u4 u5 u6 u7 u8" // nothing shared
    ), w = 3)
    // doc 1: windows at 2,3,4,5 merge -> [2, 8), 4 windows
    // doc 2: windows at 1,2,3,4 merge -> [1, 7), 4 windows
    assert(got === Seq((1L, 2L, 8L, 4L), (2L, 1L, 7L, 4L)))
  }

  test("two shared runs separated by > w unique words stay two spans") {
    val got = spans(Seq(
      1L -> "s1 s2 s3 u1 u2 u3 u4 u5 t1 t2 t3",
      2L -> "s1 s2 s3 q1 q2 q3 q4 q5 t1 t2 t3"
    ), w = 3)
    assert(got === Seq(
      (1L, 0L, 3L, 1L), (1L, 8L, 11L, 1L),
      (2L, 0L, 3L, 1L), (2L, 8L, 11L, 1L)))
  }

  test("touching duplicated windows (gap == w) merge into one span") {
    // doc 1 vs doc 2 share windows at positions 0 and 3 (gap exactly w=3):
    // [0,3) and [3,6) touch -> one span [0,6)
    val got = spans(Seq(
      1L -> "a1 a2 a3 b1 b2 b3",
      2L -> "a1 a2 a3 c9 c8 c7 b1 b2 b3"
    ), w = 3)
    assert(got.filter(_._1 == 1L) === Seq((1L, 0L, 6L, 2L)))
    // doc 2's two matching windows sit at 0 and 6 (gap 6 > 3): two spans
    assert(got.filter(_._1 == 2L) === Seq((2L, 0L, 3L, 1L), (2L, 6L, 9L, 1L)))
  }

  test("within-doc repetition alone is not flagged (cross-doc only)") {
    val got = spans(Seq(
      1L -> "r1 r2 r3 z1 r1 r2 r3", // repeats internally, unique corpus-wide
      2L -> "w1 w2 w3 w4 w5 w6 w7"
    ), w = 3)
    assert(got.isEmpty)
  }
}
