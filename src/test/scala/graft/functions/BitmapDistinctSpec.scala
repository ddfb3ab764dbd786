package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * bitmap_distinct == count(distinct) on inputs chosen to cross every
 * container-lifecycle edge: the 512-entry array->bitmap upgrade, multi
 * container ids, negative ids, serialization between partial and final
 * aggregation (forced by a real shuffle), and merges of mixed-mode
 * containers.
 */
class BitmapDistinctSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("bitmap-distinct-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def check(ids: Seq[Long], groups: Seq[String] = Seq("g")): Unit = {
    val s = spark
    import s.implicits._
    val rows = for (g <- groups; id <- ids) yield (g, id)
    // repartition(7) forces partial buffers on several tasks -> serialize
    // -> shuffle -> merge, the full TypedImperativeAggregate lifecycle
    val df = rows.toDF("g", "id").repartition(7)
    val got = df.groupBy("g")
      .agg(VectorAggregates.bitmapDistinct(col("id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.groupBy("g").agg(countDistinct(col("id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"bitmap=$got exact=$want")
  }

  test("array container stays exact across duplicates and ordering") {
    check(Seq(5L, 1L, 3L, 5L, 1L, 65535L, 0L))
  }

  test("array -> bitmap upgrade at 512 entries keeps every id") {
    // 700 distinct lows in ONE container (high bits identical): crosses
    // the upgrade threshold mid-aggregation
    check((0L until 700L).flatMap(i => Seq(i, i))) // with dups
  }

  test("ids spanning many containers, including negatives") {
    val ids = (0 until 2000).map(i => i.toLong * 70001L) ++
      Seq(-1L, -65536L, -70000L, Long.MaxValue, Long.MinValue, 0L)
    check(ids)
  }

  test("dense range: one full container plus spill into the next") {
    check((0L until 70000L).toSeq) // container 0 fully dense + part of 1
  }

  test("multiple groups aggregate independently") {
    val s = spark
    import s.implicits._
    // 601 is coprime to 3, so every group sees all 601 distinct ids
    val df = (0 until 5000).map(i => (s"g${i % 3}", (i % 601).toLong))
      .toDF("g", "id").repartition(7)
    val got = df.groupBy("g")
      .agg(VectorAggregates.bitmapDistinct(col("id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("g0" -> 601L, "g1" -> 601L, "g2" -> 601L))
  }

  test("sort-based fallback path (many groups per partition) stays exact") {
    // ObjectHashAggregate abandons its hash map past
    // spark.sql.objectHashAggregate.sortBased.fallbackThreshold distinct
    // groups per partition and switches to sort-based aggregation — a
    // DIFFERENT buffer serialize/merge path. At 100 TB group counts the
    // fallback is the normal path, so it must be bit-exact too.
    val s = spark
    import s.implicits._
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4")
    try {
      val df = (0 until 20000).map(i => (s"g${i % 97}", (i % 701).toLong))
        .toDF("g", "id").repartition(5)
      val got = df.groupBy("g")
        .agg(VectorAggregates.bitmapDistinct(col("id")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = df.groupBy("g").agg(countDistinct(col("id")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"fallback path diverged: got=$got")
      assert(got.size == 97 && got.values.forall(_ > 0))
    } finally
      spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
  }

  test("bitmap_agg -> bitmap_or_count: stored-bitmap rollup == distinct of the union") {
    val s = spark
    import s.implicits._
    // users overlap across days (u % 400): the OR must count each once.
    // 700 distinct ids also crosses the array->bitmap upgrade inside the
    // stored bytes, so fromBytes sees both container modes.
    val rows = (0 until 3000).map(i => (s"d${i % 5}", (i % 700).toLong))
    val df = rows.toDF("day", "user").repartition(7)
    val daily = df.groupBy("day")
      .agg(VectorAggregates.bitmapAgg(col("user")).as("bm"),
        VectorAggregates.bitmapDistinct(col("user")).as("dau"))
    // per-day bytes reproduce per-day cardinality through a round-trip
    val viaBytes = daily.groupBy("day")
      .agg(VectorAggregates.bitmapOrCount(col("bm")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = daily.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(viaBytes === direct, s"bytes=$viaBytes direct=$direct")
    // the rollup: OR of all five day-bitmaps == distinct over all days
    val rolled = daily.agg(VectorAggregates.bitmapOrCount(col("bm")).as("n"))
      .head().getLong(0)
    val exact = df.agg(countDistinct(col("user"))).head().getLong(0)
    assert(rolled === exact, s"rolled=$rolled exact=$exact")
  }

  test("nulls ignored; empty group is 0") {
    val s = spark
    import s.implicits._
    val df = Seq[(String, Option[Long])]("a" -> Some(1L), "a" -> None,
      "b" -> None).toDF("g", "id")
    val got = df.groupBy("g")
      .agg(VectorAggregates.bitmapDistinct(col("id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 0L))
  }
}
