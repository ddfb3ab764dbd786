package graft.relational

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew-salting and bucketing: correctness vs the plain equivalents, and
  * the plan-level guarantees (bucketed join shuffle-free; salted join
  * scatters the hot key). */
class ScaleOpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("scale-ops-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      Files.createTempDirectory("graft_wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("saltedJoin returns exactly the plain join result on a skewed key") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_returnflag", "l_quantity") // l_returnflag: 3 hot keys
    val dim = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag")).distinct()
      .withColumn("flag_name", concat(lit("flag_"), col("l_returnflag")))
    val plain = li.join(dim, Seq("l_returnflag"), "left")
      .select("l_orderkey", "l_quantity", "flag_name")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(li, dim, "l_returnflag", salt = 7)
      .select("l_orderkey", "l_quantity", "flag_name")
      .collect().map(_.toString).sorted
    assert(salted === plain)
    // the salted exchange hashes on (salt, key), so one hot key spreads
    // over up to 7 partitions — visible as __salt in the join condition
    val p = Skew.saltedJoin(li, dim, "l_returnflag", salt = 7)
      .queryExecution.executedPlan.toString
    assert(p.contains("__salt"), p)
  }

  test("saltedAgg equals plain aggregation on a hot key") {
    val ev = spark.read.parquet(s"$sf/lineitem.parquet")
    val plain = ev.groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("qty"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.saltedAgg(ev, "l_returnflag", salt = 8,
      partials = Map("pc" -> count(lit(1)), "ps" -> sum(col("l_quantity"))),
      finals = Map("cnt" -> sum(col("pc")), "qty" -> round(sum(col("ps")), 2)))
      .collect().map(r => (r.getString(0), r.getAs[Long]("cnt"))).toMap
    assert(salted === plain)
  }

  test("join of two tables bucketed on the key needs no shuffle exchange") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", buckets = 4)
    Bucketing.writeBucketed(
      li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b",
      "o_orderkey", buckets = 4)

    // at fixture scale the planner prefers a broadcast join (which ignores
    // bucketing); disable it so the plan is the SortMergeJoin a real fact-
    // fact join would use - bucketed scans must then need no shuffle.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.read(spark, "lineitem_b")
        .join(Bucketing.read(spark, "orders_b"), "o_orderkey")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("Bucketed: true"), s"bucketed scan not used:\n$p")
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
      assert(joined.count() === li.count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
