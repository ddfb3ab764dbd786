package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * arg_max(ord, payload): the K2-family last-wins primitive. The contract
 * under test: (1) exactly the window row_number()=1 result for a total
 * (unique-within-group) descending order, including null ord fields losing
 * (DESC NULLS LAST); (2) the plan is ObjectHashAggregate with a map-side
 * partial_arg_max and NO Window/Sort-of-input anywhere; (3) heavy payloads
 * (arrays) and composite struct ords travel intact through
 * serialize/merge (the partial -> exchange -> final path).
 */
class ArgMaxSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("argmax-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("arg_max equals the row_number window winner on a synthetic key space") {
    // 10k rows, 700 keys, composite (ts, id) order with duplicate ts per
    // key so the unique-id tie-break is exercised; repartition(7) makes
    // the map-side partial/merge path real.
    val df = spark.range(10000).select(
      (col("id") % 700).as("k"),
      (col("id") % 13).as("ts"), // many exact ts ties per key
      col("id"),
      concat(lit("p"), col("id")).as("name"),
      array(col("id"), col("id") * 2).as("payload_arr"))
      .repartition(7)
    val viaAgg = df.groupBy("k")
      .agg(VectorAggregates.argMax(struct(col("ts"), col("id")),
        struct(col("id"), col("name"), col("payload_arr"))).as("w"))
      .select(col("k"), col("w.id"), col("w.name"), col("w.payload_arr"))
    val viaWindow = df.withColumn("__rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("ts").desc, col("id").desc)))
      .filter(col("__rn") === 1)
      .select(col("k"), col("id"), col("name"), col("payload_arr"))
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty,
      "arg_max diverged from the window winner")
    assert(viaAgg.count() === 700)
  }

  test("null ord fields lose (DESC NULLS LAST semantics); all-null group yields null") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some(5L), "lo"), (1L, None, "null-ts"), (1L, Some(9L), "hi"),
      (2L, Option.empty[Long], "only-null")).toDF("k", "ts", "name")
    val r = df.groupBy("k")
      .agg(VectorAggregates.argMax(struct(col("ts"), col("name")), col("name")).as("w"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    // k=1: ts=9 wins, the null-ts row never beats a non-null ts
    assert(r(1L) === "hi")
    // k=2: struct(null, "only-null") is still a non-null ord -> the row
    // wins its singleton group (struct() never nulls out whole rows)
    assert(r(2L) === "only-null")
  }

  test("a BARE null ord column is ignored; an all-null group evals to null") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Option.empty[Long], "a"), (1L, Option.empty[Long], "b"))
      .toDF("k", "ts", "name")
    val r = df.groupBy("k")
      .agg(VectorAggregates.argMax(col("ts"), col("name")).as("w"))
      .collect()
    assert(r.length === 1 && r(0).isNullAt(1))
  }

  test("plan: ObjectHashAggregate with map-side partial_arg_max, no Window, no SortAggregate") {
    val df = spark.range(1000).select((col("id") % 50).as("k"), col("id"),
      concat(lit("x"), col("id")).as("v"))
    val q = df.groupBy("k")
      .agg(VectorAggregates.argMax(struct(col("id")), col("v")).as("w"))
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"not object-hash-aggregated:\n$p")
    assert(p.contains("partial_arg_max"), s"no map-side partial:\n$p")
    assert(!p.contains("Window"), s"window crept in:\n$p")
    assert(!p.contains("SortAggregate"), s"fell back to sort aggregate:\n$p")
  }

  test("determinism across reruns and partitionings") {
    val df = spark.range(5000).select((col("id") % 97).as("k"),
      (col("id") * 7919 % 1000).as("ord"), col("id"))
    def run(parts: Int) = df.repartition(parts).groupBy("k")
      .agg(VectorAggregates.argMax(struct(col("ord"), col("id")), col("id")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(3) === run(11))
  }
}
