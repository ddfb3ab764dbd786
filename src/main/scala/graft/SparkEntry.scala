package graft

import graft.queries.{Oracle, Queries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * One named query per implemented operator family (SURVEY.md §2 +
  * the LLM-data-pipeline families) over /root/testdata parquet, with
  * DuckDB-equivalent SQL in [[Oracle.sql]] where SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the five-way star join + aggregation (J1/J8 shape). */
  def entry(spark: SparkSession): DataFrame =
    Queries.j01Join5way(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (v03_ann_lsh, v05_ann_ivf, v12_indexed_ivf, v13_pq_ann,
    * v14_indexed_pq, v15_ivfpq, v16_indexed_ivfpq, d16_semantic_dedup,
    * a08_approx_distinct, a16_approx_percentiles)
    * -> rows-only check,
    * each backed by a [[VerifyExtras]] bound in verify_extras.json.
    * r11 flipped x25_kcore/x30_ktruss (fixpoint unrolled as chained
    * MATERIALIZED CTEs) and d05_simhash/t04_fingerprint (FNV-1a/
    * splitmix64/XXH64 reproduced bit-exactly in HUGEINT mod-2^64 SQL)
    * from rows-only to hash-exact; their VerifyExtras recomputes remain
    * as independent second evidence. */
  def oracleSql: Map[String, String] = Oracle.sql
}
