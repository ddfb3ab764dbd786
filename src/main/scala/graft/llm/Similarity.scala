package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Embedding similarity search over `embeddings(vec_id, embedding:
 * array<float>, label)`:
 *
 *  - [[cosine]]: codegen'd cosine via zip_with/aggregate higher-order
 *    functions (floats widened to double before accumulation);
 *  - [[knnBrute]]: exact top-k for a *small query set* against the full
 *    corpus — a broadcast of the queries + one linear scan; this is the
 *    correct plan even at 100 TB (no shuffle of the corpus, no cartesian
 *    blow-up: cost = |corpus| * |queries|, queries bounded);
 *  - [[cosinePairs]]: exact all-pairs >= threshold — the *oracle baseline*,
 *    quadratic by construction; kept for verification at small SF only;
 *  - [[annLsh]]: random-hyperplane LSH with L independent tables — the
 *    100 TB scale path: candidates come from equi-joins on (table, bucket),
 *    never from a cross product.
 */
object Similarity {

  /** Left-fold dot product with float->double widening; element order is
    * the array order, so the result is bit-stable across engines.
    * HOF (codegen-fallback) form — kept as the dependency-free Column API;
    * the hot paths below use the native codegen'd vec_dot/vec_norm
    * expressions ([[graft.functions.VectorExpressions]]) which compute the
    * identical sequential fold ~40x faster. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Ensure the native vector expressions are registered on the session the
    * given frame belongs to, then build with them. */
  private def withVectorFns(df: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    df
  }

  /** L2-normalize an embedding (double elements). */
  def normalize(a: Column): Column = {
    val n = norm(a)
    transform(a, x => x.cast("double") / n)
  }

  /**
   * Exact top-k neighbors for each query vector. `queries` must be small
   * (it is broadcast); the corpus side streams. Ranking uses the *rounded*
   * cosine with vec_id tie-break so results are reproducible across engines.
   */
  def knnBrute(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(withVectorFns(queries).select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"), expr("vec_norm(embedding)").as("nrm_q")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
      expr("vec_norm(embedding)").as("nrm_c"))
    // norms computed once per SIDE (N + Q loops), not once per pair (N * Q);
    // cos = dot / (norm_q * norm_c) in the same association as the oracle.
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(
        expr("vec_dot(q_emb, c_emb)") / (col("nrm_q") * col("nrm_c")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk").cast("long").as("rnk"), col("cos"))
  }

  /**
   * All pairs (a < b) with rounded cosine >= minCos. Quadratic — the
   * verification oracle for [[annLsh]]/ScalaTest at small scale factors; at
   * scale use [[annLsh]] or [[Dedup.minhashLshPairs]]-style bucketing.
   */
  def cosinePairs(emb: DataFrame, minCos: Double): DataFrame = {
    val n = withVectorFns(emb)
      .select(col("vec_id"), col("embedding"), expr("vec_norm(embedding)").as("nrm"))
    val a = n.select(col("vec_id").as("id_a"), col("embedding").as("e_a"), col("nrm").as("nrm_a"))
    val b = n.select(col("vec_id").as("id_b"), col("embedding").as("e_b"), col("nrm").as("nrm_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(expr("vec_dot(e_a, e_b)") / (col("nrm_a") * col("nrm_b")), 6))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1):
    * table t, plane p, dimension d -> double. Pure function of the seed, so
    * every executor (and every test) derives identical planes. */
  def planeComponent(seed: Long, table: Int, plane: Int, d: Int): Double = {
    val h = Dedup.splitmix64(seed ^ (table.toLong << 42) ^ (plane.toLong << 21) ^ d.toLong)
    // top 53 bits -> uniform [0,1) -> [-1,1)
    (h >>> 11) * (1.0 / (1L << 53)) * 2.0 - 1.0
  }

  /** Bucket kernel: sign bits of the vector against `planes` hyperplanes. */
  def lshBucket(vec: Seq[Float], seed: Long, table: Int, planes: Int): Int = {
    var bucket = 0
    var p = 0
    while (p < planes) {
      var s = 0.0
      var d = 0
      while (d < vec.length) { s += vec(d) * planeComponent(seed, table, p, d); d += 1 }
      if (s >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  private def bucketsUdf(seed: Long, tables: Int, planes: Int) = udf { (v: Seq[Float]) =>
    if (v == null) null else Array.tabulate(tables)(t => lshBucket(v, seed, t, planes))
  }

  /** vec_id -> one LSH bucket per table: rows (vec_id, table, bucket).
    * Defaults tuned for weakly-clustered corpora (top-neighbor cosine ~0.4):
    * recall ~ 1-(1-(1-acos(c)/pi)^planes)^tables — raise `planes` when the
    * corpus has tight clusters, raise `tables` to buy recall with compute. */
  def withLshBuckets(emb: DataFrame, seed: Long = 42L, tables: Int = 8,
                     planes: Int = 5): DataFrame =
    emb.select(col("vec_id"), col("embedding"),
      posexplode(bucketsUdf(seed, tables, planes)(col("embedding")))
        .as(Seq("table", "bucket")))

  // ---- IVF (inverted-file) ANN ---------------------------------------------

  /**
   * Deterministic k-means-lite coarse quantizer: centroids initialize from
   * every (n/c)-th vector in vec_id order, then `iters` Lloyd iterations.
   * Only the c x dim centroid means are ever collected to the driver — the
   * corpus itself stays distributed (posexplode + groupBy mean per
   * (cluster, dim), a standard two-shuffle aggregation).
   */
  def ivfCentroids(emb: DataFrame, c: Int, iters: Int = 3): Array[Array[Float]] = {
    val n = emb.count()
    val stride = math.max(1L, n / c)
    var centroids = emb.filter(col("vec_id") % stride === 0)
      .orderBy("vec_id").limit(c)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val dim = centroids.head.length
    var it = 0
    while (it < iters) {
      // per-dim sums as dim codegen'd aggregates (NOT posexplode: a UDF in
      // the same select as a generator lands in the projection above the
      // Generate and re-evaluates once per exploded element — 64x the work).
      val assign = assignUdf(centroids)
      val aggs = count(lit(1)).as("n") +:
        (0 until dim).map(d => sum(element_at(col("embedding"), d + 1)
          .cast("double")).as(s"s$d"))
      val means = emb.groupBy(assign(col("embedding")).as("cl"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
      val next = centroids.map(_.clone())
      means.foreach { r =>
        val cl = r.getInt(0)
        val n = r.getLong(1).toDouble
        var d = 0
        while (d < dim) { next(cl)(d) = (r.getDouble(d + 2) / n).toFloat; d += 1 }
      }
      centroids = next
      it += 1
    }
    centroids
  }

  /** argmax-dot cluster assignment (equivalent to argmin-L2 for normalized
    * centroids/queries up to centroid norm; deterministic lowest-index ties). */
  private def assignScores(v: Seq[Float], centroids: Array[Array[Float]]): Array[Double] =
    centroids.map { cen =>
      var s = 0.0
      var d = 0
      val m = math.min(cen.length, v.length)
      while (d < m) { s += v(d).toDouble * cen(d).toDouble; d += 1 }
      var ns = 0.0
      d = 0
      while (d < cen.length) { ns += cen(d).toDouble * cen(d).toDouble; d += 1 }
      if (ns == 0.0) Double.NegativeInfinity else s / math.sqrt(ns)
    }

  private def assignUdf(centroids: Array[Array[Float]]) = udf { (v: Seq[Float]) =>
    val scores = assignScores(v, centroids)
    var best = 0
    var i = 1
    while (i < scores.length) { if (scores(i) > scores(best)) best = i; i += 1 }
    best
  }

  private def probeUdf(centroids: Array[Array[Float]], nprobe: Int) = udf { (v: Seq[Float]) =>
    assignScores(v, centroids).zipWithIndex.sortBy { case (s, i) => (-s, i) }
      .take(nprobe).map(_._2)
  }

  /**
   * IVF ANN search — the second scale path next to [[annLsh]]: corpus is
   * partitioned into c inverted lists by nearest centroid; each query probes
   * its `nprobe` closest lists (equi-join on the cluster id) and reranks
   * exactly. Cost ~ |corpus| * nprobe / c per query instead of |corpus|.
   *
   * Standard IVF semantics: may return fewer than k neighbors when the
   * probed lists hold fewer candidates — size c ~ sqrt(|corpus|) and raise
   * nprobe to trade compute for recall; c close to |corpus| degenerates to
   * one-vector lists.
   */
  def annIvf(emb: DataFrame, queries: DataFrame, k: Int, c: Int = 32,
             nprobe: Int = 4): DataFrame = {
    graft.functions.VectorExpressions.register(emb.sparkSession)
    val centroids = ivfCentroids(emb, c)
    val corpus = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        expr("vec_norm(embedding)").as("nrm_c"))
      .withColumn("cl", assignUdf(centroids)(col("c_emb")))
    val qs = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        expr("vec_norm(embedding)").as("nrm_q"))
      .withColumn("cl", explode(probeUdf(centroids, nprobe)(col("q_emb"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    corpus.join(qs, Seq("cl"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", round(
        expr("vec_dot(q_emb, c_emb)") / (col("nrm_q") * col("nrm_c")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk").cast("long").as("rnk"), col("cos"))
  }

  /**
   * Approximate top-k: candidates = corpus vectors sharing an LSH bucket
   * with the query in >= 1 of the L tables (equi-join on (table, bucket)),
   * then exact cosine rank within candidates. Recall grows with L; cost is
   * the bucket-collision count, not |corpus| * |queries|.
   */
  def annLsh(emb: DataFrame, queries: DataFrame, k: Int, seed: Long = 42L,
             tables: Int = 8, planes: Int = 5): DataFrame = {
    graft.functions.VectorExpressions.register(emb.sparkSession)
    val cb = withLshBuckets(emb, seed, tables, planes)
      .select(col("table"), col("bucket"), col("vec_id").as("neighbor_id"),
        col("embedding").as("c_emb"), expr("vec_norm(embedding)").as("nrm_c"))
    val qb = withLshBuckets(queries, seed, tables, planes)
      .select(col("table"), col("bucket"), col("vec_id").as("query_id"),
        col("embedding").as("q_emb"), expr("vec_norm(embedding)").as("nrm_q"))
    val candidates = cb.join(qb, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "q_emb", "c_emb", "nrm_q", "nrm_c")
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    candidates
      .withColumn("cos", round(
        expr("vec_dot(q_emb, c_emb)") / (col("nrm_q") * col("nrm_c")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk").cast("long").as("rnk"), col("cos"))
  }
}
