package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for embedding math — the whole-stage-codegen
 * path for the similarity operators.
 *
 * Spark's higher-order functions (zip_with/aggregate) are CodegenFallback:
 * every element round-trips through boxed lambda evaluation, which made the
 * all-pairs cosine baseline ~75% of total bench time at sf0.1. These
 * expressions generate a tight primitive loop over the ArrayData instead
 * (no boxing, no per-element virtual calls) and participate fully in
 * WholeStageCodegen.
 *
 * Accumulation is sequential in element order with double precision — the
 * same fold the DuckDB oracle's list_aggregate performs, so results stay
 * bit-identical across engines.
 */
object VectorExpressions {

  /** Register vec_dot / vec_norm as temp functions on a session (idempotent).
    * For spark.sql.extensions users, [[GraftExtensions]] injects the same. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => FloatVecDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_norm",
      exprs => FloatVecNorm(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("hamming_dist",
      exprs => PackedHamming(exprs(0), exprs(1)), "built-in")
  }
}

/** dot(a, b) over array<float> with double accumulation. */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** L2 norm over array<float> with double accumulation. */
case class FloatVecNorm(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_norm expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |int $n = $x.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $x.getFloat($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatVecNorm =
    copy(child = newChild)
}

/**
 * hamming_dist(a, b) over two sign-bit-packed array<bigint> (see
 * [[graft.llm.Similarity.signBits]]): sum of Long.bitCount(x ^ y) per
 * word. The binary-ANN hot loop — one popcount instruction per 32 packed
 * dims where the HOF form (zip_with + aggregate) boxes every word through
 * lambda eval. Integer-exact by construction.
 *
 * Mismatched word counts ERROR (a truncated signature would silently
 * rank as artificially close; the HOF form yields NULL there — neither
 * is a distance, and the kernel fails loudly rather than guess). NULL
 * *elements* inside a packed array error for the same reason: getLong on
 * a null slot would contribute garbage to the distance. (The HOF form
 * null-propagates there — documented divergence, same policy as length:
 * a non-distance is never returned by either form; [[graft.llm
 * .Similarity.signBits]] never emits null elements, so internal paths
 * are unaffected.)
 */
case class PackedHamming(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming_dist expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"hamming_dist: packed signatures differ in length ($n vs ${y.numElements()})")
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i))
        throw new IllegalArgumentException(
          s"hamming_dist: null element at word $i in packed signature")
      s += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "hamming_dist: packed signatures differ in length (" + $n +
         |    " vs " + $y.numElements() + ")");
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "hamming_dist: null element at word " + $i + " in packed signature");
         |  }
         |  $s += java.lang.Long.bitCount($x.getLong($i) ^ $y.getLong($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackedHamming =
    copy(left = newLeft, right = newRight)
}

/**
 * SparkSessionExtensions entry point:
 * `--conf spark.sql.extensions=graft.functions.GraftExtensions` registers
 * the library's full native-function surface in every session of the
 * cluster, so plain `spark.sql` users (notebooks, JDBC, SQL pipelines) get
 * the codegen'd kernels and bounded-state aggregates without touching the
 * Scala API. Scalar args that parameterize codegen (shingle width, top-k
 * size, stopword lists) must be literals — evaluated once at resolution.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def litInt(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()
  private def litStrings(e: Expression): Seq[String] = e.eval() match {
    case a: ArrayData =>
      a.toObjectArray(StringType).map(_.toString).toSeq
    case other => throw new IllegalArgumentException(
      s"expected a string-array literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rules: rewrite unbounded levenshtein comparisons into the
    // banded thresholded form (see graft.plans.BoundedLevenshtein)
    ext.injectOptimizerRule(_ => graft.plans.BoundedLevenshtein)
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[FloatVecNorm].getName, "vec_norm"),
      (exprs: Seq[Expression]) => FloatVecNorm(exprs(0))))
    ext.injectFunction((FunctionIdentifier("hamming_dist"),
      new ExpressionInfo(classOf[PackedHamming].getName, "hamming_dist"),
      (exprs: Seq[Expression]) => PackedHamming(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs(0), litInt(exprs(1)))))
    ext.injectFunction((FunctionIdentifier("word_count"),
      new ExpressionInfo(classOf[WordCount].getName, "word_count"),
      (exprs: Seq[Expression]) => WordCount(exprs(0))))
    ext.injectFunction((FunctionIdentifier("regex_token_count"),
      new ExpressionInfo(classOf[RegexTokenCount].getName, "regex_token_count"),
      (exprs: Seq[Expression]) => RegexTokenCount(exprs(0))))
    ext.injectFunction((FunctionIdentifier("stopword_count"),
      new ExpressionInfo(classOf[StopwordCount].getName, "stopword_count"),
      (exprs: Seq[Expression]) => StopwordCount(exprs(0), litStrings(exprs(1)))))
    ext.injectFunction((FunctionIdentifier("bpe_token_count"),
      new ExpressionInfo(classOf[BpeTokenCount].getName, "bpe_token_count"),
      (exprs: Seq[Expression]) => BpeTokenCount(exprs(0), litStrings(exprs(1)))))
    ext.injectFunction((FunctionIdentifier("normalize_spaces"),
      new ExpressionInfo(classOf[NormalizeSpaces].getName, "normalize_spaces"),
      (exprs: Seq[Expression]) => NormalizeSpaces(exprs(0))))
    ext.injectFunction((FunctionIdentifier("rd_lat"),
      new ExpressionInfo(classOf[RdToLat].getName, "rd_lat"),
      (exprs: Seq[Expression]) => RdToLat(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("rd_lon"),
      new ExpressionInfo(classOf[RdToLon].getName, "rd_lon"),
      (exprs: Seq[Expression]) => RdToLon(exprs(0), exprs(1))))
    // aggregates: the analyzer wraps a bare AggregateFunction from a
    // registry builder into an AggregateExpression
    ext.injectFunction((FunctionIdentifier("vec_sum"),
      new ExpressionInfo(classOf[VecSum].getName, "vec_sum"),
      (exprs: Seq[Expression]) => VecSum(exprs(0))))
    ext.injectFunction((FunctionIdentifier("top_k"),
      new ExpressionInfo(classOf[TopK].getName, "top_k"),
      (exprs: Seq[Expression]) => TopK(exprs(0), exprs(1), litInt(exprs(2)))))
    ext.injectFunction((FunctionIdentifier("top_k_str"),
      new ExpressionInfo(classOf[TopKStr].getName, "top_k_str"),
      (exprs: Seq[Expression]) => TopKStr(exprs(0), exprs(1), litInt(exprs(2)))))
    ext.injectFunction((FunctionIdentifier("arg_max"),
      new ExpressionInfo(classOf[ArgMax].getName, "arg_max"),
      (exprs: Seq[Expression]) => ArgMax(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("perceptual_hash"),
      new ExpressionInfo(classOf[PerceptualHash].getName, "perceptual_hash"),
      (exprs: Seq[Expression]) => PerceptualHash(exprs(0))))
    ext.injectFunction((FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (exprs: Seq[Expression]) => CmsEstimate(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("bitmap_distinct"),
      new ExpressionInfo(classOf[BitmapDistinct].getName, "bitmap_distinct"),
      (exprs: Seq[Expression]) => BitmapDistinct(exprs(0))))
    ext.injectFunction((FunctionIdentifier("bitmap_agg"),
      new ExpressionInfo(classOf[BitmapAgg].getName, "bitmap_agg"),
      (exprs: Seq[Expression]) => BitmapAgg(exprs(0))))
    ext.injectFunction((FunctionIdentifier("bitmap_or_count"),
      new ExpressionInfo(classOf[BitmapOrCount].getName, "bitmap_or_count"),
      (exprs: Seq[Expression]) => BitmapOrCount(exprs(0))))
  }
}
