package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions registering graft's native Catalyst expressions.
  *
  * Wire up with `.config("spark.sql.extensions", "graft.sql.GraftExtensions")`
  * (works under spark-submit too) — then `cosine_sim(a, b)` resolves in
  * SQL and via `functions.call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // composable HOF cosine -> native codegen'd expression (bit-exact)
    ext.injectOptimizerRule(_ => RewriteHofCosine)
    // aggregate-over-base -> aggregate-over-summary MV matching (no-op
    // until an MvDef is registered in graft.plans.MvRegistry)
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
    // plans graft.plans.AsOfJoinPlan as the native sort-merge as-of exec
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("l2_norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "l2_norm"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "l2_norm expects 1 argument")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{ArrayType, DoubleType}
        val c = children.head
        L2Norm(c.dataType match {
          case ArrayType(DoubleType, _) => c
          case _ => Cast(c, ArrayType(DoubleType))
        })
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "dot_product expects 2 arguments")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{ArrayType, DoubleType}
        val target = ArrayType(DoubleType)
        def coerce(e: org.apache.spark.sql.catalyst.expressions.Expression) =
          e.dataType match {
            case ArrayType(DoubleType, _) => e
            case _ => Cast(e, target)
          }
        DotProduct(coerce(children.head), coerce(children(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("kgram_md5_hashes"),
      new ExpressionInfo(classOf[KgramMd5Hashes].getName, "kgram_md5_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "kgram_md5_hashes expects 2 arguments")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{IntegerType, StringType}
        def coerce(e: org.apache.spark.sql.catalyst.expressions.Expression, t: org.apache.spark.sql.types.DataType) =
          if (e.dataType == t) e else Cast(e, t)
        KgramMd5Hashes(coerce(children.head, StringType), coerce(children(1), IntegerType))
      }))
    ext.injectFunction((
      FunctionIdentifier("kgram_poly_hashes"),
      new ExpressionInfo(classOf[KgramPolyHashes].getName, "kgram_poly_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "kgram_poly_hashes expects 2 arguments")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{IntegerType, StringType}
        def coerce(e: org.apache.spark.sql.catalyst.expressions.Expression, t: org.apache.spark.sql.types.DataType) =
          if (e.dataType == t) e else Cast(e, t)
        KgramPolyHashes(coerce(children.head, StringType), coerce(children(1), IntegerType))
      }))
    ext.injectFunction((
      FunctionIdentifier("sliding_min"),
      new ExpressionInfo(classOf[SlidingMin].getName, "sliding_min"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "sliding_min expects 2 arguments")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}
        val arr = children.head.dataType match {
          case ArrayType(LongType, _) => children.head // nullability-agnostic
          case _ => Cast(children.head, ArrayType(LongType))
        }
        val w = if (children(1).dataType == IntegerType) children(1)
          else Cast(children(1), IntegerType)
        SlidingMin(arr, w)
      }))
    ext.injectFunction((
      FunctionIdentifier("image_meta"),
      new ExpressionInfo(classOf[ImageMeta].getName, "image_meta"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "image_meta expects 1 argument")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.BinaryType
        val c = children.head
        ImageMeta(if (c.dataType == BinaryType) c else Cast(c, BinaryType))
      }))
    ext.injectFunction((
      FunctionIdentifier("audio_meta"),
      new ExpressionInfo(classOf[AudioMeta].getName, "audio_meta"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "audio_meta expects 1 argument")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.BinaryType
        val c = children.head
        AudioMeta(if (c.dataType == BinaryType) c else Cast(c, BinaryType))
      }))
    ext.injectFunction((
      FunctionIdentifier("video_meta"),
      new ExpressionInfo(classOf[VideoMeta].getName, "video_meta"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "video_meta expects 1 argument")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.BinaryType
        val c = children.head
        VideoMeta(if (c.dataType == BinaryType) c else Cast(c, BinaryType))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3, "minhash_sig expects 3 arguments")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{IntegerType, StringType}
        def coerce(e: org.apache.spark.sql.catalyst.expressions.Expression,
            t: org.apache.spark.sql.types.DataType) =
          if (e.dataType == t) e else Cast(e, t)
        MinHashSig(coerce(children.head, StringType),
          coerce(children(1), IntegerType), coerce(children(2), IntegerType))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "simhash_sig expects 2 arguments")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{IntegerType, StringType}
        def coerce(e: org.apache.spark.sql.catalyst.expressions.Expression,
            t: org.apache.spark.sql.types.DataType) =
          if (e.dataType == t) e else Cast(e, t)
        SimHashSig(coerce(children.head, StringType), coerce(children(1), IntegerType))
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_explode"),
      new ExpressionInfo(classOf[ShingleExplode].getName, "shingle_explode"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "shingle_explode expects 2 arguments")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{IntegerType, StringType}
        def coerce(e: org.apache.spark.sql.catalyst.expressions.Expression,
            t: org.apache.spark.sql.types.DataType) =
          if (e.dataType == t) e else Cast(e, t)
        ShingleExplode(coerce(children.head, StringType),
          coerce(children(1), IntegerType))
      }))
    ext.injectFunction((
      // Spark's native bloom-membership predicate is optimizer-internal
      // (not in the public registry); expose it so Joins.bloomSemiJoin can
      // stay whole-stage-codegen instead of a per-row Scala UDF. The bloom
      // binary must be foldable (a literal) — the build side serializes the
      // distributed-aggregate filter into one.
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "bloom_might_contain expects 2 arguments")
        import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Cast}
        import org.apache.spark.sql.types.LongType
        val v = if (children(1).dataType == LongType) children(1)
          else Cast(children(1), LongType)
        BloomFilterMightContain(children.head, v)
      }))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "cosine_sim expects 2 arguments")
        // cast here (array<float> inputs etc.) — the expression itself
        // demands array<double>
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{ArrayType, DoubleType}
        val target = ArrayType(DoubleType)
        def coerce(e: org.apache.spark.sql.catalyst.expressions.Expression) =
          e.dataType match {
            case ArrayType(DoubleType, _) => e
            case _ => Cast(e, target)
          }
        CosineSimilarity(coerce(children.head), coerce(children(1)))
      }))
  }
}
