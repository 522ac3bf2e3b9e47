package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point: inject graft's native functions at
  * session build time —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (equivalently `.withExtensions(new GraftExtensions)`), making `vec_dot`
  * available to pure-SQL users on every session without the runtime
  * registration the ops perform for themselves.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[functions.VectorDot].getName, "vec_dot"),
      functions.VectorDot.builder))
    ext.injectFunction((
      FunctionIdentifier("token_ngrams"),
      new ExpressionInfo(classOf[functions.TokenNGrams].getName, "token_ngrams"),
      functions.NGrams.tokenBuilder))
    ext.injectFunction((
      FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[functions.CharNGrams].getName, "char_ngrams"),
      functions.NGrams.charBuilder))
    ext.injectFunction((
      FunctionIdentifier("unicode_norm"),
      new ExpressionInfo(classOf[functions.UnicodeNormalize].getName, "unicode_norm"),
      functions.UnicodeNorm.builder))
    ext.injectFunction((
      FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[functions.Simhash60].getName, "simhash60"),
      functions.Sketch60.simhashBuilder))
    ext.injectFunction((
      FunctionIdentifier("srp_sketch60"),
      new ExpressionInfo(classOf[functions.SrpSketch60].getName, "srp_sketch60"),
      functions.Sketch60.srpBuilder))
    ext.injectFunction((
      FunctionIdentifier("md5fold48"),
      new ExpressionInfo(classOf[functions.Md5Fold48].getName, "md5fold48"),
      functions.HashFold.builder))
    // declarative aggregate(zip_with(...)) dot products fuse into the
    // codegen'd VectorDot automatically (exact-semantics rewrite)
    ext.injectOptimizerRule(_ => functions.DotProductFusion)
    // the TopKPerKey whole-operator extension (bounded-heap per-key top-k)
    // plus its key-predicate pushdown rule (whole-group filters sink below
    // the operator, shrinking the shuffle map-side)
    ext.injectPlannerStrategy(_ => plans.TopKStrategy)
    ext.injectOptimizerRule(_ => plans.PushFilterThroughTopKPerKey)
  }
}
