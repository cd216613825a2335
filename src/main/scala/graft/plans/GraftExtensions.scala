package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ContainsHan, ZhToSimplified, ZhToTraditional}

/** Engine installer (`spark.sql.extensions=graft.plans.GraftExtensions`):
  * registers the native zh expressions as SQL functions and injects the
  * merge-then-extract optimizer rule. The reference exposes these only as
  * private Java methods fused into its loop (`OMTZHModifier.java:196-250`);
  * here they are first-class, SQL-addressable, codegen'd functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def fn(name: String, clazz: Class[_], usage: String,
           builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getCanonicalName, null, name, usage, ""),
        builder))

    fn("contains_han", classOf[ContainsHan],
      "contains_han(str) - true iff any codepoint has Unicode script Han",
      args => ContainsHan(args.head))
    fn("zh_to_simplified", classOf[ZhToSimplified],
      "zh_to_simplified(str) - ICU Traditional->Simplified conversion",
      args => ZhToSimplified(args.head))
    fn("zh_to_traditional", classOf[ZhToTraditional],
      "zh_to_traditional(str) - ICU Simplified->Traditional conversion",
      args => ZhToTraditional(args.head))

    ext.injectOptimizerRule(_ => SimplifyMergeThenExtract)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
