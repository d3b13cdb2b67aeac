package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._
import graft.plans.{AsOfJoinStrategy, PushFilterThroughAsOfJoin, RewriteCosineTopK}

/** Cluster-deploy registration point:
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * injects the custom as-of-join planner strategy, its filter-pushdown
  * optimizer rule, the CosineTopK exact-vs-LSH rewrite rule, and
  * graft's codegen SQL functions at session BUILD
  * time — the production form of what the library otherwise does
  * per-session at runtime (`AsOfJoin.register` /
  * `GraftFunctions.register`, both idempotent, kept for notebooks and
  * specs). With the config set, every session on the cluster — SQL
  * gateways and thrift servers included, where no Scala code runs to
  * call register() — can plan `asof` joins and call
  * `array_dot`/`p60`/`simhash64`/... from plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => PushFilterThroughAsOfJoin)
    ext.injectOptimizerRule(_ => RewriteCosineTopK)
    ext.injectFunction(fn("array_dot", es => ArrayDot(es(0), es(1))))
    ext.injectFunction(fn("p60", es => Portable60(es.head)))
    ext.injectFunction(fn("p60_rolling8_min", es => RollingMin60(es.head)))
    ext.injectFunction(fn("simhash32", es => SimHash32(es.head)))
    ext.injectFunction(fn("simhash64", es => SimHash64(es.head)))
    ext.injectFunction(fn("word_shingles", es => WordShingles(es(0),
      es(1).eval().asInstanceOf[Int])))
    ext.injectFunction(fn("zorder2", es => ZOrder2(es(0), es(1),
      es(2).eval().asInstanceOf[Int])))
    ext.injectFunction(fn("sign_lsh", es => SignLsh(es(0),
      es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int],
      if (es.length > 3) es(3).eval().asInstanceOf[Int] else 0)))
  }
}
