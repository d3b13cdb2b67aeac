package graft.plans

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Declarative cosine top-k as a Catalyst node (SURVEY §7.5(c), the
  * last planned extension item): the CALLER states "top-k cosine
  * neighbors of the rows matching this predicate" and the OPTIMIZER
  * picks the physical family — the exact |Q|×N face
  * ([[graft.ops.Similarity.cosineTopK]], a broadcast-NLJ shape) when
  * the corpus statistics say the pair volume is affordable, the
  * sign-LSH bucketed face ([[graft.ops.Similarity.annTopK]], per-bucket
  * blocks) when they don't. That decision belongs in the optimizer
  * because only the optimizer sees the corpus' size estimate at plan
  * time: the same notebook line is exact against a dev sample and
  * sublinear against the production corpus, with no code change — the
  * auto version of the exact-vs-LSH choice every registered query
  * today makes by hand.
  *
  * Output: (qid, nid, cos_sim, rn) — identical schema, rounding (6dp)
  * and tie order (cos DESC, nid ASC) for both faces, so flipping faces
  * changes RECALL (the documented LSH trade), never the contract.
  *
  * The node is injected post-analysis ([[AsOfJoinPlan]] convention), so
  * output attributes are carried as a constructor field — they must
  * survive `withNewChildInternal` copies unchanged or references above
  * the node dangle.
  */
case class CosineTopKPlan(
    corpus: LogicalPlan,
    queryPredicate: Expression,
    k: Int,
    planes: Int,
    dim: Int,
    exactMaxBytes: Long,
    outputAttrs: Seq[Attribute]) extends UnaryNode {

  override def child: LogicalPlan = corpus
  override def output: Seq[Attribute] = outputAttrs

  // the node GENERATES its output attributes (they are not functions of
  // the child's attribute set the way a Project's are) — declaring them
  // produced is what exempts them from CheckAnalysis' missing-input
  // check, the same contract Generate uses for its generator output
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outputAttrs)

  // the operator consumes EVERY corpus column (id for identity, v/nrm
  // for the cosine), not just the predicate's references — without
  // this, ColumnPruning sees references={id} and prunes v/nrm out from
  // under the node before the rewrite rule ever runs
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(corpus.output) ++
      queryPredicate.references

  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(corpus = newChild)
}

/** Rewrites [[CosineTopKPlan]] to one of its two DataFrame-composed
  * faces by corpus size estimate (`corpus.stats.sizeInBytes` vs the
  * node's threshold). The replacement subtree is re-aliased onto the
  * node's original output attribute ids so references above the node
  * stay valid.
  *
  * Registered two ways (the [[AsOfJoinStrategy]] convention):
  * `GraftExtensions` injects it into the operator-optimization batch
  * (cluster deploys — the rewritten subtree then gets the full rule
  * fixed-point); the runtime API registers it in
  * `spark.experimental.extraOptimizations` (notebooks/specs — the
  * late batch; the faces' hand-tight projections don't depend on the
  * missed logical passes, and FileSourceStrategy's PhysicalOperation
  * still collapses the project/filter chain onto the scan at planning
  * time).
  */
object RewriteCosineTopK extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case n: CosineTopKPlan =>
      val spark = SparkSession.active
      val corpusDf = GraftSqlBridge.ofRows(spark, n.corpus)
      val pred = GraftSqlBridge.column(n.queryPredicate)
      // deliberately NOT an IVF rewrite target: ivfTopK FITS a k-means
      // quantizer at call time — an estimator fit (real Spark jobs,
      // possibly re-entering this optimizer) has no business running
      // inside a plan rewrite. IVF's home is the stateful path:
      // IvfState's persisted centroids + assign-only incremental face,
      // where the fit is an explicit, owned artifact. The stateless
      // rewrite chooses between the two stateless faces only.
      val face =
        if (n.corpus.stats.sizeInBytes <= BigInt(n.exactMaxBytes))
          graft.ops.Similarity.cosineTopK(corpusDf, pred, n.k)
        else
          graft.ops.Similarity.annTopK(corpusDf, pred, n.k, n.planes, n.dim)
      val rewritten = face.queryExecution.analyzed
      Project(n.output.zip(rewritten.output).map { case (o, a) =>
        Alias(a, o.name)(exprId = o.exprId)
      }, rewritten)
  }
}

object CosineTopK {

  /** Build the declarative node over a [[graft.ops.Similarity.prepare]]-
    * shaped frame (id, v, nrm). `queryFilter` selects the query rows
    * (resolved against `prepared` exactly as `.filter` would);
    * `exactMaxBytes` is the optimizer threshold: corpus size estimates
    * at or below it plan the exact face, above it the sign-LSH face
    * with `planes`/`dim`. The default threshold keeps dev-scale corpora
    * exact; production registrations pin it deliberately (0 forces the
    * sublinear face, a large value pins exactness for an oracle). */
  def auto(prepared: DataFrame, queryFilter: Column, k: Int,
      planes: Int = 6, dim: Int = 64,
      exactMaxBytes: Long = 256L << 20): DataFrame = {
    require(k >= 1, s"cosine top-k needs k >= 1, got $k")
    val spark = prepared.sparkSession
    graft.functions.GraftFunctions.register(spark)
    if (!spark.experimental.extraOptimizations.contains(RewriteCosineTopK)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteCosineTopK
    }
    // resolve the filter the same way .filter() does, then peel the
    // resolved predicate off — the node carries (corpus, predicate)
    // rather than two children so the query side can't duplicate the
    // corpus subtree's attribute ids
    val (cond, corpusPlan) =
      prepared.filter(queryFilter).queryExecution.analyzed match {
        case Filter(c, ch) => (c, ch)
        case other => throw new IllegalStateException(
          s"cosineTopKAuto: expected Filter on top of the analyzed plan, got ${other.nodeName}")
      }
    val required = Seq("id", "v", "nrm")
    val missing = required.filterNot(r => corpusPlan.output.exists(_.name == r))
    require(missing.isEmpty,
      s"cosineTopKAuto: corpus must be Similarity.prepare-shaped; missing ${missing.mkString(", ")}")
    val idType = corpusPlan.output.find(_.name == "id").get.dataType
    val out = Seq(
      AttributeReference("qid", idType)(),
      AttributeReference("nid", idType)(),
      AttributeReference("cos_sim", DoubleType)(),
      AttributeReference("rn", IntegerType)())
    GraftSqlBridge.ofRows(spark,
      CosineTopKPlan(corpusPlan, cond, k, planes, dim, exactMaxBytes, out))
  }
}
