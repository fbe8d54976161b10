package graft.plans

import graft.functions.CosineSimilarity
import graft.operators.Ivf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule turning a brute-force cosine top-k over an IVF store into
  * a partition-pruned probe — the (c)-level Catalyst path of SURVEY §2.5:
  * the user writes the DECLARATIVE query
  *
  * {{{ store.orderBy(cosineFast(col("vec"), lit(q)).desc).limit(k) }}}
  *
  * (or the same through `Search.topK`), and when the scan's root path
  * carries the `_graft_centroids.txt` sidecar written by
  * [[Ivf.writeIndexed]], the rule ranks the centroids against the query
  * vector ON THE DRIVER (nList doubles — no job) and injects
  * `list_id IN (nProbe nearest lists)` directly above the relation, where
  * it lands in the scan's `PartitionFilters`: only nProbe/nList of a
  * 100 TB store's files are listed and read.
  *
  * The rewrite trades exactness for recall exactly like [[Ivf.search]], so
  * it is OPT-IN: `spark.graft.ivf.autoProbe=true` (probe width
  * `spark.graft.ivf.nProbe`, default 4). Registered via
  * [[graft.GraftExtensions]] (spark-submit) or
  * `spark.experimental.extraOptimizations` (live session).
  *
  * Matching is conservative: a global Sort+Limit whose PRIMARY key is
  * descending cosine similarity against a literal query vector (directly
  * or through one Project alias — `topK`'s shape), over a relation
  * partitioned by `list_id` with a readable sidecar, not already pruned.
  * Anything else is left untouched.
  */
case class IvfAutoProbe(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.ivf.autoProbe").exists(_.toBoolean)
  private def nProbe: Int =
    spark.conf.getOption("spark.graft.ivf.nProbe").map(_.toInt).getOrElse(4)

  /** The sort under the limit pair, looking through one column-pruning
    * Project: `topK(...).select(cols)` optimizes to
    * `GlobalLimit(LocalLimit(Project(Sort(...))))` — without this the most
    * common consumer shape silently loses pruning and full-scans the store.
    */
  private def sortUnderLimit(rest: LogicalPlan): Option[(Option[Project], Sort)] = rest match {
    case s: Sort if s.global                      => Some((None, s))
    case p @ Project(_, s: Sort) if s.global      => Some((Some(p), s))
    case _                                        => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformDown {
      case orig @ GlobalLimit(gl, LocalLimit(ll, rest))
          if sortUnderLimit(rest).exists(_._2.order.headOption.exists(_.direction == Descending)) =>
        val (proj, s) = sortUnderLimit(rest).get
        val order     = s.order
        val child     = s.child
        val rewritten = for {
          (qv, vecExpr) <- queryVector(order.head.child, child)
          (rel, listAttr, root) <- ivfStore(child)
          if !alreadyPruned(child, listAttr)
          // The ranked column must BE the relation's indexed column: pruning
          // on centroids of a different column (a second vector column, or
          // one from a joined table) would be uncorrelated with the sort and
          // silently destroy recall.
          vecAttr <- stripCasts(vecExpr) match {
            case a: AttributeReference => Some(a)
            case _                     => None
          }
          relVec <- rel.output.collectFirst {
            case a: AttributeReference if a.exprId == vecAttr.exprId => a
          }
          stored <- Ivf.readCentroids(root, spark.sparkContext.hadoopConfiguration)
          if stored.column.forall(_ == relVec.name)
          model = stored.model
          if model.centroids.nonEmpty && model.centroids.head.length == qv.length
        } yield {
          val probes = model.probeLists(qv.toSeq, nProbe)
          val pruned = child.transformUp {
            case r: LogicalRelation if r eq rel =>
              Filter(In(listAttr, probes.map(i => Literal(i))), r)
          }
          val newSort = s.copy(child = pruned)
          GlobalLimit(gl, LocalLimit(ll, proj.map(p => p.copy(child = newSort)).getOrElse(newSort)))
        }
        rewritten.getOrElse(orig)
    }

  private def stripCasts(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCasts(c)
    case other            => other
  }

  /** The literal query vector AND the expression it is ranked against, if
    * the sort key is cosine similarity against a literal — matched on the
    * expression itself or through one Project alias.
    */
  private def queryVector(key: Expression, child: LogicalPlan): Option[(Array[Double], Expression)] = {
    def direct(e: Expression): Option[(Array[Double], Expression)] = e match {
      case CosineSimilarity(v, Literal(q: ArrayData, ArrayType(DoubleType, _))) => Some((q.toDoubleArray(), v))
      case CosineSimilarity(Literal(q: ArrayData, ArrayType(DoubleType, _)), v) => Some((q.toDoubleArray(), v))
      case _ => None
    }
    key match {
      case a: AttributeReference =>
        child.collect { case p: Project => p.projectList }.flatten.collectFirst {
          case al @ Alias(inner, _) if al.exprId == a.exprId => direct(inner)
        }.flatten
      case other => direct(other)
    }
  }

  /** The IVF-partitioned relation under the sort, with its list_id output
    * attribute and root path.
    */
  private def ivfStore(child: LogicalPlan): Option[(LogicalRelation, AttributeReference, String)] =
    child.collectFirst {
      case r: LogicalRelation if r.relation.isInstanceOf[HadoopFsRelation] &&
          r.relation.asInstanceOf[HadoopFsRelation].partitionSchema.fieldNames.contains("list_id") =>
        r.output.collectFirst { case a: AttributeReference if a.name == "list_id" =>
          (r, a, r.relation.asInstanceOf[HadoopFsRelation].location.rootPaths.head.toString)
        }
    }.flatten

  /** Idempotency / user-intent guard: any IN or = filter on list_id below
    * the sort means the probe (ours or the user's) already exists.
    */
  private def alreadyPruned(child: LogicalPlan, listAttr: AttributeReference): Boolean =
    child.exists {
      case Filter(cond, _) =>
        cond.exists {
          case In(a: AttributeReference, _) if a.exprId == listAttr.exprId => true
          case EqualTo(a: AttributeReference, _) if a.exprId == listAttr.exprId => true
          case InSet(a: AttributeReference, _) if a.exprId == listAttr.exprId => true
          case _ => false
        }
      case _ => false
    }
}
