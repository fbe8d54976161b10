package graft.plans

import graft.operators.{Ivf, Search}
import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

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
  * FILTERED queries get [[Ivf.search]]'s CARDINALITY GATE (round 15 — the
  * reference's canonical query is filtered k-NN, `backend/vector_db.py:
  * 131-170`, and a fixed-width probe under a selective predicate keeps
  * only `sel` of the probed mass: recall cliff): when user predicates sit
  * between the sort and the relation, the probe width widens to
  * `ceil(nProbe/sel)` (sel from the gate's shared one-aggregate estimate,
  * or `spark.graft.ivf.selectivityHint`), and once the widened probe
  * reaches nList the rule DECLINES — the user's own plan IS the exact
  * branch (brute-force over the filtered store), strictly cheaper than a
  * prune that reads everything anyway. Because this rule only INJECTS a
  * filter, user predicates always survive verbatim on either path; the
  * gate merely picks the width, exactly like the explicit
  * `Ivf.search(filters = …)` call.
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
  private def selectivityHint: Double =
    spark.conf.getOption("spark.graft.ivf.selectivityHint").map(_.toDouble).getOrElse(Double.NaN)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformDown {
      case orig @ GlobalLimit(gl, LocalLimit(ll, rest))
          if TopKMatch.sortUnderLimit(rest).exists(_._2.order.headOption.exists(_.direction == Descending)) =>
        val (proj, s) = TopKMatch.sortUnderLimit(rest).get
        val order     = s.order
        val child     = s.child
        val rewritten = for {
          (qv, vecExpr) <- TopKMatch.queryVector(order.head.child, child)
          (rel, listAttr, root) <- TopKMatch.partitionedStore(child, "list_id")
          if !alreadyPruned(child, listAttr)
          // a PQ floats store is PqAutoProbe's territory while that rule is
          // enabled — its ADC probe reads m bytes/vector where this rule's
          // pruned float scan reads the full vectors. Narrowed (ADVICE
          // r15): yield only when the PQ rule WOULD actually substitute
          // this subtree — shapes it refuses (wide output, non-tiebreak
          // secondary sort) keep the IVF partition pruning instead of
          // silently full-scanning the floats store.
          if !(root.endsWith("/floats") && PqAutoProbe(spark).wouldRewrite(orig))
          // The ranked column must BE the relation's indexed column: pruning
          // on centroids of a different column (a second vector column, or
          // one from a joined table) would be uncorrelated with the sort and
          // silently destroy recall.
          vecAttr <- TopKMatch.stripCasts(vecExpr) match {
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
          width <- gatedWidth(child, rel, relVec, listAttr, model.centroids.length)
        } yield {
          if (width >= model.centroids.length) orig // probing everything — the user's exact plan wins
          else {
            val probes = model.probeLists(qv.toSeq, width)
            val pruned = child.transformUp {
              case r: LogicalRelation if r eq rel =>
                Filter(In(listAttr, probes.map(i => Literal(i))), r)
            }
            val newSort = s.copy(child = pruned)
            GlobalLimit(gl, LocalLimit(ll, proj.map(p => p.copy(child = newSort)).getOrElse(newSort)))
          }
        }
        rewritten.getOrElse(orig)
    }

  /** [[Ivf.search]]'s cardinality gate in rule form. User predicates are
    * the Filter conjuncts between the sort and the relation whose
    * references live entirely in the relation, excluding the guards
    * `Search.topK` plants (NOT-isnan / not-null on the vector or a
    * non-relation score alias resolves to references outside `rel` or on
    * `relVec` — both skipped, they don't cut candidate mass). With no user
    * predicates the width is the configured nProbe unchanged; `None` is
    * never returned here (injection drops nothing), the Option is just
    * for-comprehension plumbing.
    */
  private def gatedWidth(
      child: LogicalPlan,
      rel: LogicalRelation,
      relVec: AttributeReference,
      listAttr: AttributeReference,
      nList: Int,
  ): Option[Int] = {
    def onPath(p: LogicalPlan): Seq[Expression] = p match {
      case r: LogicalRelation if r eq rel => Nil
      case Project(_, c)                  => onPath(c)
      case Filter(cond, c)                => TopKMatch.splitConjuncts(cond) ++ onPath(c)
      case other                          => other.children.flatMap(onPath)
    }
    val userPreds = onPath(child).filter { c =>
      c.references.nonEmpty &&
        c.references.forall(a => rel.outputSet.contains(a)) &&
        !c.references.contains(relVec) && !c.references.contains(listAttr) &&
        !(c match { case Not(IsNaN(_)) => true; case _ => false })
    }
    if (userPreds.isEmpty) Some(math.min(nProbe, nList))
    else {
      val store = GraftBridge.ofRows(spark, rel)
      val pred  = userPreds.map(GraftBridge.column).reduce(_ && _)
      val sel   = Search.estimatedSelectivity(store, pred, selectivityHint)
      val base  = math.min(nProbe, nList)
      if (sel == 0d) Some(nList) // nothing passes — decline, exact plan returns empty for free
      else Some(math.min(math.ceil(base.toDouble / sel), nList.toDouble).toInt)
    }
  }

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
