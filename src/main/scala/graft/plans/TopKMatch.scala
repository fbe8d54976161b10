package graft.plans

import graft.functions.CosineSimilarity
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** The shared declarative-top-k pattern matching of the auto-probe rules
  * ([[IvfAutoProbe]], [[HnswAutoProbe]], [[PqAutoProbe]]): all three
  * recognize the same user shape — a global Sort+Limit whose primary key
  * is descending cosine against a literal query vector over a stored
  * relation's own vector column — and differ only in what they do with it
  * (inject a partition filter / substitute a beam plan / substitute an ADC
  * probe). Keeping the recognizers here means the conservative-match rules
  * (one Project of look-through, alias resolution, cast stripping) cannot
  * drift between the rules.
  */
private[plans] object TopKMatch {

  /** The sort under the limit pair, looking through one column-pruning
    * Project: `topK(...).select(cols)` optimizes to
    * `GlobalLimit(LocalLimit(Project(Sort(...))))` — without the
    * look-through the most common consumer shape silently loses the
    * rewrite (at 768-d scale that showed up as a full store scan with
    * perfect recall — the worst kind of regression).
    */
  def sortUnderLimit(rest: LogicalPlan): Option[(Option[Project], Sort)] = rest match {
    case s: Sort if s.global                 => Some((None, s))
    case p @ Project(_, s: Sort) if s.global => Some((Some(p), s))
    case _                                   => None
  }

  def stripCasts(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCasts(c)
    case other            => other
  }

  /** The literal query vector AND the expression it is ranked against —
    * matched on the sort key itself or through one Project alias
    * (`Search.topK`'s withColumn shape).
    */
  def queryVector(key: Expression, child: LogicalPlan): Option[(Array[Double], Expression)] = {
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

  /** True when the sort's ONLY secondary key (if any) is the id-ascending
    * tiebreak the substituted operator itself applies — any other
    * secondary ordering would be silently replaced (ADVICE r14).
    */
  def tiebreakOnly(order: Seq[SortOrder], idAttr: AttributeReference): Boolean =
    order.length == 1 || (order.length == 2 &&
      order(1).direction == Ascending && (order(1).child match {
        case a: AttributeReference => a.exprId == idAttr.exprId
        case _                     => false
      }))

  def splitConjuncts(c: Expression): Seq[Expression] = c match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other     => Seq(other)
  }

  /** Substitution safety walk: the path from the sort's child to the
    * relation may contain only Projects and Filters; returns the USER
    * predicate conjuncts with `Search.topK`'s planted guards stripped
    * (NOT-isnan / not-null REFERENCING the score alias or the vector —
    * after pushdown the score guard may reference the inlined cosine over
    * the vector; constraint inference plants the vector not-null). None =
    * something a substitution would drop (a join, a set op) — refuse.
    */
  def pathPredicates(
      p: LogicalPlan,
      rel: LogicalRelation,
      vecAttr: AttributeReference,
      scoreId: Option[ExprId],
  ): Option[Seq[Expression]] = {
    def benign(c: Expression): Boolean = {
      def scoreOrVec(e: Expression): Boolean =
        e.references.nonEmpty && e.references.forall(a =>
          a.exprId == vecAttr.exprId || scoreId.contains(a.exprId))
      c match {
        case Not(IsNaN(e)) => scoreOrVec(e)
        case IsNotNull(e)  => scoreOrVec(e)
        case _             => false
      }
    }
    p match {
      case r: LogicalRelation if r eq rel => Some(Nil)
      case Project(_, c)                  => pathPredicates(c, rel, vecAttr, scoreId)
      case Filter(cond, c) =>
        pathPredicates(c, rel, vecAttr, scoreId)
          .map(splitConjuncts(cond).filterNot(benign) ++ _)
      case _ => None
    }
  }

  /** The first parquet relation under `child` whose partition schema
    * carries `partCol`, with that column's output attribute and the scan
    * root.
    */
  def partitionedStore(child: LogicalPlan, partCol: String): Option[(LogicalRelation, AttributeReference, String)] =
    child.collectFirst {
      case r: LogicalRelation if r.relation.isInstanceOf[HadoopFsRelation] &&
          r.relation.asInstanceOf[HadoopFsRelation].partitionSchema.fieldNames.contains(partCol) =>
        r.output.collectFirst { case a: AttributeReference if a.name == partCol =>
          (r, a, r.relation.asInstanceOf[HadoopFsRelation].location.rootPaths.head.toString)
        }
    }.flatten

  /** Does `dir/name` exist (fail-closed: any IO error means no). */
  def sidecarExists(conf: org.apache.hadoop.conf.Configuration, dir: String, name: String): Boolean =
    try {
      val p = new org.apache.hadoop.fs.Path(dir, name)
      p.getFileSystem(conf).exists(p)
    } catch { case scala.util.control.NonFatal(_) => false }
}
