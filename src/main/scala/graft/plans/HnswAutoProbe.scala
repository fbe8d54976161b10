package graft.plans

import graft.functions.CosineSimilarity
import graft.operators.Hnsw
import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}

/** Optimizer rule turning a brute-force cosine top-k over an HNSW store
  * into the sharded beam search — [[IvfAutoProbe]]'s twin for the graph
  * index (reference: Qdrant serves every search through HNSW implicitly,
  * `backend/vector_db.py:165-170`; a declarative query over OUR graph
  * store should get the index implicitly too, not only callers who know
  * to invoke [[Hnsw.searchIndex]]). The user writes
  *
  * {{{ store.orderBy(cosineFast(col("vec"), lit(q)).desc).limit(k) }}}
  *
  * (or the same through `Search.topK(store, "vec", "id", q, k)`), and when
  * the scan's root path carries the `_hnsw_meta` sidecar written by
  * [[Hnsw.writeIndex]], the whole Sort+Limit subtree is REPLACED by
  * [[Hnsw.searchIndex]]'s logical plan over the same relation — per-shard
  * graph reconstruction + beam search + the ≤ nShards·k merge — with the
  * beam output re-aliased to the original output attribute ids, so
  * downstream operators resolve unchanged.
  *
  * Unlike the IVF rule (which only INJECTS a partition filter, so any
  * user predicate survives), this rewrite SUBSTITUTES the subtree, so the
  * match is strictly conservative:
  *
  *  - sort key: descending cosine against a literal query vector over the
  *    relation's own `vec` column (directly or through one Project alias);
  *  - the path from the sort to the relation may contain only Projects
  *    and the NaN/null guards `Search.topK` plants (any other filter or a
  *    join would be silently dropped by a substitution — refused);
  *  - the subtree's OUTPUT must reach only the store's `id` and the
  *    cosine alias (the searchIndex contract); a consumer reading `vec`
  *    or adjacency columns keeps the exact scan.
  *
  * Same recall trade as [[Hnsw.searchIndex]] (beam width
  * `spark.graft.hnsw.efSearch`, default 64), so it is OPT-IN:
  * `spark.graft.hnsw.autoProbe=true`. Registered via
  * [[graft.GraftExtensions]] (spark-submit) or
  * `spark.experimental.extraOptimizations` (live session).
  */
case class HnswAutoProbe(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.hnsw.autoProbe").exists(_.toBoolean)
  private def efSearch: Int =
    spark.conf.getOption("spark.graft.hnsw.efSearch").map(_.toInt).getOrElse(64)

  /** The sort under the limit pair, looking through one column-pruning
    * Project — `Search.topK(...).select("id", "score")`'s optimized shape.
    */
  private def sortUnderLimit(rest: LogicalPlan): Option[Sort] = rest match {
    case s: Sort if s.global             => Some(s)
    case Project(_, s: Sort) if s.global => Some(s)
    case _                               => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformDown {
      case orig @ GlobalLimit(Literal(k: Int, IntegerType), LocalLimit(_, rest))
          if sortUnderLimit(rest).exists(_.order.headOption.exists(_.direction == Descending)) =>
        val s     = sortUnderLimit(rest).get
        val child = s.child
        val rewritten = for {
          (qv, vecExpr) <- queryVector(s.order.head.child, child)
          (rel, root)   <- hnswStore(child)
          if benignPath(child, rel)
          // the ranked column must BE the store's vector column — beam
          // geometry over a different column would be uncorrelated with
          // the sort and silently destroy recall
          vecAttr <- stripCasts(vecExpr) match {
            case a: AttributeReference => Some(a)
            case _                     => None
          }
          if rel.output.exists(a => a.exprId == vecAttr.exprId && a.name == "vec")
          idAttr <- rel.output.collectFirst { case a: AttributeReference if a.name == "id" => a }
          scoreId = s.order.head.child match {
            case a: AttributeReference => Some(a.exprId)
            case _                     => None
          }
          // substitution contract: every output must map onto the beam's
          // (id, score) — anything else keeps the exact scan
          if orig.output.forall(a =>
            a.exprId == idAttr.exprId || scoreId.contains(a.exprId))
        } yield {
          val hits = Hnsw.searchIndex(
            GraftBridge.ofRows(spark, rel), qv.toSeq, "id", k, efSearch)
          val hplan              = GraftBridge.analyzed(hits)
          val Seq(hId, hScore)   = hplan.output.take(2)
          val aliased = orig.output.map { a =>
            val src = if (a.exprId == idAttr.exprId) hId else hScore
            Alias(src, a.name)(exprId = a.exprId)
          }
          Project(aliased, hplan)
        }
        rewritten.getOrElse(orig)
    }

  private def stripCasts(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCasts(c)
    case other            => other
  }

  /** The literal query vector AND the expression it is ranked against —
    * matched on the sort key itself or through one Project alias
    * (`topK`'s withColumn shape).
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

  /** The HNSW store relation under the sort: `shard`-partitioned parquet
    * whose root carries the `_hnsw_meta` sidecar ([[Hnsw.writeIndex]]'s
    * signature, like `_graft_centroids.txt` for IVF stores).
    */
  private def hnswStore(child: LogicalPlan): Option[(LogicalRelation, String)] =
    child.collectFirst {
      case r: LogicalRelation if r.relation.isInstanceOf[HadoopFsRelation] &&
          r.relation.asInstanceOf[HadoopFsRelation].partitionSchema.fieldNames.contains("shard") =>
        val root = r.relation.asInstanceOf[HadoopFsRelation].location.rootPaths.head.toString
        val has =
          try {
            val p  = new org.apache.hadoop.fs.Path(root, "_hnsw_meta")
            p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
          } catch { case scala.util.control.NonFatal(_) => false }
        if (has) Some((r, root)) else None
    }.flatten

  /** Substitution safety: the path from the sort's child to the relation
    * may contain only Projects and the NaN/null guards `Search.topK`
    * plants — any other predicate (or a join) would be dropped by the
    * substitution, so the rewrite refuses.
    */
  private def benignPath(p: LogicalPlan, rel: LogicalRelation): Boolean = p match {
    case r: LogicalRelation         => r eq rel
    case Project(_, c)              => benignPath(c, rel)
    case Filter(cond, c)            => benignCond(cond) && benignPath(c, rel)
    case _                          => false
  }

  private def benignCond(c: Expression): Boolean = c match {
    case And(a, b)     => benignCond(a) && benignCond(b)
    case Not(IsNaN(_)) => true
    case IsNotNull(_)  => true
    case _             => false
  }
}
