package graft.plans

import graft.operators.{Ivf, Pq}
import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule turning a brute-force cosine top-k over the FLOAT half
  * of a persistent IVF-PQ store ([[Pq.writeStore]]'s `root/floats`) into
  * the ADC probe over the CODE half — the round-15 closer of the r14
  * verdict's #2: the floats store carries the IVF sidecar, so a
  * declarative `floats.orderBy(cos.desc).limit(k)` used to get at best
  * [[IvfAutoProbe]]'s partition-pruned FLOAT scan (6 KB/vector at 768-d)
  * when the whole point of the PQ store is the 96 B/vector candidate scan
  * ([[Pq.searchIvfPq]]: prune lists → ADC top k·refine over codes → exact
  * float re-rank of just those candidates).
  *
  * Detection: the matched relation is `list_id`-partitioned parquet whose
  * root ends in `/floats`, whose root carries `_graft_centroids.txt`, and
  * whose PARENT carries `_pq_codebooks.txt` — exactly [[Pq.writeStore]]'s
  * two-store layout, self-describing via its sidecars. The code store is
  * reopened from the sibling `/codes` directory; its schema names the id
  * column (the one column that is neither `pq_codes` nor `list_id`).
  *
  * Substitution contract mirrors [[HnswAutoProbe]] (this rule REPLACES
  * the subtree): primary sort key is descending cosine against a literal
  * over the store's own indexed column, the only admissible secondary key
  * is the id-ascending tiebreak, the path holds only Projects and the
  * `Search.topK` guards plus optional USER predicates over the store's
  * non-vector columns — those route through [[Pq.searchIvfPq]]'s
  * cardinality gate with the floats store itself as the payload carrier —
  * and the output reaches only (id, score). Anything else keeps the
  * user's plan.
  *
  * Same recall trade as the explicit call, so OPT-IN:
  * `spark.graft.pq.autoProbe=true`; probe width `spark.graft.pq.nProbe`
  * (default 4), re-rank pool `spark.graft.pq.refine` (default 4),
  * optional `spark.graft.pq.selectivityHint`. When both this rule and
  * [[IvfAutoProbe]] are registered ([[graft.GraftExtensions]] injects
  * this one FIRST), the IVF rule declines PQ floats stores while this
  * rule is enabled, so the two never fight over the same scan.
  */
object PqAutoProbe {
  /** Per-(session, store) cache of the reopened store — the 768-d tier
    * measured the UNCACHED rule at 3–5× the explicit call: re-listing the
    * nList partition directories of the code store and re-parsing both
    * sidecars ON EVERY QUERY dominates the probe itself. Freshness is a
    * token over the two sidecar mtimes plus the codes directory mtime
    * ([[graft.operators.Pq.applyDelta]]'s per-list swaps touch the codes
    * dir), so a maintained store invalidates its entry; a stale-token hit
    * reloads. Keyed by session too — DataFrames are session-bound.
    *
    * LIMITATION, stated plainly: object stores without real directory
    * mtimes (S3 prefixes report none) make the token constant, so a store
    * maintained in place there would keep serving the cached file listing
    * — the same staleness any user-held DataFrame over a rewritten store
    * has. Call [[invalidate]] after maintenance on such filesystems.
    */
  private val storeCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, String), (Long, (graft.operators.Ivf.StoredIndex, graft.operators.Pq.Model, org.apache.spark.sql.DataFrame))]()

  /** Drop every session's cached entry for `root` (the store root passed
    * to [[graft.operators.Pq.writeStore]]) — the explicit escape hatch for
    * filesystems whose directory mtimes cannot carry the freshness token.
    */
  def invalidate(root: String): Unit = {
    val it = storeCache.keySet.iterator()
    while (it.hasNext) if (it.next()._2 == root) it.remove()
  }

  private def mtime(conf: org.apache.hadoop.conf.Configuration, p: String): Long =
    try {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(conf).getFileStatus(hp).getModificationTime
    } catch { case scala.util.control.NonFatal(_) => -1L }

  private[plans] def storeFor(
      spark: SparkSession, parent: String, floatsRoot: String,
  ): Option[(graft.operators.Ivf.StoredIndex, graft.operators.Pq.Model, org.apache.spark.sql.DataFrame)] = {
    val conf  = spark.sparkContext.hadoopConfiguration
    val token = mtime(conf, s"$parent/_pq_codebooks.txt") ^
      java.lang.Long.rotateLeft(mtime(conf, s"$floatsRoot/_graft_centroids.txt"), 21) ^
      java.lang.Long.rotateLeft(mtime(conf, s"$parent/codes"), 42)
    val key = (System.identityHashCode(spark), parent)
    val cur = storeCache.get(key)
    if (cur != null && cur._1 == token) Some(cur._2)
    else {
      val loaded = for {
        stored <- graft.operators.Ivf.readCentroids(floatsRoot, conf)
        pqm    <- graft.operators.Pq.readCodebooks(spark, parent)
      } yield (stored, pqm, spark.read.parquet(parent + "/codes"))
      loaded.foreach(v => storeCache.put(key, (token, v)))
      loaded
    }
  }
}

case class PqAutoProbe(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.pq.autoProbe").exists(_.toBoolean)
  private def nProbe: Int =
    spark.conf.getOption("spark.graft.pq.nProbe").map(_.toInt).getOrElse(4)
  private def refine: Int =
    spark.conf.getOption("spark.graft.pq.refine").map(_.toInt).getOrElse(4)
  private def selectivityHint: Double =
    spark.conf.getOption("spark.graft.pq.selectivityHint").map(_.toDouble).getOrElse(Double.NaN)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformDown {
      case orig @ GlobalLimit(Literal(k: Int, IntegerType), LocalLimit(_, rest))
          if TopKMatch.sortUnderLimit(rest).exists(_._2.order.headOption.exists(_.direction == Descending)) =>
        val s     = TopKMatch.sortUnderLimit(rest).get._2
        val child = s.child
        val conf  = spark.sparkContext.hadoopConfiguration
        val rewritten = for {
          (qv, vecExpr)         <- TopKMatch.queryVector(s.order.head.child, child)
          (rel, listAttr, root) <- TopKMatch.partitionedStore(child, "list_id")
          if root.endsWith("/floats")
          parent = root.stripSuffix("/floats")
          if TopKMatch.sidecarExists(conf, parent, "_pq_codebooks.txt")
          vecAttr <- TopKMatch.stripCasts(vecExpr) match {
            case a: AttributeReference => Some(a)
            case _                     => None
          }
          relVec <- rel.output.collectFirst {
            case a: AttributeReference if a.exprId == vecAttr.exprId => a
          }
          (stored, pqm, codes) <- PqAutoProbe.storeFor(spark, parent, root)
          if stored.column.forall(_ == relVec.name)
          if stored.model.centroids.nonEmpty && stored.model.centroids.head.length == qv.length
          idCol <- codes.columns.filterNot(c => c == "pq_codes" || c == "list_id") match {
            case Array(one) => Some(one)
            case _          => None
          }
          idAttr <- rel.output.collectFirst { case a: AttributeReference if a.name == idCol => a }
          if TopKMatch.tiebreakOnly(s.order, idAttr)
          scoreId = s.order.head.child match {
            case a: AttributeReference => Some(a.exprId)
            case _                     => None
          }
          preds <- TopKMatch.pathPredicates(child, rel, vecAttr, scoreId)
          // user predicates must be expressible over the store (and not
          // touch the vector or the partition column — a manual list_id
          // restriction means the user is doing their own pruning)
          if preds.forall(p =>
            p.references.nonEmpty && p.references.forall(a =>
              rel.outputSet.contains(a) &&
                a.exprId != vecAttr.exprId && a.exprId != listAttr.exprId))
          if orig.output.forall(a =>
            a.exprId == idAttr.exprId || scoreId.contains(a.exprId))
        } yield {
          val floats = GraftBridge.ofRows(spark, rel)
          val hits =
            if (preds.isEmpty)
              Pq.searchIvfPq(codes, floats, stored.model, pqm, relVec.name, idCol,
                qv.toSeq, k, nProbe, refine)
            else {
              val payloadAttrs = idAttr +: preds.flatMap(_.references)
                .filter(_.exprId != idAttr.exprId).distinct.toSeq
              val payload = floats.select(payloadAttrs.map(a => GraftBridge.column(a)): _*)
              Pq.searchIvfPq(codes, floats, stored.model, pqm, relVec.name, idCol,
                qv.toSeq, k, nProbe, refine,
                filters = preds.map(GraftBridge.column),
                payload = payload, payloadIdCol = idCol, selectivityHint = selectivityHint)
            }
          val pruned = hits.select(
            org.apache.spark.sql.functions.col(idCol),
            org.apache.spark.sql.functions.col("score"))
          val hplan            = GraftBridge.optimized(pruned)
          val Seq(hId, hScore) = hplan.output.take(2)
          val aliased = orig.output.map { a =>
            val src = if (a.exprId == idAttr.exprId) hId else hScore
            Alias(src, a.name)(exprId = a.exprId)
          }
          Project(aliased, hplan)
        }
        rewritten.getOrElse(orig)
    }
}
