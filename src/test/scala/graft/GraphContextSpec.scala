package graft

import graft.operators.Graph
import org.scalatest.funsuite.AnyFunSuite

/** Graph.Context contract (VERDICT r13 task 3): the amortized standing-
  * corpus API must (a) answer every family identically to the one-shot
  * functions, (b) pin its statics ONCE — persistent-RDD count FLAT across
  * N calls — and (c) release everything deterministically on close(),
  * with already-returned results staying valid (they are eager
  * localCheckpoints, not views over the pinned caches).
  */
class GraphContextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Two communities bridged once, plus a dangling sink — exercises the
    * contribution join, the dangling reduce, LPA convergence, triangles
    * and modularity on one small deterministic graph.
    */
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L),       // triangle A
    (4L, 5L), (5L, 6L), (6L, 4L),       // triangle B
    (3L, 4L),                           // bridge
    (6L, 7L),                           // dangling sink 7
  ).toDF("src", "dst")

  private def prMap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.as[(Long, Double)].collect().toMap

  test("every family matches the one-shot API value-for-value") {
    val ctx = Graph.context(edges, "src", "dst")
    try {
      assert(prMap(ctx.pagerank(iters = 3)) == prMap(Graph.pagerank(edges, "src", "dst", iters = 3)))
      assert(prMap(ctx.pagerank(iters = 2, redistributeDangling = true)) ==
        prMap(Graph.pagerank(edges, "src", "dst", iters = 2, redistributeDangling = true)))
      assert(ctx.labelPropagation(iters = 4).as[(Long, Long)].collect().toMap ==
        Graph.labelPropagation(edges, "src", "dst", iters = 4).as[(Long, Long)].collect().toMap)
      assert(ctx.triangleCounts().as[(Long, Long, Long)].collect().toSet ==
        Graph.triangleCounts(edges, "src", "dst").as[(Long, Long, Long)].collect().toSet)
      assert(ctx.clusteringCoefficient().collect().map(_.toSeq).toSet ==
        Graph.clusteringCoefficient(edges, "src", "dst").collect().map(_.toSeq).toSet)
      val labels = ctx.labelPropagation(iters = 4)
      assert(ctx.modularity(labels).collect().map(_.toSeq).toSet ==
        Graph.modularity(edges, "src", "dst", labels).collect().map(_.toSeq).toSet)
    } finally ctx.close()
  }

  test("statics pin once: persistent-RDD count is flat across N calls, baseline after close") {
    def live: Int = spark.sparkContext.getPersistentRDDs.size
    // other suites share this session; measure relative to OUR baseline
    val baseline = live
    val ctx = Graph.context(edges, "src", "dst")
    // first calls build + pin each family's statics (results are local
    // checkpoints — drop them immediately so only statics remain counted)
    def drop(df: org.apache.spark.sql.DataFrame): Unit =
      org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(df)
    try {
      drop(ctx.pagerank(iters = 2, redistributeDangling = true))
      drop(ctx.triangleCounts())
      drop(ctx.labelPropagation(iters = 2))
      val afterFirst = live
      assert(afterFirst > baseline, "statics should be pinned after the first calls")
      // N more calls across the families: count must NOT grow — per-call
      // iterate caches release inside each call, statics are reused
      for (_ <- 1 to 3) {
        drop(ctx.pagerank(iters = 2, redistributeDangling = true))
        drop(ctx.triangleCounts())
        drop(ctx.labelPropagation(iters = 2))
      }
      // one-sided: growth is the leak under test; a background
      // ContextCleaner pass shrinking earlier suites' leftovers is benign
      assert(live <= afterFirst,
        s"persistent RDDs grew across repeated calls: $afterFirst -> $live")
      // a result returned BEFORE close must stay readable AFTER close
      val keep = ctx.pagerank(iters = 1)
      ctx.close()
      assert(live <= baseline + 1, // + the kept result's checkpoint
        s"close() must release the pinned statics: baseline $baseline, after close $live")
      assert(keep.count() == 7)
      drop(keep)
    } finally ctx.close()
  }

  test("connectedComponents: labeling pins once — persistent-RDD count flat across N calls") {
    def live: Int = spark.sparkContext.getPersistentRDDs.size
    def drop(df: org.apache.spark.sql.DataFrame): Unit =
      org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(df)
    val baseline = live
    val nodes = (1L to 10L).toDF("id")
    val ctx = Graph.context(edges, "src", "dst")
    try {
      drop(ctx.connectedComponents(nodes, "id"))
      val afterFirst = live
      assert(afterFirst > baseline, "the labeling should be pinned after the first call")
      for (_ <- 1 to 3) drop(ctx.connectedComponents(nodes, "id"))
      assert(live <= afterFirst,
        s"persistent RDDs grew across repeated CC calls: $afterFirst -> $live")
      val keep = ctx.connectedComponents(nodes, "id")
      ctx.close()
      assert(live <= baseline + 1,
        s"close() must release the pinned labeling: baseline $baseline, after close $live")
      assert(keep.count() == 10)
      drop(keep)
    } finally ctx.close()
  }

  test("connectedComponents: value parity with the one-shot path on BOTH execution paths") {
    import graft.operators.Dedup
    // chain 1-2-3-4 bridged to triangle 4-5-6, sink 7; node 99 isolated
    val nodes = (Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 99L)).toDF("id")
    val ctx = Graph.context(edges, "src", "dst")
    try {
      def dropped(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
        val m = df.as[(Long, Long)].collect().toMap
        org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(df)
        m
      }
      val got = dropped(ctx.connectedComponents(nodes, "id"))
      val oneShot = Dedup.connectedComponents(nodes, edges, "id", "src", "dst")
        .as[(Long, Long)].collect().toMap
      assert(got == oneShot)
      assert(got(99L) == 99L, "isolated node must be a singleton")
      // a DIFFERENT node frame against the same pinned labeling
      val nodes2 = (Seq(1L, 7L, 42L, 43L)).toDF("id")
      val got2 = dropped(ctx.connectedComponents(nodes2, "id"))
      assert(got2(42L) == 42L && got2(43L) == 43L && got2(1L) == 1L)
      // loop params are fixed by the first call
      val ex = intercept[IllegalArgumentException](
        ctx.connectedComponents(nodes, "id", maxDriverEdges = 0L))
      assert(ex.getMessage.contains("fixed"))
    } finally ctx.close()
    // distributed path (maxDriverEdges = 0 forces label propagation)
    val ctx2 = Graph.context(edges, "src", "dst")
    try {
      val got = {
        val df = ctx2.connectedComponents(nodes, "id", maxDriverEdges = 0L)
        val m  = df.as[(Long, Long)].collect().toMap
        org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(df)
        m
      }
      val oneShot = Dedup.connectedComponents(nodes, edges, "id", "src", "dst",
        maxDriverEdges = 0L).as[(Long, Long)].collect().toMap
      assert(got == oneShot)
    } finally ctx2.close()
  }

  test("incrementalComponents: absorbs the delta into the pin — parity, fixpoint, flat RDD count") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.col
    def live: Int = spark.sparkContext.getPersistentRDDs.size
    def dropped(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val m = df.as[(Long, Long)].collect().toMap
      org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(df)
      m
    }
    val nodes = (Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 42L, 99L)).toDF("id")
    val delta = Seq((7L, 42L), (100L, 101L)).toDF("u", "v") // bridge 7 to 42; all-new island
    val ctx   = Graph.context(edges, "src", "dst")
    try {
      // parity: absorb == one-shot incremental over the same base labeling
      val base = Dedup.connectedComponents(
        edges.select(col("src").as("id")).union(edges.select(col("dst").as("id"))).distinct(),
        edges, "id", "src", "dst")
      val oneShot = Dedup.incrementalComponents(base, delta, "id", "component", "u", "v")
        .as[(Long, Long)].collect().toMap
      val got = dropped(ctx.incrementalComponents(nodes, "id", delta, "u", "v"))
      nodes.as[Long].collect().foreach { id =>
        assert(got(id) == oneShot.getOrElse(id, id), s"node $id") }
      assert(got(42L) == got(7L) && got(42L) == got(1L), "delta must bridge 42 into the chain")
      // the absorbed state SERVES subsequent connectedComponents calls
      // (same node frame → same coverage: absorbed pin ∪ singletons)
      val after = dropped(ctx.connectedComponents(nodes, "id"))
      assert(after == got, "the pin must hold the absorbed labeling")
      // fixpoint: replaying the same batch changes nothing (at-least-once)
      val n0     = live
      val replay = dropped(ctx.incrementalComponents(nodes, "id", delta, "u", "v"))
      assert(replay == got, "replaying the same delta must be a no-op on values")
      assert(live <= n0, s"persistent RDDs grew across replays: $n0 -> $live (old pin not freed)")
    } finally ctx.close()
  }

  test("connectedComponents: a non-converged loop refuses to pin (ADVICE r15); retry can re-pin") {
    import org.apache.spark.sql.functions.col
    // a 40-node chain with maxIters=1 on the distributed path cannot reach
    // the fixpoint; the one-shot API throws, and the context must throw
    // the same way rather than pin (and forever serve) a truncated labeling
    val chain = (0L until 39L).map(i => (i, i + 1)).toDF("src", "dst")
    val nodes = (0L until 40L).toDF("id")
    val ctx   = Graph.context(chain, "src", "dst")
    try {
      val ex = intercept[IllegalArgumentException](
        ctx.connectedComponents(nodes, "id", maxIters = 1, maxDriverEdges = 0L))
      assert(ex.getMessage.contains("converge"))
      // the failed pin must not poison the context: workable params re-pin
      val ok = ctx.connectedComponents(nodes, "id", maxIters = 20, maxDriverEdges = 0L)
      assert(ok.where(col("component") =!= 0L).count() == 0, "one chain, one component")
      org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(ok)
    } finally ctx.close()
  }

  test("close is idempotent and a closed context refuses new queries") {
    val ctx = Graph.context(edges, "src", "dst")
    ctx.pagerank(iters = 1).collect()
    ctx.close()
    ctx.close()
    val ex = intercept[IllegalArgumentException](ctx.pagerank(iters = 1))
    assert(ex.getMessage.contains("closed"))
  }
}
