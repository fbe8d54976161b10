package graft

import graft.operators.Expectations
import graft.operators.Expectations._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed contract for the DQ expectation suite and the
  * k-anonymity audit, plus the pass-budget plan shape (all row-level
  * rules share ONE scan).
  */
class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq(
    // (id, name, score, cat)
    (1L, "alpha", 0.5, "a"),
    (2L, null: String, 1.5, "b"),   // null name; score out of [0,1]
    (2L, "beta", 0.0, "a"),         // duplicate id
    (3L, "GAMMA7", 0.9, "zz"),      // name fails ^[a-z]+$; cat not accepted
    (4L, "delta", Double.NaN, "b"), // NaN score violates range
  ).toDF("id", "name", "score", "cat")

  test("evaluate: every rule's violations, totals and pass verdicts match hand computation") {
    val dim = Seq(1L, 2L, 4L).toDF("k") // 3 missing from dim
    val got = Expectations.evaluate(rows, Seq(
      NotNull("name"),
      InRange("score", 0.0, 1.0),
      Matches("name", "^[a-z]+$"),
      OneOf("cat", Seq("a", "b")),
      MaxNullFraction("name", 0.25),
      Unique(Seq("id")),
      ReferencedIn("id", dim, "k"),
    )).as[(String, String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("not_null", "name", 1L, 5L, false),
      ("in_range", "score", 2L, 5L, false),     // 1.5 and NaN; nulls skipped
      ("matches", "name", 1L, 5L, false),       // GAMMA7; null skipped
      ("one_of", "cat", 1L, 5L, false),         // zz
      ("max_null_fraction", "name", 1L, 5L, true), // 1/5 = 0.2 <= 0.25
      ("unique", "id", 1L, 5L, false),          // one excess row under id 2
      ("referenced_in", "id", 1L, 5L, false),   // id 3 absent from dim
    ))
  }

  test("evaluate: a clean table passes every rule; rule order is preserved") {
    val clean = Seq((1L, "aa"), (2L, "bb")).toDF("id", "name")
    val got = Expectations.evaluate(clean, Seq(
      Unique(Seq("id")), NotNull("name"), Matches("name", "^[a-z]+$")))
      .as[(String, String, Long, Long, Boolean)].collect().toSeq
    assert(got.map(_._1) == Seq("unique", "not_null", "matches"))
    assert(got.forall(r => r._3 == 0L && r._4 == 2L && r._5))
  }

  test("evaluate: all row-level rules share ONE scan (a single 1-row aggregate)") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val plan = Expectations.evaluate(docs, Seq(
      NotNull("text"), InRange("n_chars", 1, 900),
      Matches("lang", "^[a-z]{2}$"), OneOf("lang", Seq("en", "de")),
      MaxNullFraction("text", 0.1)))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1,
      s"five row rules must share one corpus scan:\n${plan.take(1200)}")
    assert(!plan.contains("Join"), s"row rules need no join:\n${plan.take(800)}")
  }

  test("InRange counts non-null values that do not cast to double as violations, never silent skips") {
    val t = Seq(("1.5", 1L), ("0.5", 2L), ("1,5", 3L), (null: String, 4L)).toDF("s", "id")
    val got = Expectations.evaluate(t, Seq(InRange("s", 0.0, 1.0)))
      .as[(String, String, Long, Long, Boolean)].head()
    // 1.5 out of range + "1,5" uncastable = 2 violations; the null skips
    assert(got == (("in_range", "s", 2L, 4L, false)))
  }

  test("evaluate: unknown columns and empty rule lists are rejected") {
    intercept[IllegalArgumentException](Expectations.evaluate(rows, Seq(NotNull("nope"))))
    intercept[IllegalArgumentException](Expectations.evaluate(rows, Seq.empty))
    intercept[IllegalArgumentException](MaxNullFraction("name", 1.5))
    intercept[IllegalArgumentException](Unique(Seq.empty))
  }

  test("kAnonymity: group sizes, risk counts and the effective k match hand computation") {
    // groups: (a,1)x3, (a,2)x2, (b,1)x1, (null,1)x2  -> k=2: one small group (b,1)
    val q = Seq(
      ("a", 1), ("a", 1), ("a", 1), ("a", 2), ("a", 2),
      ("b", 1),
      (null: String, 1), (null: String, 1),
    ).toDF("qa", "qb")
    val r2 = Expectations.kAnonymity(q, Seq("qa", "qb"), 2)
      .as[(Long, Long, Long, Long, Long, Boolean)].head()
    assert(r2 == ((8L, 4L, 1L, 1L, 1L, false)))
    // k=4: every group (3, 2, 1 and 2 rows) is under 4 — all 8 rows at risk
    val r4 = Expectations.kAnonymity(q, Seq("qa", "qb"), 4)
      .as[(Long, Long, Long, Long, Long, Boolean)].head()
    assert(r4 == ((8L, 4L, 4L, 8L, 1L, false)))
    // a table that IS k-anonymous reports so
    val ok = Expectations.kAnonymity(
      Seq(("a", 1), ("a", 1), ("a", 1)).toDF("qa", "qb"), Seq("qa", "qb"), 2)
      .as[(Long, Long, Long, Long, Long, Boolean)].head()
    assert(ok == ((3L, 1L, 0L, 0L, 3L, true)))
  }

  test("lDiversity: homogeneous groups flagged even when k-anonymous; null sensitives count zero") {
    // group (a): 4 rows but ONE sensitive value -> diversity 1
    // group (b): 3 rows, sensitives x,y,z     -> diversity 3
    // group (c): 2 rows, both null sensitive   -> diversity 0 (at risk)
    val t = Seq(
      ("a", "s1"), ("a", "s1"), ("a", "s1"), ("a", "s1"),
      ("b", "x"), ("b", "y"), ("b", "z"),
      ("c", null: String), ("c", null: String),
    ).toDF("qa", "sens")
    val r = Expectations.lDiversity(t, Seq("qa"), "sens", 2)
      .as[(Long, Long, Long, Long, Long, Boolean)].head()
    assert(r == ((9L, 3L, 2L, 6L, 0L, false)))
    // the k-anonymity view of the same table passes at k=2 — exactly the
    // homogeneity blind spot l-diversity exists for
    val ka = Expectations.kAnonymity(t, Seq("qa"), 2)
      .as[(Long, Long, Long, Long, Long, Boolean)].head()
    assert(ka._6)
    // quasi == sensitive is rejected
    intercept[IllegalArgumentException](Expectations.lDiversity(t, Seq("qa"), "qa", 2))
  }

  test("property: rule invariants hold on sampled random tables") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = for {
      id   <- Gen.choose(0L, 20L)
      name <- Gen.option(Gen.oneOf("aa", "bb", "Cc", "d7"))
      sc   <- Gen.oneOf(Gen.choose(-1.0, 2.0), Gen.const(Double.NaN))
    } yield (id, name.orNull, sc)
    val tableGen = Gen.listOfN(40, rowGen)
    (0 until 12).foreach { i =>
      val rowsS = tableGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val df = rowsS.toDF("id", "name", "score")
      val out = Expectations.evaluate(df, Seq(
        NotNull("name"), MaxNullFraction("name", 0.5),
        InRange("score", 0.0, 1.0), Matches("name", "^[a-z]+$"),
        Unique(Seq("id"))))
        .as[(String, String, Long, Long, Boolean)].collect()
      // violations never exceed the total; totals equal the row count;
      // the NotNull and MaxNullFraction counts agree; a zero-violation
      // hard rule passes and a violating one fails
      out.foreach { case (e, c, v, t, p) =>
        assert(v >= 0 && v <= t, s"$e/$c: $v of $t")
        assert(t == rowsS.length.toLong)
        if (e != "max_null_fraction") assert(p == (v == 0), s"$e: pass=$p v=$v")
      }
      val byRule = out.map(r => r._1 -> r._3).toMap
      assert(byRule("not_null") == byRule("max_null_fraction"))
      // k-anonymity bookkeeping: risk rows bounded, verdict consistent
      val ka = Expectations.kAnonymity(df, Seq("id", "name"), 3)
        .as[(Long, Long, Long, Long, Long, Boolean)].head()
      assert(ka._1 == rowsS.length.toLong && ka._4 <= ka._1 && ka._3 <= ka._2)
      assert(ka._6 == (ka._3 == 0L))
      assert(ka._5 >= 1L) // 40 rows: no empty input here
      // l-diversity risk is at least k-anonymity's at the same threshold:
      // a group smaller than l can hold at most (size) < l distinct values
      val ld = Expectations.lDiversity(df, Seq("id"), "name", 3)
        .as[(Long, Long, Long, Long, Long, Boolean)].head()
      val ka2 = Expectations.kAnonymity(df, Seq("id"), 3)
        .as[(Long, Long, Long, Long, Long, Boolean)].head()
      assert(ld._4 >= ka2._4, s"l-diversity risk ${ld._4} < k-anonymity risk ${ka2._4}")
    }
  }

  test("Profile.drift: null-rate, NDV-ratio, range-expansion and presence flags match hand computation") {
    import graft.operators.Profile
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "cat")
    // after: one null id (25% null-rate shift), cat fans out (ndv 4 -> 8
    // over two rows each... keep 8 distinct), id range extends to 9
    val after = Seq(
      (Some(1L), "a1"), (Some(2L), "b1"), (Some(9L), "c1"), (None: Option[Long], "d1"),
      (Some(3L), "a2"), (Some(4L), "b2"), (Some(2L), "c2"), (Some(3L), "d2"),
    ).toDF("id", "cat")
    val pb = Profile.profile(before, Seq("id"), Seq("cat"), exactNdv = true)
    val pa = Profile.profile(after, Seq("id"), Seq("cat"), exactNdv = true)
    val got = Profile.drift(pb, pa)
      .orderBy("col_name")
      .as[(String, String, Double, Boolean, Double, Boolean, Boolean, Boolean)]
      .collect().toSeq
    val byCol = got.map(r => r._1 -> r).toMap
    // cat: ndv 4 -> 8 = ratio 2.0 (NOT > 2.0 -> no ndv drift), no nulls
    assert(byCol("cat") == (("cat", "present", 0.0, false, 2.0, false, false, false)))
    // id: null rate 0 -> 1/8 (> 0.05), max 4 -> 9 range expansion;
    // distinct ids {1,2,3,4} -> {1,2,3,4,9} = ratio 1.25
    val id = byCol("id")
    assert(id._2 == "present" && id._4 && id._7 && id._8)
    assert(math.abs(id._3 - 0.125) < 1e-9 && math.abs(id._5 - 1.25) < 1e-9 && !id._6)
    // added/removed columns always drift
    val pa2 = Profile.profile(after.withColumnRenamed("cat", "cat2"), Seq("id"), Seq("cat2"), exactNdv = true)
    val full = Profile.drift(pb, pa2).select("col_name", "status", "drifted")
      .as[(String, String, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(full("cat") == (("removed", true)) && full("cat2") == (("added", true)))
    assert(full("id")._1 == "present")
  }
}
