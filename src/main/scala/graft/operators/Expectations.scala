package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Declarative data-quality expectations — the Great-Expectations-style
  * contract check a pipeline runs before pointing a 100 TB job at a new
  * dataset drop (the assertion counterpart of [[Profile.profile]]'s
  * statistics; the reference validates uploads only by extension +
  * extractability, backend/ingestion.py:57-84 — a corpus-scale pipeline
  * needs column-level contracts).
  *
  * Evaluated in the MINIMUM number of passes:
  *  - every ROW-LEVEL rule ([[NotNull]], [[InRange]], [[Matches]],
  *    [[OneOf]], [[MaxNullFraction]]) compiles to one conditional
  *    aggregate inside ONE shared scan (a single 1-row `agg`, unpivoted
  *    with `stack` — the [[Profile]] device), so ten rules cost the same
  *    scan as one;
  *  - each [[Unique]] rule adds one key-grouped aggregate (its own
  *    shuffle — count-distinct semantics need the key exchange);
  *  - each [[ReferencedIn]] rule adds one anti-join count against the
  *    dimension (left to the planner/AQE to broadcast — dims are small
  *    by definition but a misdeclared corpus-sized one must not OOM the
  *    driver via a forced hint).
  *
  * Output: one row per rule — (expectation, col_name, violations, total,
  * pass) — the shape a release gate thresholds and a dashboard trends.
  * Null semantics are explicit per rule: value rules (range/regex/set)
  * SKIP nulls ([[NotNull]]/[[MaxNullFraction]] own null policy), so one
  * missing value never double-counts across rules.
  */
object Expectations {

  sealed trait Rule { def column: String }
  /** Violation per NULL value. */
  final case class NotNull(column: String) extends Rule
  /** Violation per non-null value outside [lo, hi]. NaN violates, and so
    * does a non-null value that does NOT CAST to double (a string column
    * declared numeric, locale decimals like "1,5") — a rule that silently
    * skipped uncastable values would green-light a contract it never
    * checked. Genuine nulls stay [[NotNull]]'s business.
    */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule
  /** Violation per non-null value NOT fully matching `regex`. */
  final case class Matches(column: String, regex: String) extends Rule
  /** Violation per non-null value outside the accepted set. */
  final case class OneOf(column: String, values: Seq[String]) extends Rule
  /** Violations = null count; PASSES while nulls/total <= maxFrac —
    * the tolerance form of [[NotNull]] for sparsely-populated columns.
    */
  final case class MaxNullFraction(column: String, maxFrac: Double) extends Rule {
    require(maxFrac >= 0.0 && maxFrac <= 1.0, s"maxFrac must be in [0,1]: $maxFrac")
  }
  /** Violations = rows in excess of one per distinct key (n − ndv). */
  final case class Unique(columns: Seq[String]) extends Rule {
    require(columns.nonEmpty, "Unique needs at least one column")
    def column: String = columns.mkString(",")
  }
  /** Violation per non-null value absent from `dim.dimColumn`. */
  final case class ReferencedIn(column: String, dim: DataFrame, dimColumn: String) extends Rule

  /** Evaluate `rules` against `df`. Row-level rules share one scan; see
    * the object doc for the per-rule pass budget. Output ordering is the
    * rule order (a `__i` ordinal rides along and is dropped — callers
    * sort on it implicitly via orderBy("expectation", "column") in
    * oracle settings).
    */
  def evaluate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one expectation")
    val spark = df.sparkSession
    import spark.implicits._

    def ruleName(r: Rule): String = r match {
      case _: NotNull         => "not_null"
      case _: InRange         => "in_range"
      case _: Matches         => "matches"
      case _: OneOf           => "one_of"
      case _: MaxNullFraction => "max_null_fraction"
      case _: Unique          => "unique"
      case _: ReferencedIn    => "referenced_in"
    }
    for (r <- rules) r match {
      case Unique(cs)    => cs.foreach(c => require(df.columns.contains(c), s"unknown column $c"))
      case other         => require(df.columns.contains(other.column), s"unknown column ${other.column}")
    }

    val rowRules = rules.zipWithIndex.collect {
      case (r: NotNull, i)         => (r: Rule, i)
      case (r: InRange, i)         => (r: Rule, i)
      case (r: Matches, i)         => (r: Rule, i)
      case (r: OneOf, i)           => (r: Rule, i)
      case (r: MaxNullFraction, i) => (r: Rule, i)
    }
    def violationsOf(r: Rule): Column = r match {
      case NotNull(c)           => count(when(col(c).isNull, 1))
      case InRange(c, lo, hi)   =>
        val v = col(c).try_cast("double")
        // cast-failed non-null values (try_cast null while the raw value
        // isn't) are violations, not skips — see the case-class doc
        count(when(col(c).isNotNull && (v.isNull || v < lo || v > hi || isnan(v)), 1))
      case Matches(c, re)       => count(when(col(c).isNotNull && !col(c).rlike(re), 1))
      case OneOf(c, vs)         => count(when(col(c).isNotNull && !col(c).isin(vs: _*), 1))
      case MaxNullFraction(c, _) => count(when(col(c).isNull, 1))
      case _ => throw new IllegalArgumentException(s"not a row rule: $r")
    }

    val parts = Seq.newBuilder[DataFrame]
    if (rowRules.nonEmpty) {
      val aggs = count(lit(1)).as("__total") +:
        rowRules.map { case (r, i) => violationsOf(r).as(s"__v$i") }
      val row = df.agg(aggs.head, aggs.tail: _*)
      def slit(s: String) = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
      val legs = rowRules.map { case (r, i) =>
        val passExpr = r match {
          case MaxNullFraction(_, f) => s"CAST(__v$i AS DOUBLE) <= $f * __total"
          case _                     => s"__v$i = 0"
        }
        s"$i, ${slit(ruleName(r))}, ${slit(r.column)}, __v$i, __total, $passExpr"
      }
      parts += row.select(expr(
        s"stack(${rowRules.size}, ${legs.mkString(", ")}) AS (__i, expectation, col_name, violations, total, pass)"))
    }
    for ((r, i) <- rules.zipWithIndex) r match {
      case u @ Unique(cs) =>
        parts += df
          .groupBy(cs.map(col).toIndexedSeq: _*)
          .agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as("violations"),
            coalesce(sum(col("__c")), lit(0L)).as("total"))
          .select(lit(i).as("__i"), lit(ruleName(u)).as("expectation"),
            lit(u.column).as("col_name"), col("violations"), col("total"),
            (col("violations") === 0L).as("pass"))
      case ri @ ReferencedIn(c, dim, dc) =>
        val missing = df.select(col(c)).where(col(c).isNotNull)
          .join(dim.select(col(dc).as(c)).distinct(), Seq(c), "left_anti")
          .agg(count(lit(1)).as("violations"))
        val tot = df.agg(count(lit(1)).as("total"))
        parts += missing.crossJoin(tot)
          .select(lit(i).as("__i"), lit(ruleName(ri)).as("expectation"),
            lit(c).as("col_name"), col("violations"), col("total"),
            (col("violations") === 0L).as("pass"))
      case _ => ()
    }
    parts.result().reduce(_ unionByName _)
      .orderBy("__i").drop("__i")
  }

  /** l-diversity audit — k-anonymity's complement (Machanavajjhala 2007):
    * a quasi-identifier group can be large yet still leak if every member
    * shares one SENSITIVE value (homogeneity attack). Per group, count
    * distinct non-null sensitive values; groups with fewer than `l` are
    * at risk. One (quasi ++ sensitive)-keyed aggregate folded to a
    * quasi-keyed one (both map-side combinable) + a tiny rollup —
    * (n_rows, n_groups, n_low_diversity_groups, rows_at_risk,
    * min_diversity, l_diverse). A group whose sensitive values are ALL
    * null has diversity 0 — maximally homogeneous, at risk by definition.
    */
  def lDiversity(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String, l: Int,
  ): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2: $l")
    (quasiCols :+ sensitiveCol).foreach(c =>
      require(df.columns.contains(c), s"unknown column $c"))
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol must not be a quasi-identifier")
    val q = quasiCols.map(col)
    // two-level distinct: (quasi, sensitive) partial groups collapse into
    // per-quasi distinct counts without carrying value sets through the
    // shuffle
    df.groupBy((q :+ col(sensitiveCol)).toIndexedSeq: _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(q.toIndexedSeq: _*)
      .agg(
        sum(col("__c")).as("__rows"),
        count(when(col(sensitiveCol).isNotNull, 1)).as("__div"))
      .agg(
        coalesce(sum(col("__rows")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_groups"),
        count(when(col("__div") < l, 1)).as("n_low_diversity_groups"),
        coalesce(sum(when(col("__div") < l, col("__rows"))), lit(0L)).as("rows_at_risk"),
        coalesce(min(col("__div")), lit(0L)).as("min_diversity")) // empty input: 0, not null
      .select(col("n_rows"), col("n_groups"), col("n_low_diversity_groups"),
        col("rows_at_risk"), col("min_diversity"),
        (col("n_low_diversity_groups") === 0L).as("l_diverse"))
  }

  /** k-anonymity audit over quasi-identifier columns (Sweeney 2002): any
    * row whose quasi-identifier combination is shared by fewer than `k`
    * rows is re-identifiable at that k. One key-grouped aggregate and one
    * tiny rollup — (n_rows, n_groups, n_small_groups, rows_at_risk,
    * min_group_size, k_anonymous). `min_group_size` IS the table's
    * effective k; `k_anonymous` gates releases the way the DQ suite's
    * `pass` column does. Rows with a NULL quasi-identifier form their own
    * group per null combination (the conservative reading: null patterns
    * are quasi-identifying too).
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2: $k")
    quasiCols.foreach(c => require(df.columns.contains(c), s"unknown column $c"))
    df.groupBy(quasiCols.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("__c"))
      .agg(
        coalesce(sum(col("__c")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_groups"),
        count(when(col("__c") < k, 1)).as("n_small_groups"),
        coalesce(sum(when(col("__c") < k, col("__c"))), lit(0L)).as("rows_at_risk"),
        coalesce(min(col("__c")), lit(0L)).as("min_group_size")) // empty input: 0, not null
      .select(col("n_rows"), col("n_groups"), col("n_small_groups"),
        col("rows_at_risk"), col("min_group_size"),
        (col("n_small_groups") === 0L).as("k_anonymous"))
  }
}
