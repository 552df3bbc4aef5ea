package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint audit — the generalization of the
  * reference's completeness checker (`/root/reference/src/verify_dates.py`,
  * SURVEY §2 A1) from one hard-coded audit to a constraint vocabulary a
  * pipeline can assert on any table before publishing it.
  *
  * Execution shape, designed for one pass over a 100 TB fact:
  *  - every ROW-LOCAL check (not-null, bounds, accepted values) compiles
  *    to one conditional-sum aggregate — all of them run in a SINGLE
  *    scan+aggregate however many there are;
  *  - `Unique` adds one groupBy on its key (a second scan, unavoidable:
  *    uniqueness is not row-local);
  *  - `RefIntegrity` adds one broadcast anti-join against the (small)
  *    dimension key set.
  * The report is one row per constraint: (check_name, violations, total,
  * pass) — deterministic, so the whole audit is DuckDB-oracle-checkable
  * (q135), unlike sampling-based profilers.
  */
object Constraints {

  sealed trait Check { def name: String }
  /** `col` must never be null. */
  final case class NotNull(colName: String) extends Check {
    def name = s"not_null:$colName"
  }
  /** `col` must lie in [lo, hi] (nulls count as violations). */
  final case class Bounds(colName: String, lo: Double, hi: Double) extends Check {
    def name = s"bounds:$colName"
  }
  /** `col` must be one of `allowed` (nulls count as violations). */
  final case class InSet(colName: String, allowed: Seq[String]) extends Check {
    def name = s"in_set:$colName"
  }
  /** The column tuple must be unique; violations = rows beyond the first
    * in each duplicate group. */
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique:${cols.mkString(",")}"
  }
  /** Every non-null `colName` must exist in `dimCol` of `dim` (foreign
    * key); violations = orphan rows. */
  final case class RefIntegrity(colName: String, dim: DataFrame, dimCol: String)
      extends Check {
    def name = s"ref:$colName"
  }

  private def violationExpr(c: Check): Column = c match {
    case NotNull(cn) => when(col(cn).isNull, 1L).otherwise(0L)
    case Bounds(cn, lo, hi) =>
      when(col(cn).isNull || col(cn) < lo || col(cn) > hi, 1L).otherwise(0L)
    case InSet(cn, allowed) =>
      when(col(cn).isNull || !col(cn).isin(allowed: _*), 1L).otherwise(0L)
    case _ => throw new IllegalArgumentException(s"not row-local: $c")
  }

  /** Run every check; returns (check_name, violations, total, pass)
    * ordered by check name. */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    val (rowLocal, multiRow) = checks.partition {
      case _: NotNull | _: Bounds | _: InSet => true
      case _ => false
    }

    // the row-local part computes its total in the same aggregate for free
    val rowLocalPart =
      if (rowLocal.isEmpty) None
      else {
        // one scan, one aggregate row: total + a violation sum per check…
        val aggs = count(lit(1)).as("total") +:
          rowLocal.zipWithIndex.map { case (c, i) =>
            sum(violationExpr(c)).as(s"v$i")
          }
        val one = df.agg(aggs.head, aggs.tail: _*)
        // …then unpivoted to a row per constraint
        val stackArgs = rowLocal.zipWithIndex
          .map { case (c, i) => s"'${c.name}', v$i" }.mkString(", ")
        Some(one.selectExpr(
          s"stack(${rowLocal.size}, $stackArgs) AS (check_name, violations)",
          "total"))
      }

    val multiParts = multiRow.map {
      case u @ Unique(cols) =>
        df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("n")).filter(col("n") > 1)
          .agg(coalesce(sum(col("n") - 1L), lit(0L)).as("violations"))
          .withColumn("check_name", lit(u.name))
      case r @ RefIntegrity(cn, dim, dimCol) =>
        df.select(col(cn))
          .join(broadcast(dim.select(col(dimCol)).distinct()),
            col(cn) === col(dimCol), "left_anti")
          .filter(col(cn).isNotNull)
          .agg(count(lit(1)).as("violations"))
          .withColumn("check_name", lit(r.name))
      case other => throw new IllegalArgumentException(s"unhandled: $other")
    }
    // ONE one-row count, broadcast-cross-joined onto the UNION of the
    // multi-row parts — attaching it per part would replant the count's
    // full-table scan once per Unique/RefIntegrity check
    val multiPart = multiParts
      .map(_.select(col("check_name"), col("violations")))
      .reduceOption(_ unionByName _)
      .map(_.crossJoin(broadcast(df.agg(count(lit(1)).as("total")))))

    (rowLocalPart.toSeq ++ multiPart)
      .map(_.select(col("check_name"), col("violations"), col("total")))
      .reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
      .orderBy(col("check_name"))
  }
}
