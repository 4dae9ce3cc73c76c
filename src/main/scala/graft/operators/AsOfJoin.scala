package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** Scalable AS-OF join (reference semantics: relation.scala:817-880 and
  * spec/basic/join-asof.wv — for each left row pick the single matching right
  * row with the greatest right-side order key satisfying the inequality,
  * within equal equi-keys).
  *
  * Implementation: union + windowed last-non-null. Tag both sides, union into
  * one relation, sort within each equi-key partition by the order key, and
  * carry the latest right-side row forward as a STRUCT with
  * `last(col, ignoreNulls = true)` over rows-between(unboundedPreceding,
  * currentRow). Carrying one struct (not per-column) keeps rows atomic — a
  * right row with a null value column can't leak an older row's value.
  *
  * Scale: ONE shuffle on the equi-keys, no row explosion, no per-key driver
  * loop — linear at 100 TB. The naive equi-join + inequality + max_by
  * alternative multiplies every left row by all earlier right rows per key
  * (quadratic in key group size) before reducing; this stays O(n log n) in
  * the partition sort.
  */
object AsOfJoin {

  /** @param eqKeys   list of (leftCol, rightCol) equality key pairs
    * @param leftKey  left-side ordering column name
    * @param rightKey right-side ordering column name
    * @param op       inequality with right on the LHS: "<=", "<", ">=", ">"
    *                 ("<=" = standard backward as-of: latest right ≤ left)
    * @param keepUnmatched left-outer semantics (keep left rows with no match,
    *                 nulls carried). `false` = inner, the DuckDB `ASOF JOIN`
    *                 default (reference SG:543-586 gates asof on DuckDB).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      eqKeys: List[(String, String)],
      leftKey: String,
      rightKey: String,
      op: String = "<=",
      keepUnmatched: Boolean = true
  ): DataFrame = {
    val backward = op == "<=" || op == "<"
    val strict = op == "<" || op == ">"

    val lCols = left.columns.toList
    val rEq = eqKeys.map(_._2).toSet
    val rValueCols = right.columns.toList.filterNot(rEq.contains)
    // output name for each carried right column (suffix on collision)
    val outNames = rValueCols.map(c => if (lCols.contains(c)) c + "_right" else c)

    val eqNames = eqKeys.map { case (lc, _) => "__eq_" + lc }

    val rStructType = org.apache.spark.sql.types.StructType(
      rValueCols.map(c => right.schema(c).copy(name = c)))

    val leftTagged = left.select(
      eqKeys.map { case (lc, _) => F.col(lc).as("__eq_" + lc) } ++
        List(
          F.col(leftKey).as("__ord"),
          F.lit(1).as("__is_left"),
          F.struct(lCols.map(F.col): _*).as("__l"),
          F.lit(null).cast(rStructType).as("__r")
        ): _*
    )
    val lStructType = org.apache.spark.sql.types.StructType(
      lCols.map(c => left.schema(c).copy(name = c)))
    val rightTagged = right.select(
      eqKeys.map { case (lc, rc) => F.col(rc).as("__eq_" + lc) } ++
        List(
          F.col(rightKey).as("__ord"),
          F.lit(0).as("__is_left"),
          F.lit(null).cast(lStructType).as("__l"),
          F.struct(rValueCols.map(F.col): _*).as("__r")
        ): _*
    )
    val unioned = leftTagged.unionByName(rightTagged)

    // Order so the right rows that should be visible to a left row precede it:
    //   backward (<=, <): ascending __ord; at equal __ord right first for <=,
    //   left first for < (strict ⇒ equal keys not visible).
    //   forward (>=, >): descending __ord, same tie logic.
    val ordCol = if (backward) F.col("__ord").asc else F.col("__ord").desc
    val tieCol = if (strict) F.col("__is_left").desc else F.col("__is_left").asc
    val w = Window
      .partitionBy(eqNames.map(F.col): _*)
      .orderBy(ordCol, tieCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = unioned
      .withColumn("__c", F.last(F.col("__r"), ignoreNulls = true).over(w))
      .filter(F.col("__is_left") === 1)
    val matched = if (keepUnmatched) carried else carried.filter(F.col("__c").isNotNull)
    matched
      .select(
        lCols.map(c => F.col("__l." + c).as(c)) ++
          rValueCols.zip(outNames).map { case (rc, out) => F.col("__c." + rc).as(out) }: _*
      )
  }
}
