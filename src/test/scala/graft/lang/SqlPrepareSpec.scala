package graft.lang

import graft.{Graft, SparkTestBase}

/** PREPARE / EXECUTE / DEALLOCATE through the SQL front-end (reference:
  * sqlPlan.scala prepared statements; Trino `USING` and DuckDB `(args)` /
  * `$n` / `$name` parameter styles). */
class SqlPrepareSpec extends SparkTestBase {

  test("prepare + execute with USING and ? parameters") {
    val rows = Graft.sqlScript(spark,
      """PREPARE q1 FROM SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) t(id, s)
         WHERE id >= ? AND id < ?;
         EXECUTE q1 USING 2, 3""", None).collect()
    assert(rows.map(_.getInt(0)).toList == List(2))
  }

  test("execute with DuckDB parenthesized args and $n positions") {
    val rows = Graft.sqlScript(spark,
      """PREPARE q2 AS SELECT * FROM (VALUES ('x', 10), ('y', 20)) t(s, v)
         WHERE v >= $2 AND s = $1;
         EXECUTE q2('y', 15)""", None).collect()
    assert(rows.map(_.getString(0)).toList == List("y"))
  }

  test("deallocate removes; executing after is an error") {
    Graft.sqlScript(spark, "PREPARE q3 AS SELECT 1 AS one; DEALLOCATE q3", None)
    intercept[IllegalArgumentException] {
      Graft.sqlScript(spark, "EXECUTE q3", None)
    }
  }
}
