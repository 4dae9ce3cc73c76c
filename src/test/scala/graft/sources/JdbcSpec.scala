package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** JDBC source/sink against an in-process Derby database (the derby jars
  * ship with Spark for the Hive metastore, so this is classpath-free).
  * Covers: plain read through the `jdbc(...)` table function, filter
  * pushdown reaching the remote scan, the range-partitioned parallel read,
  * and the write-then-read-back path. */
class JdbcSpec extends SparkTestBase {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  override def afterAll(): Unit = {
    try java.sql.DriverManager.getConnection("jdbc:derby:memory:graftjdbc;drop=true")
    catch { case _: java.sql.SQLException => () } // drop "fails" with 08006 on success
    super.afterAll()
  }

  private lazy val seeded: Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE people (id BIGINT NOT NULL, name VARCHAR(64), score DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO people VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setLong(1, i.toLong); ps.setString(2, s"name_$i"); ps.setDouble(3, i * 1.5)
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
  }

  test("jdbc table function reads a remote table") {
    seeded
    val rows = wv(s"""
      from jdbc('$url', 'people')
      where id <= 10
      agg n = _.count, total = score.sum
    """).collect()
    assert(rows.head.getLong(0) == 10L)
    assert(math.abs(rows.head.getDouble(1) - (1 to 10).map(_ * 1.5).sum) < 1e-9)
  }

  test("filter pushdown reaches the remote JDBC scan") {
    seeded
    val df = wv(s"from jdbc('$url', 'people') where id <= 10 select id, name")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThanOrEqual(ID,10)"),
      s"pushdown missing from plan:\n$plan")
  }

  test("range-partitioned parallel read splits into bounded tasks") {
    seeded
    val df = wv(s"from jdbc('$url', 'people', 'id', 4, 1, 101)")
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100L)
  }

  test("save to 'jdbc:…' with table: sink syntax writes the database") {
    seeded
    wv(s"""
      from [[10, 'x'], [20, 'y']] as t(id, tag)
      save to '$url' with table: 'lang_sink'
    """)
    val back = wv(s"from jdbc('$url', 'lang_sink') order by id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1))).toList ==
      List((10L, "x"), (20L, "y")))
  }

  test("write then read back round-trips") {
    seeded
    val src = wv("from [[1, 'a'], [2, 'b']] as t(id, tag)")
    Jdbc.write(src, url, "written_t")
    val back = Jdbc.read(spark, url, "written_t")
      .orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1))).toList ==
      List((1L, "a"), (2L, "b")))
    // append doubles the rows
    Jdbc.write(src, url, "written_t", append = true)
    assert(Jdbc.read(spark, url, "written_t").count() == 4L)
  }
}
