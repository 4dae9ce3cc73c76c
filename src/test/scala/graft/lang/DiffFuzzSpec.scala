package graft.lang

import graft.SparkTestBase

/** Seeded differential fuzzing: randomly composed wv pipelines over the
  * testdata schema must produce IDENTICAL rows through the two independent
  * execution paths — the DataFrame lowering (Graft.run) and the wv→SQL
  * generator executed via spark.sql. Any divergence (HAVING placement,
  * null ordering, distinct-vs-dedup, join column resolution, agg rewrite)
  * fails with the offending seed + query text, which reproduces alone.
  *
  * The generator is deliberately conservative: only deterministic,
  * order-insensitive constructs (no limit/sample without total order —
  * rows are compared as sorted multisets), arithmetic kept to columns the
  * %.4f normalization absorbs.
  */
class DiffFuzzSpec extends SparkTestBase {

  private case class T(
      name: String,
      ints: Seq[String],
      doubles: Seq[String],
      strings: Seq[String])

  private val tables = Seq(
    T("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
      Seq("l_quantity", "l_extendedprice", "l_discount"),
      Seq("l_returnflag", "l_linestatus")),
    T("orders", Seq("o_orderkey", "o_custkey"), Seq("o_totalprice"),
      Seq("o_orderstatus", "o_orderpriority")),
    T("customer", Seq("c_custkey", "c_nationkey"), Seq("c_acctbal"),
      Seq("c_name", "c_mktsegment")),
    T("supplier", Seq("s_suppkey", "s_nationkey"), Seq("s_acctbal"),
      Seq("s_name")),
    T("part", Seq("p_partkey", "p_size"), Seq("p_retailprice"),
      Seq("p_name", "p_brand", "p_type")),
    T("events", Seq("event_id", "user_id"), Seq("value"),
      Seq("event_type"))
  )

  // FK joins the schema supports: (left table, right table, left col, right col)
  private val joins = Seq(
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("lineitem", "part", "l_partkey", "p_partkey"),
    ("lineitem", "supplier", "l_suppkey", "s_suppkey"),
    ("orders", "customer", "o_custkey", "c_custkey"))

  private def genQuery(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))

    val joined = rnd.nextInt(10) < 3
    val (t, extraInts, extraDoubles, extraStrings, fromClause) =
      if (joined) {
        val (lt, rt, lc, rc) = pick(joins)
        val l = tables.find(_.name == lt).get
        val r = tables.find(_.name == rt).get
        // right/full joins produce null-extended rows — the "NULL" token in
        // the multiset compare makes them deterministic across all legs
        val kind = pick(Seq("join", "join", "left join", "left join",
          "right join", "full join"))
        (l, r.ints.filterNot(_ == rc), r.doubles, r.strings,
          s"from $lt\n$kind $rt on $lc = $rc")
      } else {
        val l = pick(tables)
        (l, Nil, Nil, Nil, s"from ${l.name}")
      }
    val ints = t.ints ++ extraInts
    val doubles = t.doubles ++ extraDoubles
    val strings = t.strings ++ extraStrings

    val sb = new StringBuilder(fromClause)

    // 0-2 filters
    (0 until rnd.nextInt(3)).foreach { _ =>
      rnd.nextInt(5) match {
        case 0 => sb.append(s"\nwhere ${pick(ints)} ${pick(Seq("<", ">", "<=", ">="))} ${rnd.nextInt(2000)}")
        case 1 => sb.append(s"\nwhere ${pick(doubles)} ${pick(Seq("<", ">"))} ${rnd.nextInt(100)}.${rnd.nextInt(10)}")
        case 2 => sb.append(s"\nwhere ${pick(strings)} is not null")
        case 3 =>
          val lo = rnd.nextInt(1000)
          sb.append(s"\nwhere ${pick(ints)} between $lo and ${lo + rnd.nextInt(1000)}")
        case 4 =>
          // in-subquery → semi join; not-in → anti join (keys here are
          // non-null FKs, so SQL NOT IN and the lowered anti join agree)
          joins.find(_._1 == t.name) match {
            case Some((_, rt, lc, rc)) if !joined =>
              val not = if (rnd.nextBoolean()) "not " else ""
              sb.append(s"\nwhere $lc ${not}in {\n  from $rt\n  where $rc % ${rnd.nextInt(5) + 2} = 0\n  select $rc\n}")
            case _ =>
              sb.append(s"\nwhere ${pick(ints)} >= ${rnd.nextInt(500)}")
          }
      }
    }

    // optionally a computed column
    val added =
      if (rnd.nextBoolean()) {
        val name = s"fz_${rnd.nextInt(100)}"
        sb.append(s"\nadd $name = ${pick(ints)} % ${rnd.nextInt(7) + 2}")
        Some(name)
      } else None

    // occasionally a set-op over the same table filtered differently
    if (rnd.nextInt(10) == 0) {
      // both branches project the SAME columns of the base table, so the
      // set-op is well-typed regardless of any join above
      val op = pick(Seq("concat", "union", "intersect", "except",
        "intersect all", "except all"))
      val col = pick(t.ints)
      val sc = pick(t.strings)
      sb.append(s"\nselect $col, $sc")
      sb.append(s"\n$op {\n  from ${t.name}\n  where $col > ${rnd.nextInt(500)}")
      sb.append(s"\n  select $col, $sc\n}")
      return sb.toString()
    }
    rnd.nextInt(12) match {
      case 11 =>
        // DISTINCT-bearing aggregates: the per-dialect DISTINCT routing
        // (WvToSql.aggFnCallDistinct, r12) must be corpus-exercised, not
        // just unit-shaped — each statement either executes green in the
        // target (spark df/sql + hive legs) or throws a loud Unsupported
        // (duckdb/trino generation leg). Only forms the DataFrame lowering
        // also supports: count/sum/avg(distinct) and sorted string_agg.
        val keys = rnd.shuffle(strings).take(rnd.nextInt(2) + 1)
        val i = pick(ints); val d = pick(doubles); val s = pick(strings)
        val aggs = rnd.shuffle(Seq(
          s"nd = count(distinct $s)",
          s"sd = sum(distinct $i)",
          s"ad = avg(distinct $d)",
          s"sa = string_agg(distinct $s, '|')")).take(rnd.nextInt(2) + 2)
        sb.append(s"\ngroup by ${keys.mkString(", ")}")
        sb.append(s"\nagg n = _.count, ${aggs.mkString(", ")}")
      case 10 =>
        // lateral unnest of a split string (± ordinality): DataFrame
        // explode/posexplode vs LATERAL VIEW vs printer round-trip
        val s = pick(t.strings)
        val i2 = pick(t.ints)
        val ord = if (rnd.nextBoolean()) " with ordinality" else ""
        sb.append(s"\nselect $i2, ws = $s.split(' ')")
        sb.append(s"\ncross join unnest(ws)$ord as u(w)")
        sb.append(s"\nagg n = _.count, d = w.count_distinct")
        return sb.toString()
      case 0 =>
        // group + agg (+ optional having)
        val keys = rnd.shuffle(strings ++ added.toList).take(rnd.nextInt(2) + 1)
        val aggCol = pick(ints ++ doubles)
        val fn = pick(Seq("sum", "min", "max", "avg"))
        sb.append(s"\ngroup by ${keys.mkString(", ")}")
        sb.append(s"\nagg n = _.count, v = ${aggCol}.$fn")
        if (rnd.nextBoolean()) sb.append(s"\nwhere n > ${rnd.nextInt(5)}")
      case 1 =>
        // projection (+ optional distinct via dedup-shaped select)
        val cols = rnd.shuffle(ints ++ strings ++ added.toList).take(rnd.nextInt(3) + 1)
        val distinct = if (rnd.nextBoolean()) "select distinct" else "select"
        sb.append(s"\n$distinct ${cols.mkString(", ")}")
      case 2 =>
        // count-only reduction
        sb.append("\nagg total = _.count")
      case 3 =>
        // ranking window (rank/dense_rank give tie-stable VALUES, unlike
        // row_number) over a string partition ordered by a numeric
        val part = pick(strings)
        val ord = pick(ints ++ doubles)
        val wfn = pick(Seq("rank", "dense_rank"))
        sb.append(s"\nselect ${pick(ints)}, $part, $ord,")
        sb.append(s"\n  r = $wfn() over (partition by $part order by $ord desc)")
      case 4 =>
        // order by EVERY output column + limit (± offset): boundary ties are
        // whole-row duplicates, so the sliced multiset is deterministic
        val cols = rnd.shuffle(ints ++ strings).take(2)
        sb.append(s"\nselect ${cols.mkString(", ")}")
        sb.append(s"\norder by ${cols.mkString(", ")}")
        sb.append(s"\nlimit ${rnd.nextInt(50) + 1}")
        if (rnd.nextBoolean()) sb.append(s"\noffset ${rnd.nextInt(20)}")
      case 5 =>
        // rollup / cube / explicit grouping sets: super-aggregate rows
        // exercise the grouping-null semantics on all four paths
        val keys = rnd.shuffle(strings).take(rnd.nextInt(2) + 1)
        val aggCol = pick(ints ++ doubles)
        val groupClause = rnd.nextInt(3) match {
          case 0 => s"rollup ${keys.mkString(", ")}"
          case 1 => s"cube ${keys.mkString(", ")}"
          case _ =>
            val sets = (keys.inits.toList.map(_.mkString("(", ", ", ")")) :+ "()").distinct
            s"grouping sets (${sets.mkString(", ")})"
        }
        sb.append(s"\ngroup by $groupClause")
        sb.append(s"\nagg n = _.count, v = ${aggCol}.${pick(Seq("sum", "min", "max"))}")
      case 6 =>
        // running aggregate over the default window frame: ORDER BY a
        // possibly-tied key defaults to RANGE UNBOUNDED..CURRENT ROW, so
        // peer rows share the value and the multiset is deterministic
        val part = pick(strings)
        val ord = pick(ints)
        val v = pick(ints ++ doubles)
        sb.append(s"\nselect $part, $ord,")
        sb.append(s"\n  running = ${pick(Seq("sum", "min", "max", "count"))}($v) over (partition by $part order by $ord)")
      case 8 =>
        // pivot with explicit low-cardinality values + using agg (all four
        // legs express it: DataFrame pivot / SQL PIVOT clause / printer /
        // transpiler-skip); group columns = the remaining projection
        val (pcol, pvals) = t.name match {
          case "lineitem" => ("l_returnflag", Seq("'A'", "'N'", "'R'"))
          case "orders" => ("o_orderstatus", Seq("'O'", "'F'", "'P'"))
          case _ => ("", Nil)
        }
        if (pcol.isEmpty) sb.append("\nagg total = _.count")
        else {
          val grp = pick(t.strings.filterNot(_ == pcol) :+ t.ints.head)
          val v = pick((t.ints ++ t.doubles).filterNot(_ == grp))
          sb.append(s"\nselect $grp, $pcol, $v")
          sb.append(s"\npivot on $pcol in (${pvals.mkString(", ")}) " +
            s"using v = $v.${pick(Seq("sum", "min", "max"))}")
        }
      case 9 =>
        // unpivot two numeric measures into (metric, value) rows
        val ms = rnd.shuffle(t.ints ++ t.doubles).take(2)
        val id = pick(t.strings)
        sb.append(s"\nselect $id, ${ms.mkString(", ")}")
        sb.append(s"\nunpivot mv for metric in (${ms.mkString(", ")})")
      case 7 =>
        // scalar stdlib methods: string + numeric chains through the
        // lowering's method table vs the SQL generator's function mapping
        val s = pick(strings); val i = pick(ints)
        sb.append(s"\nselect $s, $i,")
        sb.append(s"\n  u = $s.${pick(Seq("upper", "lower", "trim", "reverse"))}(),")
        sb.append(s"\n  ln = $s.length(),")
        sb.append(s"\n  m = ($i % ${rnd.nextInt(7) + 2}).abs()")
    }
    sb.toString()
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(_.toSeq.map {
      case null => "NULL"
      case d: java.lang.Double => f"$d%.4f"
      case d: java.math.BigDecimal => f"${d.doubleValue}%.4f"
      case f: java.lang.Float => f"$f%.4f"
      case v => String.valueOf(v)
    }).sortBy(_.mkString("|"))

  test("300 random pipelines: DataFrame lowering == generated SQL execution") {
    val dir = "/root/testdata/sf0.001"
    Seq("lineitem", "orders", "customer", "supplier", "part", "events").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    var ok = 0
    var transpiled = 0
    (1 to 300).foreach { seed =>
      val q = genQuery(seed)
      try {
        val viaDf = rowsOf(graft.Graft.run(spark, q,
          t => spark.read.parquet(s"$dir/$t.parquet")))
        val sql = WvToSql.generate(q)
        val viaSql = rowsOf(spark.sql(sql))
        // third leg: the canonical printer's output must re-parse and
        // produce the same rows (print→parse→run identity)
        val printed = WvPrinter.print(Parser.parseStatements(q))
        val viaPrinted = rowsOf(graft.Graft.run(spark, printed,
          t => spark.read.parquet(s"$dir/$t.parquet")))
        // fourth leg: the SQL→wv transpiler over the generated SQL must
        // produce a query with the same rows (SQL migration-path identity).
        // Constructs the transpiler doesn't cover yet are skipped — but a
        // transpile that SUCCEEDS and then diverges is a failure.
        // catch guards ONLY the transpile; a transpile that succeeds but
        // whose output then crashes at runtime propagates as a fuzz failure
        val backOpt =
          try Some(SqlToWvlet.transpile(sql, spark))
          catch { case _: Throwable => None }
        val viaTranspiled = backOpt.map { back =>
          transpiled += 1
          rowsOf(graft.Graft.run(spark, back,
            t => spark.read.parquet(s"$dir/$t.parquet")))
        }
        // fifth leg: the HIVE dialect target — its rewrites (FILTER→CASE,
        // pivot→conditional agg, function renames) must be semantics-
        // preserving; Spark executes HiveQL-shaped text, so every random
        // shape the spark target supports gets the hive text executed too.
        // An Unsupported throw for hive on a spark-supported shape is a
        // dialect-coverage failure, not a skip.
        val hiveSql = WvToSql.generate(q, WvToSql.Target.Hive)
        val viaHive = rowsOf(spark.sql(hiveSql))
        // sixth leg (generation-robustness): duckdb/trino texts can't
        // execute here, but generation must either succeed or throw a
        // deliberate Unsupported — any other exception is a generator crash
        Seq(WvToSql.Target.DuckDb, WvToSql.Target.Trino).foreach { t =>
          try WvToSql.generate(q, t)
          catch { case _: WvToSql.Unsupported => () }
        }
        if (viaDf == viaSql && viaDf == viaPrinted && viaDf == viaHive &&
            viaTranspiled.forall(_ == viaDf)) ok += 1
        else if (viaDf != viaSql)
          failures += s"seed=$seed rows diverge (df=${viaDf.length}, sql=${viaSql.length}):\n$q"
        else if (viaDf != viaHive)
          failures += s"seed=$seed hive-dialect diverges (df=${viaDf.length}, hive=${viaHive.length}):\n$q\n--- hive:\n$hiveSql"
        else if (viaDf != viaPrinted)
          failures += s"seed=$seed printer round-trip diverges (df=${viaDf.length}, printed=${viaPrinted.length}):\n$q\n--- printed:\n$printed"
        else
          failures += s"seed=$seed transpiler round-trip diverges (df=${viaDf.length}, transpiled=${viaTranspiled.get.length}):\n$q\n--- sql:\n$sql"
      } catch {
        case e: Throwable =>
          failures += s"seed=$seed ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}\n$q"
      }
    }
    assert(failures.isEmpty,
      s"${failures.length} of 300 diverged; first 3:\n${failures.take(3).mkString("\n---\n")}")
    info(s"$ok/300 random pipelines agree; $transpiled/300 also covered by the SQL transpiler leg")
  }

  // -------------------------------------------------------------------------
  // r13 verdict task 5: the r13/r14 table-function surfaces
  // (split_by_cluster family + semantic decontamination) fuzz-gated the
  // same way the DISTINCT routing was (case 11): random shapes through the
  // lowering, the printer round-trip, and every dialect generator.
  // -------------------------------------------------------------------------

  private def genPipelineOp(seed: Int): String = {
    val rnd = new scala.util.Random(1000 + seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    def d2(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val frac = d2((rnd.nextInt(8) + 1) * 0.1 + 0.05) // 0.15..0.85
    val jthr = d2(0.1 + rnd.nextInt(8) * 0.1)        // 0.10..0.80
    val cthr = d2(pick(Seq(0.2, 0.35, 0.5, 0.8, 0.95)))
    rnd.nextInt(8) match {
      case 7 =>
        val cut = rnd.nextInt(40) + 3
        s"""model trainset = {
           |  from documents
           |  where doc_id >= $cut
           |}
           |model evalset = {
           |  from documents
           |  where doc_id < $cut
           |}
           |from contamination_report('trainset', 'evalset', 'doc_id', 'text', ${rnd.nextInt(4) + 2})
           |order by doc_id""".stripMargin
      case 5 =>
        s"""from select_token_budget('documents', 'doc_id', 'text', ${rnd.nextInt(2000) + 50})
           |select doc_id, n_tokens, cum_tokens
           |order by doc_id""".stripMargin
      case 6 =>
        s"""from perplexity_score('documents', 'doc_id', 'text')
           |${pick(Seq("order by doc_id",
             "where n_tokens > " + rnd.nextInt(50) + "\norder by doc_id",
             "agg n = _.count, worst = avg_nll.max"))}""".stripMargin
      case 0 =>
        val thrArg = if (rnd.nextBoolean()) s", $jthr" else ""
        s"""from split_by_cluster('documents', 'doc_id', 'text', $frac$thrArg)
           |${pick(Seq(
             "select doc_id, split\norder by doc_id",
             "group by split\nagg n = _.count\norder by split",
             "where split = 'train'\nselect doc_id\norder by doc_id"))}""".stripMargin
      case 1 =>
        val thrArg = if (rnd.nextBoolean()) s", $jthr" else ""
        s"""from split_by_cluster_stats('documents', 'doc_id', 'text', $frac$thrArg)
           |${pick(Seq("select n_docs, n_clusters, max_cluster_size, frac_delta",
             "select n_docs, train_frac, target_frac"))}""".stripMargin
      case 2 =>
        val pairs = (0 until rnd.nextInt(4) + 2).map { _ =>
          val a = rnd.nextInt(60); s"[$a, ${a + 1 + rnd.nextInt(20)}]"
        }.mkString(",\n    ")
        val (fn, tail) =
          if (rnd.nextBoolean())
            ("split_by_cluster_pairs", "select doc_id, split\norder by doc_id")
          else
            ("split_by_cluster_pairs_stats", "select n_docs, n_clusters, max_cluster_size")
        s"""model fuzz_pairs = {
           |  from [
           |    $pairs,
           |  ] as p(id_a, id_b)
           |}
           |from $fn('documents', 'doc_id', 'fuzz_pairs', $frac)
           |$tail""".stripMargin
      case 3 =>
        val m = rnd.nextInt(4) + 3
        val nlArg = if (rnd.nextBoolean()) s", ${rnd.nextInt(60) + 1}" else ""
        s"""model ev = {
           |  from embeddings
           |  where vec_id % $m = 0
           |}
           |model cv = {
           |  from embeddings
           |  where vec_id % $m != 0
           |}
           |from contaminated_vecs('cv', 'ev', 'vec_id', 'embedding', $cthr$nlArg)
           |${pick(Seq("select vec_id, contaminated_matches, max_cos_sim\norder by vec_id",
             "agg n = _.count"))}""".stripMargin
      case _ =>
        val m = rnd.nextInt(4) + 3
        s"""model ev = {
           |  from embeddings
           |  where vec_id % $m = 0
           |}
           |model cv = {
           |  from embeddings
           |  where vec_id % $m != 0
           |}
           |from decontaminate_semantic('cv', 'ev', 'vec_id', 'embedding', $cthr)
           |select vec_id, label
           |order by vec_id""".stripMargin
    }
  }

  test("300 pipeline-operator shapes: lowering + printer round-trip + dialect refusals") {
    val dir = "/root/testdata/sf0.001"
    def run(text: String) = graft.Graft.run(spark, text,
      t => spark.read.parquet(s"$dir/$t.parquet"))
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    var executed = 0
    (1 to 300).foreach { seed =>
      val q = genPipelineOp(seed)
      try {
        // leg 1: the DataFrame lowering accepts the shape (schema resolved)
        val df = run(q)
        assert(df.schema.fields.nonEmpty)
        // leg 2: printer round-trip — the canonical text re-parses and
        // lowers to the SAME schema; every 10th seed also executes both
        // and compares rows (the ops are eager/heavy, full execution of
        // all 300 would dominate the suite for no added coverage)
        val printed = WvPrinter.print(Parser.parseStatements(q))
        val df2 = run(printed)
        if (df2.schema.map(f => (f.name, f.dataType)) != df.schema.map(f => (f.name, f.dataType)))
          failures += s"seed=$seed printed schema diverges:\n$q\n--- printed:\n$printed"
        else if (seed % 10 == 0) {
          executed += 1
          if (rowsOf(df) != rowsOf(df2))
            failures += s"seed=$seed printed rows diverge:\n$q\n--- printed:\n$printed"
        }
        // leg 3: every dialect generator either emits SQL or refuses with a
        // deliberate Unsupported (these table functions have no SQL
        // spelling — a crash or silent wrong SQL is the failure mode)
        Seq(WvToSql.Target.Spark, WvToSql.Target.DuckDb,
            WvToSql.Target.Trino, WvToSql.Target.Hive).foreach { t =>
          try WvToSql.generate(q, t)
          catch { case _: WvToSql.Unsupported => () }
        }
      } catch {
        case e: Throwable =>
          failures += s"seed=$seed ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}\n$q"
      }
    }
    assert(failures.isEmpty,
      s"${failures.length} of 300 failed; first 3:\n${failures.take(3).mkString("\n---\n")}")
    info(s"300/300 pipeline-operator shapes pass; $executed also row-compared through the printer leg")
  }
}
