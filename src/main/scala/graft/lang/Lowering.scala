package graft.lang

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._
import scala.collection.mutable

final class LoweringException(msg: String) extends Exception(msg)

/** Lowers a Graft AST onto `DataFrame`/`Column` trees.
  *
  * Design notes (SURVEY.md §7 decision (b)): we build declarative DataFrame
  * plans and let Catalyst do predicate pushdown, column pruning, join
  * selection and AQE. Schema-aware operators (exclude/rename/shift, the
  * bare-`group by` "grouped columns" semantics, dot-aggregation) are resolved
  * here against the child DataFrame's schema — playing the role of the
  * reference's typer (reference: analyzer/AggregationResolver.scala,
  * typer/Typer.scala) without a separate static pass.
  */
object Lowering {

  /** Every native table function this lowering dispatches in relation
    * position (the `ModelRef` natives), in ONE place. The LSP completion
    * list and the playground derive from this constant, and
    * TableFunctionRegistrySpec greps this file's dispatch cases
    * (`name.toLowerCase == "…"`) to assert the constant and the dispatch
    * can never drift — the completion list went stale by hand-maintenance
    * twice in r13/r14. Add a dispatch case ⇒ the spec forces the name in
    * here ⇒ LSP + playground pick it up structurally. */
  val nativeTableFunctions: Seq[String] = Seq(
    "ann_int8_index", "ann_int8_index_append", "ann_lsh_postings",
    "ann_pq_index", "ann_pq_index_append",
    "bm25_index", "bm25_index_append", "bm25_topk", "bm25_topk_index",
    "bpe_count", "bpe_count_merges", "bpe_encode", "bpe_stats", "bpe_train", "build_vocab",
    "contaminated_docs", "contaminated_vecs", "contamination_report",
    "contamination_report_semantic",
    "decode_audio", "decode_images", "decode_video",
    "decontaminate", "decontaminate_semantic",
    "dedup_bloom", "dedup_bloom_against", "dedup_bloom_against_index",
    "dedup_bloom_index", "dedup_bloom_index_append",
    "dedup_incremental", "dedup_incremental_pairs",
    "dedup_phash", "dedup_phash_against", "dedup_semantic",
    "dedup_spans", "dsir_sample", "dsir_weight", "duckdb_functions", "each_top_k", "jdbc",
    "keywords_tfidf",
    "minhash_index", "minhash_index_append",
    "mix_by_temperature", "pack_sequences", "parquet_metadata",
    "perplexity_score", "perplexity_score_bigram", "prototypicality_score",
    "quality_classifier_score",
    "range", "resize_images",
    "select_token_budget", "select_token_budget_by",
    "similarity_topk",
    "split_by_cluster", "split_by_cluster_pairs",
    "split_by_cluster_pairs_stats", "split_by_cluster_stats",
    "token_stats", "top_ngrams", "vocab_profile", "weighted_mix",
    "wv_schemas", "wv_tables"
  )

  /** Industry-standard n-gram presets for the decontamination family, so
    * users don't re-derive the conventions: 'gpt3' = 13-gram overlap
    * (Brown et al. 2020 appendix C — the GPT-3 eval-decontamination
    * n-gram), 'palm' = 8-gram overlap (Chowdhery et al. 2022's
    * contamination analysis). Accepted anywhere the family takes n
    * (contaminated_docs / decontaminate / contamination_report). */
  val contaminationPresets: Map[String, Int] = Map("gpt3" -> 13, "palm" -> 8)

  private def contaminationN(name: String, v: Any): Int = v match {
    case n: Long if n >= 1 => n.toInt
    case s: String => contaminationPresets.getOrElse(s.toLowerCase,
      throw new LoweringException(
        s"$name: unknown n-gram preset '$s' — expected " +
          contaminationPresets.toSeq.sortBy(_._1)
            .map { case (k, n) => s"'$k' (= $n)" }.mkString(", ") +
          " or a positive integer n"))
    case other => throw new LoweringException(
      s"$name: n must be a positive integer literal or a preset " +
        s"('gpt3' = 13, 'palm' = 8), got '$other'")
  }

  /** ann_pq_index side-effecting write + 1-row summary: path, row count of
    * the written index, and the quantizer shape. Analysis-only contexts
    * (LSP schema probes, compile-only) get the summary SCHEMA with no rows
    * — lowering a script for hover/completion must not write to the
    * user-supplied path as a planning side effect (ADVICE r15). */
  private def pqIndexWriteSummary(ctx: Context, corpus: String, idCol: String,
      vecCol: String, path: String, subspaces: Int, ksub: Int,
      trained: Boolean,
      trainSample: Int = graft.operators.Similarity.PqTrainSampleDefault): DataFrame = {
    val s = ctx.spark
    import s.implicits._
    if (ctx.analysisOnly)
      return Seq.empty[(String, Long, Int, Int)].toDF("path", "rows", "subspaces", "ksub")
    graft.operators.Similarity.writePqIndex(
      lower(TableRef(corpus), ctx), idCol, vecCol, path, subspaces, ksub,
      trained = trained, trainSample = trainSample)
    val n = ctx.spark.read.parquet(path).count()
    Seq((path, n, subspaces, ksub)).toDF("path", "rows", "subspaces", "ksub")
  }

  final case class Context(
      spark: SparkSession,
      tableResolver: String => DataFrame,
      basePath: String = "",
      models: mutable.Map[String, ModelDef] = mutable.Map.empty,
      vals: mutable.Map[String, Expr] = mutable.Map.empty,
      tests: mutable.ListBuffer[(DataFrame, Expr)] = mutable.ListBuffer.empty,
      debugs: mutable.ListBuffer[DataFrame] = mutable.ListBuffer.empty,
      funcs: mutable.Map[String, FuncDef] = mutable.Map.empty,
      partials: mutable.Map[String, PartialDef] = mutable.Map.empty,
      params: Seq[Any] = Nil,
      flows: mutable.Map[String, FlowDefStmt] = mutable.Map.empty,
      /** name-as-written → canonical table identifier (type bindings). */
      typeBindings: mutable.Map[String, String] = mutable.Map.empty,
      /** type member-def name → (body, dialect) — sql-template methods from
        * `type … in <dialect>` blocks; portable dialects win (see
        * registerTypeMembers). */
      typeMemberDefs: mutable.Map[String, (Expr, String)] = mutable.Map.empty,
      /** subscribe() sites seen while lowering: (watermark column,
        * raw params) — metadata for an incremental runner
        * (streaming/Subscribe.scala drives the actual streaming plan). */
      subscriptions: mutable.ListBuffer[(Option[String], Map[String, String])] =
        mutable.ListBuffer.empty,
      /** `use <schema>` state: unqualified table names retry with this
        * prefix (reference: lazy catalog — validation happens at table
        * resolution, not at the use statement). */
      currentSchema: mutable.Map[String, String] = mutable.Map.empty,
      /** Streaming substitution: when set, a SubscribeRel lowers to THIS
        * (already watermarked/deduped) streaming DataFrame instead of the
        * batch full-refresh plan — the hook [[lowerStreamingAgg]] uses to
        * re-lower a subscription query's own operators onto a readStream
        * source. */
      streamingSub: Option[DataFrame] = None,
      /** Raw-rows mode for a sessionized subscription: set by the
        * group-by-over-session lowering so the SubscribeRel keeps the raw
        * subscribed rows (dedup applied, NO session collapse) — session
        * bounds are then injected at the aggregation site, AFTER any
        * intervening filters, matching the streaming session-window plan
        * which also sessionizes the filtered stream. */
      sessionRaw: Boolean = false,
      /** `-> Flow` jump targets requested in this context, keyed by the
        * stage that requested them (None when requested outside a flow
        * stage); FlowRunner triggers each as a new run AFTER the current
        * flow completes and only if the jumping stage SUCCEEDED — a stage
        * whose body lowers but then fails during materialization must not
        * fire its jump (reference FlowExecutor: a jump transfers control
        * only, bounded by maxJumpDepth against cycles). */
      jumps: mutable.ListBuffer[(Option[String], String)] = mutable.ListBuffer.empty,
      /** Name of the flow stage currently lowering in this context, set by
        * FlowRunner so jump requests can be attributed to their stage. */
      stageName: Option[String] = None,
      /** Analysis-only lowering (LSP schema probes, compile-only API,
        * playground validation): natives whose LOWERING has a side effect
        * (ann_pq_index writes parquet) must return a schema-equivalent
        * frame instead of executing the effect (ADVICE r15). */
      analysisOnly: Boolean = false
  )

  /** Lowering result: either a plain DataFrame or a "grouped" relation —
    * the state after a bare `group by`, where subsequent `where` clauses are
    * HAVING predicates and projections happen in aggregation mode
    * (reference semantics: AggregationType, DataType.scala:298-317). */
  private sealed trait LRes
  private final case class Plain(df: DataFrame) extends LRes
  private final case class Grouped(
      df: DataFrame,
      keys: List[SelectItem],
      havings: List[Expr],
      style: GroupingStyle,
      /** `pivot on col in (…)` awaiting its group-by/agg (pivot-order.wv
        * shape): (pivot column, pivot values). */
      pivot: Option[(String, List[Any])] = None
  ) extends LRes

  def lowerStatements(stmts: List[Statement], ctx: Context): Option[DataFrame] = {
    var last: Option[DataFrame] = None
    stmts.foreach {
      case m: ModelDef => ctx.models(m.name) = m
      case ValDef(name, e) =>
        // vals evaluate ONCE at declaration (reference semantics: a val of
        // ulid_string is one id, not one per reference). Constants fold;
        // anything else is evaluated driver-side over a 1-row plan.
        ctx.vals(name) =
          if (constValue(e).isDefined) e
          else
            try {
              val v = ctx.spark.range(1)
                .select(expr(e, ExprCtx(ctx, aggMode = false)).as("v"))
                .collect().head.get(0)
              v match {
                case null => NullLit()
                case b: Boolean => BoolLit(b)
                case n: Long => LongLit(n)
                case i: Int => LongLit(i.toLong)
                case i: Short => LongLit(i.toLong)
                case i: Byte => LongLit(i.toLong)
                case d: Double => DoubleLit(d)
                case f: Float => DoubleLit(f.toDouble)
                case s: String => StringLit(s)
                case d: java.math.BigDecimal => DecimalLit(BigDecimal(d))
                case arr: scala.collection.Seq[_] =>
                  // array-valued val (e.g. val ks = split(...)): keep it an
                  // array literal so `in(ks)` / subscripts stay typed
                  ArrayLit(arr.toList.map {
                    case null => NullLit()
                    case b: Boolean => BoolLit(b)
                    case n: Long => LongLit(n)
                    case i: Int => LongLit(i.toLong)
                    case d: Double => DoubleLit(d)
                    case s: String => StringLit(s)
                    case other => StringLit(String.valueOf(other))
                  })
                // dates/timestamps render as their ISO text — comparisons
                // against date/timestamp columns re-cast on use
                case d: java.sql.Date => StringLit(d.toString)
                case t: java.sql.Timestamp => StringLit(t.toString)
                case other => throw new LoweringException(
                  s"val result type ${other.getClass.getSimpleName} cannot be re-bound as a literal")
              }
            } catch { case _: Throwable => e } // fall back to substitution
      case f: FuncDef => ctx.funcs(f.name.toLowerCase) = f
      case p: PartialDef => ctx.partials(p.name.toLowerCase) = p
      case fl: FlowDefStmt =>
        // definition-time validation: merge fan-ins and state gates must
        // reference defined stages (reference: spec/neg
        // flow-merge-undefined-stage.wv, flow-trigger-undefined-stage.wv)
        val stageNames = fl.stages.map(_.name).toSet
        def gateNames(g: GateExpr): List[String] = g match {
          case GateAtom(s, _) => List(s)
          case GateAnd(l, r) => gateNames(l) ++ gateNames(r)
          case GateOr(l, r) => gateNames(l) ++ gateNames(r)
        }
        fl.stages.foreach { sp =>
          val refs = sp.body.left.getOrElse(Nil) ++ sp.gate.toList.flatMap(gateNames)
          refs.filterNot(stageNames.contains).foreach { missing =>
            throw new LoweringException(
              s"flow ${fl.name}: stage ${sp.name} references undefined stage '$missing'")
          }
        }
        ctx.flows(fl.name) = fl // declaration only
      case QueryStatement(rel) if !rel.isInstanceOf[DeleteRel] =>
        last = Some(lower(rel, ctx))
      case SaveTo(rel, target, append, parts, options) if target.startsWith("jdbc:") =>
        // database sink: `save to 'jdbc:<url>' with table: 'name'` (+ any
        // driver options passed through) — the write side of the connector
        // surface (sources/Jdbc; reference DBConnector shipped INSERTs, here
        // Spark's JDBC writer batches them per partition in parallel)
        val table = options.collectFirst {
          case ("table", v) => v
          case ("dbtable", v) => v
        }.getOrElse(throw new LoweringException(
          "jdbc save target needs a table: `save to 'jdbc:…' with table: 'name'`"))
        val passthrough = options.filterNot {
          case (k, _) => k == "table" || k == "dbtable"
        }.toMap
        val df = lower(rel, ctx)
        graft.sources.Jdbc.write(df, target, table, append, passthrough)
        last = Some(df)
      case SaveTo(rel, target, append, parts, options) =>
        val df = lower(rel, ctx)
        val mode = if (append) "append" else "overwrite"
        var w = df.write.mode(mode)
        if (parts.nonEmpty) w = w.partitionBy(parts: _*)
        // bucketed_on/bucket_count (reference td-trino/create-table-with.wv)
        // → Spark bucketBy: hash-bucketed managed tables let later equi-joins
        // and aggregations on the bucket key skip the shuffle entirely
        val bucketCols = options.collectFirst {
          case ("bucketed_on", v) => v.split(',').map(_.trim).filter(_.nonEmpty)
        }.getOrElse(Array.empty[String])
        val bucketCount = options.collectFirst {
          case ("bucket_count", v) => v.replace("_", "").toInt
        }.getOrElse(8)
        // (bucketBy is a table-catalog feature; Spark's path writer rejects
        // it, so a bucketed save to a raw path ignores the bucketing spec)
        if (bucketCols.nonEmpty && !isPathTarget(target))
          w = w.bucketBy(bucketCount, bucketCols.head, bucketCols.tail: _*)
        // writer options (`with compression: 'zstd'`): compression maps to
        // the parquet codec; engine-specific knobs (row_group_size) pass
        // through and are ignored by datasources that lack them
        options.foreach {
          case ("bucketed_on", _) | ("bucket_count", _) => ()
          case (k, v) => w = w.option(k, v)
        }
        if (isPathTarget(target)) {
          val path = resolveTargetPath(target, ctx)
          writeByExtension(w, target, path)
        } else saveAsTableResilient(w, target, append, ctx)
        last = Some(df)
      case QueryStatement(DeleteRel(rel0)) =>
        // terminal `delete` pipe: the filtered scan names the rows to remove
        var r = rel0
        val conds = mutable.ListBuffer.empty[Expr]
        var unwrap = true
        while (unwrap) r match {
          case Filter(c, cond) => conds ++= splitConjuncts(cond); r = c
          case BracedRelation(c) => r = c
          case _ => unwrap = false
        }
        r match {
          case TableRef(t) =>
            val df = readTarget(t, ctx)
            val keep =
              if (conds.isEmpty) df.limit(0) // bare delete = remove all rows
              else {
                val condCol = expr(conds.reduceLeft(BinaryOp("and", _, _)),
                  ExprCtx(ctx, aggMode = false, dfOpt = Some(df)))
                df.filter(!F.coalesce(condCol, F.lit(false)))
              }
            overwriteTarget(t, keep, ctx)
          case _ =>
            throw new LoweringException(
              "delete must terminate a (filtered) table scan")
        }
      case AlterTableStmt(table, ifExists, op) =>
        val isPath = isPathTarget(table)
        val exists =
          if (isPath) new java.io.File(resolveTargetPath(table, ctx)).exists()
          else ctx.spark.catalog.tableExists(table)
        if (!exists && ifExists) () // `if exists` on a missing target: no-op
        else op match {
          // catalog-level operations → Spark DDL for catalog tables; a
          // PATH target would crash Spark's DDL parser on the slash, so
          // rename maps to a filesystem move and properties (which a bare
          // parquet directory cannot carry) error cleanly
          case RenameTableTo(n) =>
            if (isPath) {
              val from = new java.io.File(resolveTargetPath(table, ctx))
              val to =
                if (isPathTarget(n)) new java.io.File(resolveTargetPath(n, ctx))
                else new java.io.File(from.getParentFile, n)
              if (!from.renameTo(to))
                throw new LoweringException(
                  s"cannot rename '$from' to '$to' (target exists or filesystem refused)")
            } else ctx.spark.sql(s"ALTER TABLE $table RENAME TO $n").collect()
          case SetPropertiesOp(props) =>
            if (isPath)
              throw new LoweringException(
                s"'$table' is a file path — bare parquet has no table properties to set")
            val kv = props.map { case (k, v) => s"'$k' = '$v'" }.mkString(", ")
            ctx.spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES ($kv)").collect()
          case AddColumnOp(c, t, ifNotExists) =>
            val df = readTarget(table, ctx)
            if (!(ifNotExists && df.columns.exists(_.equalsIgnoreCase(c)))) {
              if (isPath)
                // a parquet path has no catalog — materialize the column
                overwriteTarget(table, df.withColumn(c, F.lit(null).cast(t)), ctx)
              else ctx.spark.sql(s"ALTER TABLE $table ADD COLUMNS ($c $t)").collect()
            }
          // column-shape operations on plain parquet are read-transform-
          // overwrite rewrites (same policy and caveats as delete/update:
          // inherent to a format without a copy-on-write metadata layer)
          case DropColumnOp(c, ie) =>
            val df = readTarget(table, ctx)
            if (df.columns.exists(_.equalsIgnoreCase(c)))
              overwriteTarget(table, df.drop(c), ctx)
            else if (!ie)
              throw new LoweringException(s"column $c does not exist in $table")
          case RenameColumnOp(o, n) =>
            overwriteTarget(table, readTarget(table, ctx).withColumnRenamed(o, n), ctx)
          case SetColumnTypeOp(c, t) =>
            val df = readTarget(table, ctx)
            overwriteTarget(table, df.withColumn(c, F.col(c).cast(t)), ctx)
        }
      case DeleteStmt(target, cond) =>
        // DELETE WHERE cond: keep rows where cond is false or null (SQL
        // semantics). Plain parquet has no copy-on-write layer (that is
        // Delta/Iceberg territory at 100 TB) — materialize the survivors via
        // localCheckpoint to break lineage from the files being overwritten,
        // then rewrite in place (reference Delete, update.scala:57, delegates
        // to the target engine the same way).
        if (!prunedRewrite(target, cond, ctx,
            (df, c) => df.filter(!F.coalesce(c, F.lit(false))))) {
          val df = readTarget(target, ctx)
          val condCol = expr(cond, ExprCtx(ctx, aggMode = false, dfOpt = Some(df)))
          val keep = df.filter(!F.coalesce(condCol, F.lit(false)))
          overwriteTarget(target, keep, ctx)
        }
      case TruncateStmt(target) =>
        val df = readTarget(target, ctx)
        overwriteTarget(target, df.limit(0), ctx)
      case ExecuteStmt(sql) => ctx.spark.sql(sql).collect()
      case UseStmt(name) =>
        // schema switch: recorded for table resolution (unqualified names
        // retry with this prefix); validation is lazy like the reference's
        // LazyCatalog — spec/basic/use-schema.wv uses schemas that only
        // exist at query time. Known Spark databases also switch for real.
        ctx.currentSchema("schema") = name.split('.').last
        try ctx.spark.sql(s"USE ${name.split('.').last}").collect()
        catch { case _: Throwable => () }
      case UpdateStmt(target, sets, cond) =>
        // UPDATE SET as read-modify-write: each set column becomes
        // when(cond, newExpr).otherwise(old); rows not matching keep values
        def applySets(df: DataFrame, condCol: Option[Column]): DataFrame = {
          val ec = ExprCtx(ctx, aggMode = false, dfOpt = Some(df))
          var out = df
          sets.foreach { case (c, e) =>
            val nv = expr(e, ec)
            out = out.withColumn(c, condCol match {
              case Some(p) => F.when(p, nv).otherwise(F.col(c))
              case None => nv
            })
          }
          out
        }
        val pruned = cond.exists(c0 => prunedRewrite(target, c0, ctx,
          (df, c) => applySets(df, Some(F.coalesce(c, F.lit(false)))),
          mutatedCols = sets.map(_._1).toSet))
        if (!pruned) {
          val df = readTarget(target, ctx)
          val condCol = cond.map(c =>
            F.coalesce(expr(c, ExprCtx(ctx, aggMode = false, dfOpt = Some(df))), F.lit(false)))
          overwriteTarget(target, applySets(df, condCol), ctx)
        }
      case PackageDecl(_) | ImportStmt(_) => () // scoping is lazy here
      case TypeDefStmt(name, location, _, defs, _) =>
        // schema-bound table type: remap bare/qualified references onto the
        // bound table identifier (fields are declarative — schemas resolve
        // lazily from the data itself). Dialect variants (`in trino`,
        // `in duckdb`) carry member defs, not a catalog binding.
        val dialect = location.getOrElse("")
        val isDialect = dialect == "trino" || dialect == "duckdb" || dialect == "hive"
        if (!isDialect) location.foreach { loc =>
          val parts = loc.split('.')
          val schema = parts.last
          val canonical =
            if (schema == "main" || schema == "default") name else s"$schema.$name"
          ctx.typeBindings(name) = canonical
          ctx.typeBindings(s"$loc.$name") = canonical
          ctx.typeBindings(s"$schema.$name") = canonical
        }
        // member defs: portable bodies win over engine-specific ones —
        // Spark cannot run trino's td_* UDF templates, duckdb variants are
        // the deliberate portable stubs (reference cdp_types.wv pattern)
        def rank(d: String): Int = d match {
          case "" | "duckdb" => 2
          case _ => 1
        }
        defs.foreach { case (dn, body) =>
          val key = dn.toLowerCase
          val keep = ctx.typeMemberDefs.get(key).forall { case (_, d) =>
            rank(dialect) >= rank(d)
          }
          if (keep) ctx.typeMemberDefs(key) = (body, dialect)
        }
      case MergeInto(target, srcRel, keys, matchedDelete, notMatchedInsert) =>
        // upsert as a join rewrite (no copy-on-write table format available):
        //   update-or-insert: (target anti-join source on keys) ∪ source
        //   matched-delete:   (target anti-join source) ∪ (source anti-join target)
        //   update-only (no insert clause): (target anti source) ∪ (source semi target)
        // One shuffle per anti/semi-join on the merge keys; the union is free.
        val t = readTarget(target, ctx)
        val s0 = lower(srcRel, ctx)
        val missing = t.columns.filterNot(c => s0.columns.exists(_.equalsIgnoreCase(c)))
        if (missing.nonEmpty)
          throw new LoweringException(
            s"merge source is missing target columns: ${missing.mkString(", ")}")
        val sAligned = s0.select(t.columns.map(F.col).toSeq: _*)
        // SQL MERGE semantics: multiple source rows matching one target row
        // is an error — the guard rides the merged plan itself (a window
        // count over the merge keys + raise_error grafted onto EVERY key
        // column) instead of an eager count/count-distinct job at
        // lowering time: `merge into` is ONE job, and the window's shuffle
        // on the merge keys is the same partitioning the joins below need,
        // so AQE reuses the exchange rather than adding one. All key
        // columns are wrapped because the guard only fires when a wrapped
        // column is actually evaluated downstream — the joins below
        // evaluate the keys, but pruning must not be able to drop the one
        // guarded column.
        val dupW = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(F.col): _*)
        val keyCols = keys.map(k =>
          sAligned.columns.find(_.equalsIgnoreCase(k)).getOrElse(k))
        val s = keyCols.foldLeft(
            sAligned.withColumn("__graft_kcnt", F.count(F.lit(1)).over(dupW))) {
            (acc, kc) =>
              acc.withColumn(kc,
                F.when(F.col("__graft_kcnt") > 1, F.raise_error(F.lit(
                  s"merge source has duplicate rows per key (${keys.mkString(", ")})")))
                  .otherwise(F.col(kc)))
          }
          .drop("__graft_kcnt")
        val tKeys = t.select(keys.map(F.col): _*).distinct()
        val untouched = t.join(s.select(keys.map(F.col): _*).distinct(), keys, "left_anti")
        val merged =
          if (!matchedDelete && notMatchedInsert)
            untouched.unionByName(s) // plain upsert: every source row survives
          else {
            // matched target rows: deleted, or replaced by their source row
            val matchedPart =
              if (matchedDelete) None else Some(s.join(tKeys, keys, "left_semi"))
            // unmatched source rows: inserted only with an insert clause
            val insertPart =
              if (notMatchedInsert) Some(s.join(tKeys, keys, "left_anti")) else None
            (matchedPart.toSeq ++ insertPart).foldLeft(untouched)(_ unionByName _)
          }
        overwriteTarget(target, merged, ctx)
      case CreateTableAs(name, rel, orReplace, parts) =>
        val df = lower(rel, ctx)
        val mode = if (orReplace) "overwrite" else "errorifexists"
        val w0 = df.write.mode(mode)
        val w = if (parts.nonEmpty) w0.partitionBy(parts: _*) else w0
        w.saveAsTable(name)
        last = Some(df)
    }
    last
  }

  /** '10 ms' / '2 s' / '7 days' → milliseconds (wait() argument). Shares
    * [[graft.streaming.Subscribe.durationMs]]: one duration grammar across
    * the language (space-free forms accepted, unknown units REJECTED — a
    * silently-milliseconds '2 weeks' waited 2 ms). */
  private def parseDurationMs(s: String): Long =
    try graft.streaming.Subscribe.durationMs(s)
    catch {
      case e: Exception => throw new LoweringException(
        s"wait: cannot parse duration '$s' (${e.getMessage})")
    }

  /** saveAsTable in overwrite mode errors with LOCATION_ALREADY_EXISTS when
    * the metastore forgot the table (fresh session) but its warehouse dir
    * survived. For overwrite semantics, drop the stale state and retry. */
  private def saveAsTableResilient(
      w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row],
      target: String,
      append: Boolean,
      ctx: Context
  ): Unit =
    try w.saveAsTable(target)
    catch {
      case e: Throwable
          if !append && String.valueOf(e.getMessage).contains("LOCATION_ALREADY_EXISTS") =>
        ctx.spark.sql(s"DROP TABLE IF EXISTS $target").collect()
        val warehouse = ctx.spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
          .stripPrefix("file:")
        val parts = target.split('.')
        val loc = new java.io.File(
          if (parts.length == 2) s"$warehouse/${parts(0)}.db/${parts(1)}"
          else s"$warehouse/$target")
        def rmrf(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
          f.delete()
        }
        rmrf(loc)
        w.saveAsTable(target)
    }

  // ENDS-with, not contains: a schema-qualified catalog table like
  // 'etl.json_events' must not be misread as a file path (same guard as
  // resolveTable's extension regex)
  private def isPathTarget(target: String): Boolean =
    target.contains("/") ||
      target.toLowerCase.matches(".*\\.(parquet|csv|orc|json|txt|text)(\\.gz)?$")

  /** File-sink format dispatch by target extension — parquet default, csv
    * with header (the reference's DuckDB COPY contract), plus orc and json
    * (Spark-native formats the columnar engine gets for free; the ORC jars
    * ship in every Spark distribution). */
  private def writeByExtension(
      w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row],
      target: String, path: String): Unit = {
    val t = target.toLowerCase
    if (t.endsWith(".csv")) w.option("header", "true").csv(path)
    else if (t.endsWith(".orc")) w.orc(path)
    else if (t.endsWith(".json")) w.json(path)
    else if (t.endsWith(".txt") || t.endsWith(".text"))
      w.text(path) // single string column required; Spark errors clearly otherwise
    else w.parquet(path)
  }

  private def resolveTargetPath(target: String, ctx: Context): String =
    if (target.startsWith("/") || ctx.basePath.isEmpty) target
    else s"${ctx.basePath.stripSuffix("/")}/$target"

  private def readTarget(target: String, ctx: Context): DataFrame =
    if (isPathTarget(target)) readFile(target, ctx)
    else ctx.spark.table(target)

  /** Partition-pruned in-place DML: when the target is a hive-partitioned
    * parquet path and the predicate pins the partition column to a literal,
    * rewrite ONLY the affected partition directories — at 100 TB a
    * one-partition delete must not rewrite the table (the unpartitioned /
    * unpinned cases still take the full read-overwrite path, which is
    * inherent to plain parquet without a copy-on-write table format).
    * Returns true when the rewrite was handled here. */
  private def prunedRewrite(
      target: String,
      cond: Expr,
      ctx: Context,
      transform: (DataFrame, Column) => DataFrame,
      mutatedCols: Set[String] = Set.empty
  ): Boolean = {
    if (!isPathTarget(target)) return false
    val root = new java.io.File(resolveTargetPath(target, ctx))
    if (!root.isDirectory) return false
    val partDirs = root.listFiles().filter(f => f.isDirectory && f.getName.contains("="))
    if (partDirs.isEmpty) return false
    val pcol = partDirs.head.getName.takeWhile(_ != '=')
    if (!partDirs.forall(_.getName.startsWith(pcol + "="))) return false
    // mutating the partition column would strand rows in the wrong directory
    if (mutatedCols.exists(_.equalsIgnoreCase(pcol))) return false
    val eqVal: Option[Any] = splitConjuncts(cond).collectFirst {
      case BinaryOp("=", Ident(c), v)
        if c.equalsIgnoreCase(pcol) && constValue(v).isDefined => constValue(v).get
      case BinaryOp("=", v, Ident(c))
        if c.equalsIgnoreCase(pcol) && constValue(v).isDefined => constValue(v).get
    }
    eqVal match {
      case None => false
      case Some(v) =>
        val want = String.valueOf(v)
        val affected = partDirs.filter { d =>
          java.net.URLDecoder.decode(d.getName.drop(pcol.length + 1), "UTF-8") == want
        }
        affected.foreach { d =>
          // the partition column lives in the directory name — bind it as a
          // literal so the predicate (and update expressions) see it
          val df = ctx.spark.read.parquet(d.getAbsolutePath).withColumn(pcol, F.lit(v))
          val condCol = expr(cond, ExprCtx(ctx, aggMode = false, dfOpt = Some(df)))
          val out = transform(df, condCol).drop(pcol)
          out.localCheckpoint(true).write.mode("overwrite").parquet(d.getAbsolutePath)
        }
        true
    }
  }

  private def overwriteTarget(target: String, df: DataFrame, ctx: Context): Unit = {
    // break lineage from the source files/table so the overwrite does not
    // read from what it is replacing
    val materialized = df.localCheckpoint(true)
    if (isPathTarget(target)) {
      val path = resolveTargetPath(target, ctx)
      writeByExtension(materialized.write.mode("overwrite"), target, path)
    } else materialized.write.mode("overwrite").saveAsTable(target)
  }

  def lower(rel: Relation, ctx: Context): DataFrame =
    materialize(lowerRel(rel, ctx), ctx)

  /** STREAMING execution of a windowed-subscription aggregation: the same
    * language statements whose batch lowering injects the epoch-aligned
    * bucket keys (GroupBy over subscribe(window_size: …)) are executed
    * against a streaming source instead — readStream → (dedup-on-ingest) →
    * watermark → operators between subscribe and group-by → F.window
    * aggregation with the query's OWN keys and aggregate columns → append.
    * This is the slice the reference's Incrementalize rewrite targets
    * (Incrementalize.scala:27-107): the aggregation itself runs inside the
    * incremental plan, not just in the batch refresh. Output columns and
    * their order match the batch lowering exactly (keys…, window_start_ms,
    * window_end_ms, aggs…) so staged appends compare row-for-row against a
    * full refresh. Trailing order/limit stages are presentation-only and
    * skipped — a streaming append sink has no global order.
    */
  def lowerStreamingAgg(
      stmts: List[Statement],
      stream: DataFrame,
      ctx: Context
  ): DataFrame = {
    require(stream.isStreaming, "lowerStreamingAgg requires a streaming DataFrame (readStream)")
    // register defs (models/vals/funcs) without executing anything
    stmts.foreach {
      case m: ModelDef => ctx.models(m.name) = m
      case f: FuncDef => ctx.funcs(f.name.toLowerCase) = f
      case p: PartialDef => ctx.partials(p.name.toLowerCase) = p
      case v: ValDef => ctx.vals(v.name) = v.expr
      case _ => ()
    }
    val rel0 = stmts.reverse.collectFirst { case QueryStatement(r) => r }.getOrElse(
      throw new LoweringException("lowerStreamingAgg: no query statement"))
    def strip(r: Relation): Relation = r match {
      case Sort(c, _) => strip(c)
      case Limit(c, _) => strip(c)
      case Offset(c, _) => strip(c)
      case other => other
    }
    // Stages between the trailing presentation operators and the Agg core:
    // post-agg HAVING filters and stateless column stages. Peeled here
    // (innermost first) and re-applied to the streaming aggregate by
    // applyPostAggStage — the same per-row lowering the batch refresh uses
    // over the aggregated Plain relation, so staged appends keep comparing
    // row-for-row against a full refresh.
    def peel(r: Relation, acc: List[Relation]): (Relation, List[Relation]) = r match {
      case a: Agg => (a, acc)
      case Sort(c, _) => peel(c, acc) // row-preserving; append sink has no order
      case _: Limit | _: Offset =>
        throw new LoweringException(
          "streaming aggregation: limit/offset below a post-agg stage has no " +
            "incremental meaning — move it to the end of the pipeline")
      case f: Filter => peel(f.child, f :: acc)
      case p: Project if !p.items.exists(it => hasAgg(it.expr)) =>
        peel(p.child, p :: acc)
      case t: TransformColumns => peel(t.child, t :: acc)
      case ac: AddColumns => peel(ac.child, ac :: acc)
      case ec: ExcludeColumns => peel(ec.child, ec :: acc)
      case rc: RenameColumns => peel(rc.child, rc :: acc)
      case sc: ShiftColumns => peel(sc.child, sc :: acc)
      case other => (other, acc)
    }
    val (core, postStages) = peel(strip(rel0), Nil)
    val agged: DataFrame = core match {
      case Agg(gb: GroupBy, items) if windowedSubscription(gb.child).isDefined =>
        val sub = windowedSubscription(gb.child).get
        val pmap = sub.params.toMap
        val ts = pmap.getOrElse("watermark_column", throw new LoweringException(
          "subscribe: window_size requires watermark_column"))
        val delay = graft.streaming.Subscribe.duration(
          pmap.getOrElse("watermark_delay", "10 minutes"))
        val size = graft.streaming.Subscribe.duration(pmap("window_size"))
        val slide = pmap.get("window_slide").map(graft.streaming.Subscribe.duration)
        val base =
          if (pmap.get("dedup_keys").exists(_.trim.nonEmpty))
            graft.streaming.Subscribe.dedupFromParams(stream, pmap)
          else graft.functions.EpochTime.normalizeTs(stream, ts).withWatermark(ts, delay)
        val ctx2 = ctx.copy(streamingSub = Some(base))
        val child = lower(gb.child, ctx2)
        val ectx = ExprCtx(ctx2, aggMode = false)
        val keyCols = gb.keys.zipWithIndex.map { case (k, i) =>
          expr(k.expr, ectx).as(itemName(k, i))
        }
        val aggCols = items.zipWithIndex.map { case (it, i) =>
          expr(it.expr, ExprCtx(ctx2, aggMode = true)).as(itemName(it, i))
        }
        val win = slide match {
          case Some(s) => F.window(F.col(ts), size, s)
          case None => F.window(F.col(ts), size)
        }
        val agged = child
          .groupBy(win.as("__w") +: keyCols: _*)
          .agg(aggCols.head, aggCols.tail: _*)
          .withColumn("window_start_ms",
            graft.functions.EpochTime.unixMillis(F.col("__w.start")))
          .withColumn("window_end_ms",
            graft.functions.EpochTime.unixMillis(F.col("__w.end")))
          .drop("__w")
        // batch refresh column order: keys…, window keys, aggs…
        val ordered =
          gb.keys.zipWithIndex.map { case (k, i) => itemName(k, i) } ++
            Seq("window_start_ms", "window_end_ms") ++
            items.zipWithIndex.map { case (it, i) => itemName(it, i) }
        agged.select(ordered.map(F.col): _*)

      case Agg(gb: GroupBy, items) if sessionizedSubscription(gb.child).isDefined =>
        // Per-session aggregation executed INSIDE the stream: Spark's
        // native session_window (watermark-bounded merging state, append
        // emits each session once when the watermark passes its end).
        // Parity with the batch kernel (Sessionize.annotateSessions):
        //   - event time is floored to ms FIRST (batch works on ms-floored
        //     epoch values; session_window would otherwise split on sub-ms)
        //   - gap is (gapMs + 1) ms: session_window merges an event only
        //     when t < last + gap (exclusive), the batch kernel when
        //     t - last <= gap (inclusive) — +1 ms makes them equal on
        //     ms-floored integers
        //   - session_end_ms = end - (gapMs + 1) = last event's ms, the
        //     batch max(ts_ms)
        val sub = sessionizedSubscription(gb.child).get
        val pmap = sub.params.toMap
        val ts = pmap.getOrElse("watermark_column", throw new LoweringException(
          "subscribe: session_gap requires watermark_column"))
        val delay = graft.streaming.Subscribe.duration(
          pmap.getOrElse("watermark_delay", "10 minutes"))
        val gapMs = graft.streaming.Subscribe.durationMs(pmap("session_gap"))
        // same contract as the batch lowering: group keys == session_keys
        val sessKeys = pmap.get("session_keys")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
        val bareKeys = gb.keys.map(_.expr match {
          case Ident(n) => n.toLowerCase
          case other => throw new LoweringException(
            s"group by over a sessionized subscription supports bare session-key columns, got $other")
        })
        if (bareKeys.toSet != sessKeys.map(_.toLowerCase).toSet)
          throw new LoweringException(
            s"group by over a sessionized subscription must group by exactly its " +
              s"session_keys (${sessKeys.mkString(", ")}); got (${bareKeys.mkString(", ")})")
        val floored = stream.withColumn(ts,
          F.timestamp_millis(graft.functions.EpochTime.epochMs(F.col(ts))))
        val base =
          if (pmap.get("dedup_keys").exists(_.trim.nonEmpty))
            graft.streaming.Subscribe.dedupFromParams(floored, pmap)
          else floored.withWatermark(ts, delay)
        val ctx2 = ctx.copy(streamingSub = Some(base))
        val child = lower(gb.child, ctx2)
        val ectx = ExprCtx(ctx2, aggMode = false)
        val keyCols = gb.keys.zipWithIndex.map { case (k, i) =>
          expr(k.expr, ectx).as(itemName(k, i))
        }
        val aggCols = items.zipWithIndex.map { case (it, i) =>
          expr(it.expr, ExprCtx(ctx2, aggMode = true)).as(itemName(it, i))
        }
        val agged = child
          .groupBy(F.session_window(F.col(ts), s"${gapMs + 1} milliseconds").as("__w") +: keyCols: _*)
          .agg(aggCols.head, aggCols.tail: _*)
          .withColumn("session_start_ms",
            graft.functions.EpochTime.unixMillis(F.col("__w.start")))
          .withColumn("session_end_ms",
            graft.functions.EpochTime.unixMillis(F.col("__w.end")) - F.lit(gapMs + 1))
          .drop("__w")
        val ordered =
          gb.keys.zipWithIndex.map { case (k, i) => itemName(k, i) } ++
            Seq("session_start_ms", "session_end_ms") ++
            items.zipWithIndex.map { case (it, i) => itemName(it, i) }
        agged.select(ordered.map(F.col): _*)
      case other =>
        throw new LoweringException(
          "streaming aggregation expects `from <t>.subscribe(window_size: …) " +
            "… group by … agg …` (optional where/select before the group-by " +
            "and where/select/column stages after the agg); got " +
            other.getClass.getSimpleName)
    }
    postStages.foldLeft(agged)((df, st) => applyPostAggStage(df, st, ctx))
  }

  /** Post-aggregation stages of a streaming subscription query: HAVING-style
    * filters and stateless projections/column ops over the emitted aggregate
    * rows. Each case mirrors the batch lowering of the same node over an
    * aggregated Plain relation (no subquery binding — a subquery join after
    * a streaming aggregation is not reproducible by the batch refresh, and
    * `select distinct` would need a second stateful dedup; both are rejected
    * at lowering). */
  private def applyPostAggStage(df: DataFrame, stage: Relation, ctx: Context): DataFrame = {
    def subqueryFree(e: Expr): Expr = {
      transformExpr(e) {
        case s @ (_: InSubquery | _: ExistsExpr | _: ScalarSubquery) =>
          throw new LoweringException(
            "streaming aggregation: subqueries are not supported after the agg " +
              "— the batch refresh could not reproduce a stream-side subquery join")
      }
      e
    }
    val ectx = ExprCtx(ctx, aggMode = false, dfOpt = Some(df))
    stage match {
      case Filter(_, cond) => df.filter(expr(subqueryFree(cond), ectx))
      case Project(_, items, distinct) =>
        if (distinct)
          throw new LoweringException(
            "streaming aggregation: `select distinct` after the agg would need " +
              "a second stateful dedup — deduplicate with group keys instead")
        df.select(items.zipWithIndex.map { case (it, i) =>
          it.expr match {
            case Star(None) => F.col("*")
            case Star(Some(q)) => F.col(s"$q.*")
            case e => expr(subqueryFree(e), ectx).as(itemName(it, i))
          }
        }: _*)
      case TransformColumns(_, items) =>
        items.zipWithIndex.foldLeft(df) { case (d, (it, i)) =>
          d.withColumn(itemName(it, i),
            expr(subqueryFree(it.expr), ExprCtx(ctx, aggMode = false, dfOpt = Some(d))))
        }
      case AddColumns(_, items, prepend) =>
        val newCols = items.zipWithIndex.map { case (it, i) =>
          expr(subqueryFree(it.expr), ectx).as(itemName(it, i))
        }
        val existing = df.columns.map(F.col).toList
        if (prepend) df.select(newCols ++ existing: _*)
        else df.select(existing ++ newCols: _*)
      case ExcludeColumns(_, cols) => df.drop(cols: _*)
      case RenameColumns(_, renames) => df.withColumnsRenamed(renames.toMap)
      case ShiftColumns(_, cols, toLeft) =>
        val shifted = cols.map(c => df.columns.find(_.equalsIgnoreCase(c)).getOrElse(c))
        val rest = df.columns.filterNot(c => shifted.exists(_.equalsIgnoreCase(c))).toList
        val order = if (toLeft) shifted ++ rest else rest ++ shifted
        df.select(order.map(F.col): _*)
      case other =>
        throw new LoweringException(
          s"streaming aggregation: unsupported post-agg stage ${other.getClass.getSimpleName}")
    }
  }

  /** Bare `group by` at the end of a pipeline renders keys + arbitrary() of
    * every remaining column (reference: SqlGenerator.scala:487). */
  private def materialize(res: LRes, ctx: Context): DataFrame = res match {
    case Plain(df) => df
    case g @ Grouped(df, keys, _, _, _) =>
      // reference naming: EVERY input column (the grouping keys included)
      // surfaces as arbitrary(col) after the keys — SqlGenerator.scala:1252
      // `keys ++ defaultAggExprs` maps over all inputRelationType.fields
      val aggs = df.columns.map(c => F.any_value(F.col(c)).as(s"arbitrary($c)"))
      aggregate(g, aggs.toList, Nil, ctx)
  }

  /** Lazily bind scalar subqueries appearing in aggregation-mode
    * expressions: cross-join the (broadcast) 1-row aggregate onto the INPUT
    * frame and reference it through any_value() — constant per group, plan
    * stays lazy, no driver-side collect (closes the eager fallback the
    * expr() ScalarSubquery case used to take for agg arguments). */
  private def bindScalarsForAgg(
      g: Grouped,
      items: List[SelectItem],
      ctx: Context
  ): (Grouped, List[SelectItem]) = {
    if (!items.exists(it => containsScalarSubquery(it.expr))) return (g, items)
    val (df2, rewritten, bound) = bindScalarSubqueries(g.df, items.map(_.expr), ctx)
    val names = bound.toSet
    val wrapped = items.zip(rewritten).map { case (it, re) =>
      it.copy(expr = transformExpr(re) {
        case Ident(n) if names.contains(n) => MethodCall(Ident(n), "any_value", Nil)
      })
    }
    (g.copy(df = df2), wrapped)
  }

  private def bindScalarsForAggPlain(
      df0: DataFrame,
      items: List[SelectItem],
      ctx: Context
  ): (DataFrame, List[SelectItem]) = {
    val g2 = Grouped(df0, Nil, Nil, GroupingStyle.Plain)
    val (gb, wrapped) = bindScalarsForAgg(g2, items, ctx)
    (gb.df, wrapped)
  }

  /** groupBy/rollup/cube + agg + having filters. */
  private def aggregate(
      g0: Grouped,
      aggCols: List[Column],
      postSelect: List[Column],
      ctx: Context,
      pivotCountFill: Boolean = false
  ): DataFrame = {
    // scalar subqueries in HAVING bind lazily the same way (TPC-H q11 shape)
    val g =
      if (g0.havings.exists(containsScalarSubquery)) {
        val (df2, rewritten, bound) = bindScalarSubqueries(g0.df, g0.havings, ctx)
        val names = bound.toSet
        g0.copy(df = df2, havings = rewritten.map(transformExpr(_) {
          case Ident(n) if names.contains(n) => MethodCall(Ident(n), "any_value", Nil)
        }))
      } else g0
    val ectx = ExprCtx(ctx, aggMode = false)
    val keyCols = g.keys.zipWithIndex.map { case (k, i) => expr(k.expr, ectx).as(itemName(k, i)) }
    val havingCols = g.havings.zipWithIndex.map { case (h, i) =>
      expr(h, ectx.copy(aggMode = true)).as(s"__having_$i")
    }
    val allAggs = aggCols ++ havingCols
    val grouped0 = g.style match {
      case GroupingStyle.Plain => g.df.groupBy(keyCols: _*)
      case GroupingStyle.Rollup => g.df.rollup(keyCols: _*)
      case GroupingStyle.Cube => g.df.cube(keyCols: _*)
      case GroupingStyle.Sets(sets) =>
        // Spark 4 native grouping sets (SURVEY §2.E; reference
        // exprs.scala:1004-1032). Set members are matched to the grouping
        // columns BY EXPRESSION — an alias on the grouping column breaks the
        // match (keys silently all-null), so group unaliased and rename the
        // key columns positionally after the aggregate.
        val plainKeys = g.keys.map(k => expr(k.expr, ectx))
        g.df.groupingSets(sets.map(_.map(e => expr(e, ectx))), plainKeys: _*)
    }
    val grouped = g.pivot match {
      case Some((pc, vals)) if g.style == GroupingStyle.Plain =>
        if (g.havings.nonEmpty)
          // the pivoted aggregate renames every agg column per pivot value
          // ('2023___having_0'), so the post-agg having filter cannot
          // resolve — loud error instead of UNRESOLVED_COLUMN
          throw new LoweringException(
            "having over a pivoted aggregate is not supported — filter after the pivot instead")
        if (vals.nonEmpty) grouped0.pivot(pc, vals) else grouped0.pivot(pc)
      case Some(_) =>
        throw new LoweringException("pivot cannot combine with rollup/cube/grouping sets")
      case None => grouped0
    }
    // key-only output: a plain group-by is just DISTINCT keys, but
    // rollup/cube/grouping-sets must still run the styled aggregate (their
    // subtotal and grand-total rows are part of the key space) — a dummy
    // aggregate materializes the grouping rows and is dropped
    val keyOnlyDistinct = allAggs.isEmpty &&
      g.style == GroupingStyle.Plain && g.pivot.isEmpty
    var out =
      if (keyOnlyDistinct) g.df.select(keyCols: _*).distinct()
      else if (allAggs.isEmpty)
        grouped.agg(F.count(F.lit(1)).as("__graft_keyonly")).drop("__graft_keyonly")
      else grouped.agg(allAggs.head, allAggs.tail: _*)
    if (g.pivot.isDefined && pivotCountFill) {
      // count pivot: absent combinations are 0, not null (DuckDB parity)
      val keyNames = g.keys.zipWithIndex.map { case (k, i) => itemName(k, i) }
      out = out.na.fill(0L,
        out.columns.filterNot(c => keyNames.exists(_.equalsIgnoreCase(c)) ||
          c.startsWith("__having_")))
    }
    if (g.style.isInstanceOf[GroupingStyle.Sets] && !keyOnlyDistinct) {
      val keyNames = g.keys.zipWithIndex.map { case (k, i) => itemName(k, i) }
      out = out.toDF(keyNames ++ out.columns.drop(keyNames.length): _*)
    }
    g.havings.indices.foreach { i => out = out.filter(F.col(s"__having_$i")) }
    if (g.havings.nonEmpty) out = out.drop(g.havings.indices.map(i => s"__having_$i"): _*)
    if (postSelect.nonEmpty) out = out.select(postSelect: _*)
    out
  }

  /** Resolve group keys that name a forward select alias (q15 shape:
    * `group by supplier_no select supplier_no = l_suppkey`): the key takes
    * the aliased expression; the matching select item is rewritten to
    * reference the key output column. */
  private def resolveForwardKeys(
      g: Grouped,
      items: List[SelectItem]
  ): (Grouped, List[SelectItem]) = {
    var newItems = items
    val keys = g.keys.map { k =>
      k.expr match {
        case Ident(n) if !g.df.columns.exists(_.equalsIgnoreCase(n)) =>
          items.zipWithIndex.collectFirst {
            case (it, i) if itemName(it, i).equalsIgnoreCase(n) && !hasAgg(it.expr) => it
          } match {
            case Some(it) =>
              newItems = newItems.map(x =>
                if (x eq it) SelectItem(Ident(n), Some(n)) else x)
              SelectItem(it.expr, Some(n))
            case None => k
          }
        case _ => k
      }
    }
    (g.copy(keys = keys), newItems)
  }

  private def itemName(item: SelectItem, idx: Int): String =
    item.alias.getOrElse(exprName(item.expr, idx))

  private def exprName(e: Expr, idx: Int): String = e match {
    case Ident(n) => n
    case DotRef(Ident(_), n) if !Stdlib.isAggMethod(n) && !Stdlib.scalarMethods.contains(n) => n
    // reference auto-naming for dot-aggregations: age.max → max(age)
    case DotRef(Ident(c), n) if Stdlib.isAggMethod(n) => s"$n($c)"
    case MethodCall(Ident(c), n, Nil) if Stdlib.isAggMethod(n) => s"$n($c)"
    case DotRef(_, n) => n
    case MethodCall(_, n, _) => n
    case FunctionCall(n, _, _, _) => n
    case Cast(inner, _, _) => exprName(inner, idx)
    // reference auto-naming of unaliased string concatenation: the rendered
    // SQL text, right-nested (spec/basic/string-concat.wv:
    // `'a' + 'b' + 'c'` → `concat('a', concat('b', 'c'))`)
    case b @ BinaryOp("+", _, _) if concatTerms(b).exists(_.isInstanceOf[StringLit]) =>
      def nest(ts: List[String]): String = ts match {
        case t :: Nil => t
        case t :: rest => s"concat($t, ${nest(rest)})"
        case Nil => ""
      }
      nest(concatTerms(b).map(sqlLitText))
    case _ => s"_c$idx"
  }

  private def concatTerms(e: Expr): List[Expr] = e match {
    case BinaryOp("+", l, r) => concatTerms(l) ++ concatTerms(r)
    case other => List(other)
  }

  private def sqlLitText(e: Expr): String = e match {
    case StringLit(s) => "'" + s.replace("'", "''") + "'"
    case LongLit(v) => v.toString
    case DoubleLit(v) => v.toString
    case Ident(n) => n
    case other => other.toString
  }

  // ---------------------------------------------------------------------------
  // Relation lowering
  // ---------------------------------------------------------------------------
  /** The windowed subscription feeding a group-by, seen through operators
    * that pass columns along (where/select/add/rename/sort/limit/…). A
    * `subscribe(window_size: …)` must hand its window keys to the next
    * aggregation even when operators sit in between — finding it here (and
    * validating column survival at the group-by) is what keeps the batch
    * refresh and the streaming tumbling plan in lockstep. Aggregations,
    * joins, and set-ops stop the search: past one of those, the window
    * metadata has been consumed or the provenance is ambiguous. */
  private def windowedSubscription(r: Relation): Option[SubscribeRel] =
    subscriptionThrough(r, "window_size")

  /** The sessionized subscription feeding a group-by — same pass-through
    * walk as [[windowedSubscription]], keyed on session_gap. */
  private def sessionizedSubscription(r: Relation): Option[SubscribeRel] =
    subscriptionThrough(r, "session_gap")

  private def subscriptionThrough(r: Relation, param: String): Option[SubscribeRel] = r match {
    case s: SubscribeRel => Some(s).filter(_.params.exists(_._1 == param))
    case Filter(c, _) => subscriptionThrough(c, param)
    case BracedRelation(c) => subscriptionThrough(c, param)
    case AliasedRelation(c, _, _) => subscriptionThrough(c, param)
    case SelectAsNamed(c, _) => subscriptionThrough(c, param)
    case Sort(c, _) => subscriptionThrough(c, param)
    case Limit(c, _) => subscriptionThrough(c, param)
    case Offset(c, _) => subscriptionThrough(c, param)
    case DedupRel(c) => subscriptionThrough(c, param)
    case Project(c, _, _) => subscriptionThrough(c, param)
    case TransformColumns(c, _) => subscriptionThrough(c, param)
    case AddColumns(c, _, _) => subscriptionThrough(c, param)
    case ExcludeColumns(c, _) => subscriptionThrough(c, param)
    case RenameColumns(c, _) => subscriptionThrough(c, param)
    case ShiftColumns(c, _, _) => subscriptionThrough(c, param)
    case _ => None
  }

  // Case bodies extracted from lowerRel's dispatch — the match itself must
  // stay under the JVM's 64 KB method-size limit, so newer natives keep
  // their logic in private defs and the case arm is a one-line call.

  private def lowerBm25IndexAppend(args: Seq[Expr], ctx: Context): LRes =
    args.map(constValue) match {
      case List(Some(path: String), Some(batch: String), Some(idCol: String),
          Some(textCol: String)) =>
        val s = ctx.spark
        import s.implicits._
        if (ctx.analysisOnly)
          Plain(Seq.empty[(String, Long)].toDF("path", "postings"))
        else {
          try ctx.spark.read.parquet(path + "_meta").schema
          catch {
            case e: org.apache.spark.sql.AnalysisException =>
              throw new LoweringException(
                s"bm25_index_append expects a path to a persisted BM25 index " +
                  s"(postings at '$path' plus '_df'/'_meta' siblings — write them " +
                  s"with bm25_index / Retrieval.writeBm25Index) — ${e.getMessage}")
          }
          graft.operators.Retrieval.bm25IndexAppend(
            ctx.spark, path, lower(TableRef(batch), ctx), idCol, textCol)
          val n = graft.operators.Retrieval.readPostings(ctx.spark, path).count()
          Plain(Seq((path, n)).toDF("path", "postings"))
        }
      case _ =>
        throw new LoweringException(
          "bm25_index_append expects (index_path, batch, id_col, text_col) " +
            "literals, e.g. bm25_index_append('/tmp/bm25_idx', 'newbatch', " +
            "'doc_id', 'text')")
    }

  private def lowerMinhashIndexAppend(args: Seq[Expr], ctx: Context): LRes =
    args.map(constValue) match {
      case List(Some(path: String), Some(batch: String), Some(idCol: String),
          Some(textCol: String), rest @ _*) if rest.lengthCompare(2) <= 0 =>
        val (k, sh) = rest.toList match {
          case Nil => (64, 2)
          case List(Some(kk: Long), Some(s: Long)) if kk >= 1 && s >= 1 =>
            (kk.toInt, s.toInt)
          case other => throw new LoweringException(
            s"minhash_index_append: trailing args must be (num_hashes, shingle) " +
              s"positive integer literals, got '$other'")
        }
        val s = ctx.spark
        import s.implicits._
        if (ctx.analysisOnly)
          Plain(Seq.empty[(String, Long)].toDF("path", "rows"))
        else {
          try ctx.spark.read.parquet(path).schema
          catch {
            case e: org.apache.spark.sql.AnalysisException =>
              throw new LoweringException(
                s"minhash_index_append expects a path to a persisted MinHash index " +
                  s"(build it with minhash_index / Dedup.buildMinhashIndex) — ${e.getMessage}")
          }
          graft.operators.Dedup.minhashIndexAppend(
            ctx.spark, path, lower(TableRef(batch), ctx), idCol, textCol, k, sh)
          val n = ctx.spark.read.parquet(path).count()
          Plain(Seq((path, n)).toDF("path", "rows"))
        }
      case _ =>
        throw new LoweringException(
          "minhash_index_append expects (index_path, batch, id_col, text_col" +
            "[, num_hashes, shingle]) literals, e.g. minhash_index_append(" +
            "'/tmp/mh_idx', 'newbatch', 'doc_id', 'text')")
    }

  private def lowerDedupPhash(args: Seq[Expr], ctx: Context): LRes =
    args.map(constValue) match {
      case List(Some(corpus: String), Some(idCol: String), Some(imageCol: String),
          rest @ _*) if rest.lengthCompare(1) <= 0 =>
        val r = rest.headOption match {
          case Some(Some(n: Long)) if n >= 0 && n <= 14 => n.toInt
          case None => 3
          case other => throw new LoweringException(
            s"dedup_phash: hamming_r must be an integer literal in [0, 14], got '$other'")
        }
        val src = lower(TableRef(corpus), ctx)
        if (ctx.analysisOnly)
          // the pairs machinery materializes eagerly (localCheckpoint +
          // path-choice count) — schema probes get the lazy shape
          Plain(src.limit(0).select(
            F.col(idCol).cast("long").as("id_a"),
            F.col(idCol).cast("long").as("id_b"),
            F.lit(0).cast("int").as("hamming")))
        else
          Plain(graft.operators.Dedup.phashPairs(src, idCol, imageCol, r))
      case _ =>
        throw new LoweringException(
          "dedup_phash expects (corpus, id_col, image_col[, hamming_r]) literals, " +
            "e.g. dedup_phash('images', 'img_id', 'png', 3)")
    }

  private def lowerDedupPhashAgainst(args: Seq[Expr], ctx: Context): LRes =
    args.map(constValue) match {
      case List(Some(corpus: String), Some(batch: String), Some(idCol: String),
          Some(imageCol: String), rest @ _*) if rest.lengthCompare(1) <= 0 =>
        val r = rest.headOption match {
          case Some(Some(n: Long)) if n >= 0 && n <= 15 => n.toInt
          case None => 3
          case other => throw new LoweringException(
            s"dedup_phash_against: hamming_r must be an integer literal in [0, 15], " +
              s"got '$other'")
        }
        val c = lower(TableRef(corpus), ctx)
        val b = lower(TableRef(batch), ctx)
        Plain(graft.operators.Dedup.phashAgainst(c, b, idCol, imageCol, r))
      case _ =>
        throw new LoweringException(
          "dedup_phash_against expects (corpus, batch, id_col, image_col" +
            "[, hamming_r]) literals, e.g. dedup_phash_against('images', " +
            "'new_images', 'img_id', 'png', 3)")
    }

  private def lowerInt8IndexAppend(args: Seq[Expr], ctx: Context): LRes =
    args.map(constValue) match {
      case List(Some(path: String), Some(batch: String), Some(idCol: String),
          Some(vecCol: String)) =>
        val s = ctx.spark
        import s.implicits._
        if (ctx.analysisOnly)
          Plain(Seq.empty[(String, Long)].toDF("path", "rows"))
        else {
          try ctx.spark.read.parquet(path).schema
          catch {
            case e: org.apache.spark.sql.AnalysisException =>
              throw new LoweringException(
                s"ann_int8_index_append expects a path to a persisted int8 ANN index " +
                  s"(build it with ann_int8_index / Similarity.buildInt8Index) — " +
                  s"${e.getMessage}")
          }
          graft.operators.Similarity.int8IndexAppend(
            ctx.spark, path, lower(TableRef(batch), ctx), idCol, vecCol)
          val n = ctx.spark.read.parquet(path).count()
          Plain(Seq((path, n)).toDF("path", "rows"))
        }
      case _ =>
        throw new LoweringException(
          "ann_int8_index_append expects (index_path, batch, id_col, vec_col) " +
            "literals, e.g. ann_int8_index_append('/tmp/int8_idx', 'newvecs', " +
            "'vec_id', 'embedding')")
    }

  private def lowerPqIndexAppend(args: Seq[Expr], ctx: Context): LRes =
    args.map(constValue) match {
      case List(Some(path: String), Some(batch: String), Some(idCol: String),
          Some(vecCol: String)) =>
        val s = ctx.spark
        import s.implicits._
        if (ctx.analysisOnly)
          Plain(Seq.empty[(String, Long)].toDF("path", "rows"))
        else {
          try ctx.spark.read.parquet(path + "_codebook").schema
          catch {
            case e: org.apache.spark.sql.AnalysisException =>
              throw new LoweringException(
                s"ann_pq_index_append expects a path to a persisted PQ index " +
                  s"(codes at '$path' plus the '_codebook' sibling — build them " +
                  s"with ann_pq_index / Similarity.writePqIndex) — ${e.getMessage}")
          }
          graft.operators.Similarity.pqIndexAppend(
            ctx.spark, path, lower(TableRef(batch), ctx), idCol, vecCol)
          val n = ctx.spark.read.parquet(path).count()
          Plain(Seq((path, n)).toDF("path", "rows"))
        }
      case _ =>
        throw new LoweringException(
          "ann_pq_index_append expects (index_path, batch, id_col, vec_col) " +
            "literals, e.g. ann_pq_index_append('/tmp/pq_idx', 'newvecs', " +
            "'vec_id', 'embedding')")
    }

  private def lowerDedupBloomIndex(args: Seq[Expr], ctx: Context): LRes =
    args.map(constValue) match {
      case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
          Some(path: String), rest @ _*) if rest.lengthCompare(2) <= 0 =>
        val fpp = rest.headOption match {
          case Some(Some(d: java.lang.Double)) => d.doubleValue()
          case Some(Some(n: Number)) => n.doubleValue()
          case None => 0.01
          case other => throw new LoweringException(
            s"dedup_bloom_index: fpp must be a number literal in (0, 1), got '$other'")
        }
        val expected = rest.drop(1).headOption match {
          case Some(Some(n: Long)) if n >= 1 => Some(n)
          case None => None
          case other => throw new LoweringException(
            s"dedup_bloom_index: expected_items must be a positive integer " +
              s"literal, got '$other'")
        }
        val s = ctx.spark
        import s.implicits._
        if (ctx.analysisOnly)
          Plain(Seq.empty[(String, Long)].toDF("path", "num_bits"))
        else {
          graft.operators.Dedup.writeBloomIndex(
            lower(TableRef(corpus), ctx), idCol, textCol, path, fpp, expected)
          val bits = ctx.spark.read.parquet(path).head().getLong(2)
          Plain(Seq((path, bits)).toDF("path", "num_bits"))
        }
      case _ =>
        throw new LoweringException(
          "dedup_bloom_index expects (corpus, id_col, text_col, out_path" +
            "[, fpp[, expected_items]]) literals, e.g. dedup_bloom_index(" +
            "'documents', 'doc_id', 'text', '/tmp/bloom_idx')")
    }

  private def lowerDedupBloomIndexAppend(args: Seq[Expr], ctx: Context): LRes =
    args.map(constValue) match {
      case List(Some(path: String), Some(batch: String), Some(idCol: String),
          Some(textCol: String)) =>
        val s = ctx.spark
        import s.implicits._
        if (ctx.analysisOnly)
          Plain(Seq.empty[(String, Long)].toDF("path", "num_bits"))
        else {
          try ctx.spark.read.parquet(path).schema
          catch {
            case e: org.apache.spark.sql.AnalysisException =>
              throw new LoweringException(
                s"dedup_bloom_index_append expects a path to a persisted bloom index " +
                  s"(write it with dedup_bloom_index / Dedup.writeBloomIndex) — " +
                  s"${e.getMessage}")
          }
          graft.operators.Dedup.bloomIndexAppend(
            ctx.spark, path, lower(TableRef(batch), ctx), idCol, textCol)
          val bits = ctx.spark.read.parquet(path).head().getLong(2)
          Plain(Seq((path, bits)).toDF("path", "num_bits"))
        }
      case _ =>
        throw new LoweringException(
          "dedup_bloom_index_append expects (index_path, batch, id_col, text_col) " +
            "literals, e.g. dedup_bloom_index_append('/tmp/bloom_idx', 'newbatch', " +
            "'doc_id', 'text')")
    }

  private def lowerDedupBloomAgainstIndex(args: Seq[Expr], ctx: Context): LRes =
    args.map(constValue) match {
      case List(Some(path: String), Some(corpus: String), Some(batch: String),
          Some(idCol: String), Some(textCol: String)) =>
        if (ctx.analysisOnly)
          Plain(graft.operators.Dedup.dedupAgainstExact(
            lower(TableRef(corpus), ctx), lower(TableRef(batch), ctx), idCol, textCol))
        else
          Plain(graft.operators.Dedup.bloomDedupAgainstIndex(
            ctx.spark, path, lower(TableRef(corpus), ctx),
            lower(TableRef(batch), ctx), idCol, textCol))
      case _ =>
        throw new LoweringException(
          "dedup_bloom_against_index expects (index_path, corpus, batch, id_col, " +
            "text_col) literals, e.g. dedup_bloom_against_index('/tmp/bloom_idx', " +
            "'documents', 'newbatch', 'doc_id', 'text')")
    }

  private def lowerDedupBloom(args: Seq[Expr], ctx: Context): LRes =
    args.map(constValue) match {
      case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
          rest @ _*) if rest.lengthCompare(2) <= 0 =>
        val fpp = rest.headOption match {
          case Some(Some(d: java.lang.Double)) => d.doubleValue()
          case Some(Some(n: Number)) => n.doubleValue()
          case None => 0.01
          case other => throw new LoweringException(
            s"dedup_bloom: fpp must be a number literal in (0, 1), got '$other'")
        }
        val expected = rest.drop(1).headOption match {
          case Some(Some(n: Long)) if n >= 1 => Some(n)
          case None => None
          case other => throw new LoweringException(
            s"dedup_bloom: expected_items must be a positive integer literal, got '$other'")
        }
        if (ctx.analysisOnly)
          Plain(graft.operators.Dedup.exactGroups(
            lower(TableRef(corpus), ctx), idCol, textCol))
        else
          Plain(graft.operators.Dedup.bloomExactGroups(
            lower(TableRef(corpus), ctx), idCol, textCol, fpp, expected))
      case _ =>
        throw new LoweringException(
          "dedup_bloom expects (corpus, id_col, text_col[, fpp[, expected_items]]) " +
            "literals, e.g. dedup_bloom('documents', 'doc_id', 'text', 0.01)")
    }

  private def lowerDedupBloomAgainst(args: Seq[Expr], ctx: Context): LRes =
    args.map(constValue) match {
      case List(Some(corpus: String), Some(batch: String), Some(idCol: String),
          Some(textCol: String), rest @ _*) if rest.lengthCompare(2) <= 0 =>
        val fpp = rest.headOption match {
          case Some(Some(d: java.lang.Double)) => d.doubleValue()
          case Some(Some(n: Number)) => n.doubleValue()
          case None => 0.01
          case other => throw new LoweringException(
            s"dedup_bloom_against: fpp must be a number literal in (0, 1), got '$other'")
        }
        val expected = rest.drop(1).headOption match {
          case Some(Some(n: Long)) if n >= 1 => Some(n)
          case None => None
          case other => throw new LoweringException(
            s"dedup_bloom_against: expected_items must be a positive integer " +
              s"literal, got '$other'")
        }
        if (ctx.analysisOnly)
          Plain(graft.operators.Dedup.dedupAgainstExact(
            lower(TableRef(corpus), ctx), lower(TableRef(batch), ctx), idCol, textCol))
        else
          Plain(graft.operators.Dedup.bloomDedupAgainst(
            lower(TableRef(corpus), ctx), lower(TableRef(batch), ctx),
            idCol, textCol, fpp, expected))
      case _ =>
        throw new LoweringException(
          "dedup_bloom_against expects (corpus, batch, id_col, text_col" +
            "[, fpp[, expected_items]]) literals, e.g. dedup_bloom_against(" +
            "'documents', 'newbatch', 'doc_id', 'text', 0.01)")
    }

  private def lowerRel(rel: Relation, ctx: Context): LRes = rel match {
    case TableRef(name) =>
      ctx.models.get(name) match {
        case Some(m) => lowerRel(ModelRef(name, Nil), ctx)
        case None =>
          // auto-alias by table name so `on a.x = b.y` qualifiers resolve
          val shortName = name.split('.').last
          Plain(resolveTable(name, ctx).alias(shortName))
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "parquet_metadata" =>
      // parquet_metadata('file.parquet') table function (DuckDB parity,
      // save-with-options.wv): per-column-chunk footer metadata, read via
      // parquet-hadoop (already on Spark's classpath)
      args match {
        case List(StringLit(p)) => Plain(parquetMetadata(p, ctx))
        case _ =>
          throw new LoweringException("parquet_metadata expects one path string")
      }

    case ModelRef(name, Nil) if !ctx.models.contains(name) &&
        name.toLowerCase == "wv_tables" =>
      // stdlib catalog model (reference wvlet-stdlib/module/standard/
      // catalog.wv: information_schema.tables projected to 4 columns). The
      // reference's in-memory engine names its default catalog memory.main;
      // the in-memory session catalog here presents the same logical names
      // so catalog queries are portable across the two engines.
      import ctx.spark.implicits._
      val rows = ctx.spark.catalog.listTables().collect().toSeq.map { t =>
        val schema = t.database match {
          case null | "" | "default" => "main"
          case d => d
        }
        val tpe =
          if (t.tableType == "TEMPORARY" || t.tableType == "VIEW") "VIEW"
          else "BASE TABLE"
        ("memory", schema, t.name, tpe)
      }.sortBy(r => (r._2, r._3))
      Plain(rows.toDF("catalog", "schema", "name", "table_type"))

    case ModelRef(name, Nil) if !ctx.models.contains(name) &&
        name.toLowerCase == "wv_schemas" =>
      import ctx.spark.implicits._
      val rows = ctx.spark.catalog.listDatabases().collect().toSeq
        .map(d => ("memory", if (d.name == "default") "main" else d.name))
        .sortBy(_._2)
      Plain(rows.toDF("catalog", "name"))

    case ModelRef(name, Nil) if !ctx.models.contains(name) &&
        name.toLowerCase == "duckdb_functions" =>
      // engine-registry table function (reference spec/basic/duckdb/
      // from_table_function.wv): DuckDB-shaped columns over THIS engine's
      // function registry — same surface, engine-native contents
      import ctx.spark.implicits._
      val builtin = ctx.spark.catalog.listFunctions().collect().toSeq
        .map(f => (f.name, "scalar", null: String))
      val user = (ctx.funcs.keys.map((_, "macro", null: String)).toSeq ++
        ctx.partials.keys.map((_, "table_macro", null: String)).toSeq)
      Plain((builtin ++ user).sortBy(_._1)
        .toDF("function_name", "function_type", "return_type"))

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        (name.toLowerCase == "contaminated_docs" || name.toLowerCase == "decontaminate") =>
      // decontamination table functions (operators/Decontamination.scala):
      //   contaminated_docs('corpus', 'eval', 'id_col', 'text_col', n)
      //   decontaminate('corpus', 'eval', 'id_col', 'text_col', n)
      // corpus/eval are relation names resolved through the same rules as
      // `from <name>` — tables, files, and in-scope models all work, so
      // `model evalset = { … }` composes directly. n accepts the
      // industry-standard presets alongside an integer (see
      // contaminationN: 'gpt3' = 13, 'palm' = 8).
      args.map(constValue) match {
        case List(Some(corpus: String), Some(eval: String), Some(idCol: String),
            Some(textCol: String), Some(n)) =>
          val c = lower(TableRef(corpus), ctx)
          val e = lower(TableRef(eval), ctx)
          val nn = contaminationN(name, n)
          Plain(
            if (name.toLowerCase == "contaminated_docs")
              graft.operators.Decontamination
                .contaminatedDocs(c, idCol, textCol, e, textCol, nn)
            else
              graft.operators.Decontamination
                .decontaminate(c, idCol, textCol, e, textCol, nn))
        case _ =>
          throw new LoweringException(
            s"$name expects (corpus, eval, id_col, text_col, n) literals — n an " +
              s"integer or a preset ('gpt3' = 13, 'palm' = 8) — e.g. " +
              s"$name('documents', 'evalset', 'doc_id', 'text', 13)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "contamination_report" =>
      // contamination_report('corpus', 'eval', 'id_col', 'text_col', n) —
      // the benchmark-health transpose (Decontamination.contaminationReport):
      // per EVAL doc, how many corpus docs share an n-gram with it. n
      // accepts the standard presets ('gpt3' = 13, 'palm' = 8).
      args.map(constValue) match {
        case List(Some(corpus: String), Some(eval: String), Some(idCol: String),
            Some(textCol: String), Some(n)) =>
          Plain(graft.operators.Decontamination.contaminationReport(
            lower(TableRef(corpus), ctx), idCol, textCol,
            lower(TableRef(eval), ctx), idCol, textCol, contaminationN(name, n)))
        case _ =>
          throw new LoweringException(
            "contamination_report expects (corpus, eval, id_col, text_col, n) literals " +
              "— n an integer or a preset ('gpt3' = 13, 'palm' = 8) — e.g. " +
              "contamination_report('trainset', 'evalset', 'doc_id', 'text', 'gpt3')")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        (name.toLowerCase == "contaminated_vecs" ||
         name.toLowerCase == "decontaminate_semantic") =>
      // embedding-space decontamination (Decontamination.contaminatedVecs /
      // decontaminateSemantic): the paraphrase-robust second net behind the
      // n-gram pair above; same relation-name resolution, so models compose
      //   contaminated_vecs('corpus', 'eval', 'id_col', 'vec_col', threshold)
      //   decontaminate_semantic('corpus', 'eval', 'id_col', 'vec_col', threshold)
      args.map(constValue) match {
        case List(Some(corpus: String), Some(eval: String), Some(idCol: String),
            Some(vecCol: String), Some(thr), rest @ _*) if rest.lengthCompare(1) <= 0 =>
          val t = thr match {
            case d: java.lang.Double => d.doubleValue()
            case n: Number => n.doubleValue()
            case other => throw new LoweringException(
              s"$name: threshold must be a number, got '$other'")
          }
          // optional trailing nlist: the centroid count of the exact
          // pruning pass (speed knob only — results are exact for any
          // value; scale it with the DISTINCT eval vector count)
          val nlist = rest.headOption match {
            case Some(Some(n: Long)) if n > 0 => n.toInt
            case None => 32
            case other => throw new LoweringException(
              s"$name: nlist must be a positive integer literal, got '$other'")
          }
          val c = lower(TableRef(corpus), ctx)
          val e = lower(TableRef(eval), ctx)
          Plain(
            if (name.toLowerCase == "contaminated_vecs")
              graft.operators.Decontamination
                .contaminatedVecs(c, idCol, vecCol, e, vecCol, t, nlist)
            else
              graft.operators.Decontamination
                .decontaminateSemantic(c, idCol, vecCol, e, vecCol, t, nlist))
        case _ =>
          throw new LoweringException(
            s"$name expects (corpus, eval, id_col, vec_col, threshold[, nlist]) literals, e.g. " +
              s"$name('embeddings', 'evalvecs', 'vec_id', 'embedding', 0.95)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "contamination_report_semantic" =>
      // contamination_report_semantic('corpus', 'eval', 'id_col',
      // 'vec_col', threshold[, nlist]) — the embedding-space audit
      // transpose (Decontamination.contaminationReportSemantic): per EVAL
      // row, how many corpus vectors sit within threshold cosine and the
      // closest one; zero rows kept. Shares contaminated_vecs' exact
      // centroid-pruned candidate machinery.
      args.map(constValue) match {
        case List(Some(corpus: String), Some(eval: String), Some(idCol: String),
            Some(vecCol: String), Some(thr: Number), rest @ _*)
            if rest.lengthCompare(1) <= 0 =>
          val nlist = rest.headOption match {
            case Some(Some(n: Long)) if n > 0 => n.toInt
            case None => 32
            case other => throw new LoweringException(
              s"contamination_report_semantic: nlist must be a positive integer " +
                s"literal, got '$other'")
          }
          Plain(graft.operators.Decontamination.contaminationReportSemantic(
            lower(TableRef(corpus), ctx), vecCol,
            lower(TableRef(eval), ctx), idCol, vecCol, thr.doubleValue(), nlist))
        case _ =>
          throw new LoweringException(
            "contamination_report_semantic expects (corpus, eval, id_col, vec_col, " +
              "threshold[, nlist]) literals, e.g. " +
              "contamination_report_semantic('corpusvecs', 'evalvecs', 'vec_id', " +
              "'embedding', 0.95)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "mix_by_temperature" =>
      // mix_by_temperature('corpus', 'domain_col', 'id_col', alpha) — the
      // GPT-3/PaLM multinomial temperature recipe: target composition
      // q_d ∝ p_d^alpha, realized as deterministic per-doc weights
      // q_d/p_d through weightedMix (Sampling.mixByTemperature)
      args.map(constValue) match {
        case List(Some(corpus: String), Some(domainCol: String),
            Some(idCol: String), Some(alpha: Number))
            if alpha.doubleValue() > 0.0 && alpha.doubleValue() <= 10.0 =>
          Plain(graft.operators.Sampling.mixByTemperature(
            lower(TableRef(corpus), ctx), domainCol, idCol, alpha.doubleValue()))
        case _ =>
          throw new LoweringException(
            "mix_by_temperature expects (corpus, domain_col, id_col, alpha in (0,10]) " +
              "literals, e.g. mix_by_temperature('documents', 'lang', 'doc_id', 0.5)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "weighted_mix" =>
      // weighted_mix('corpus', 'domain_col', 'id_col', 'en:1.5,de:0.75')
      // — deterministic domain-weighted corpus mixing
      // (operators/Sampling.weightedMix); weights are a 'domain:w' list
      // (table-function args are scalar literals)
      args.map(constValue) match {
        case List(Some(corpus: String), Some(domainCol: String),
            Some(idCol: String), Some(spec: String)) =>
          val weights = spec.split(",").map(_.trim).filter(_.nonEmpty).map { kv =>
            kv.split(":") match {
              case Array(d, w) =>
                d.trim -> (try w.trim.toDouble
                catch {
                  case _: NumberFormatException => throw new LoweringException(
                    s"weighted_mix: bad weight '${w.trim}' in entry '$kv' (expected a number)")
                })
              case _ => throw new LoweringException(
                s"weighted_mix: bad weight entry '$kv' (expected domain:weight)")
            }
          }.toMap
          Plain(graft.operators.Sampling.weightedMix(
            lower(TableRef(corpus), ctx), domainCol, idCol, weights))
        case _ =>
          throw new LoweringException(
            "weighted_mix expects (corpus, domain_col, id_col, weights) literals, e.g. " +
              "weighted_mix('documents', 'lang', 'doc_id', 'en:1.5,de:0.75')")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "pack_sequences" =>
      // pack_sequences('corpus', 'id_col', 'text_col', budget[, shards
      // [, 'vocab_rel']]) — GPT-style packing coordinates
      // (operators/Packing.scala); with a vocab relation the budget unit
      // is BPE tokens (operators/Bpe.scala) instead of regex words
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(budget: Long)) =>
          Plain(graft.operators.Packing.packSequences(
            lower(TableRef(corpus), ctx), idCol, textCol, budget.toInt))
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(budget: Long), Some(shards: Long)) =>
          Plain(graft.operators.Packing.packSequences(
            lower(TableRef(corpus), ctx), idCol, textCol, budget.toInt, shards.toInt))
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(budget: Long), Some(shards: Long), Some(vocabRel: String)) =>
          val vocab = graft.operators.Bpe.loadVocab(lower(TableRef(vocabRel), ctx))
          Plain(graft.operators.Packing.packSequences(
            lower(TableRef(corpus), ctx), idCol, textCol, budget.toInt, shards.toInt,
            tokenCounter = Some(graft.operators.Bpe.counter(vocab))))
        case _ =>
          throw new LoweringException(
            "pack_sequences expects (corpus, id_col, text_col, budget[, shards" +
              "[, vocab_rel]]) literals")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "bpe_count" =>
      // bpe_count('corpus', 'text_col', 'vocab_rel') — corpus +
      // n_bpe_tokens: byte-level greedy longest-match token counts against
      // the vocab relation's `token` column (operators/Bpe.scala,
      // functions/BpeExpressions.scala). Null text counts 0 (the shared
      // counter convention).
      args.map(constValue) match {
        case List(Some(corpus: String), Some(textCol: String), Some(vocabRel: String)) =>
          val vocab = graft.operators.Bpe.loadVocab(lower(TableRef(vocabRel), ctx))
          val df = lower(TableRef(corpus), ctx)
          Plain(df.withColumn("n_bpe_tokens",
            F.when(F.col(textCol).isNull, F.lit(0L))
              .otherwise(graft.functions.BpeExpressions.bpeCount(F.col(textCol), vocab))))
        case _ =>
          throw new LoweringException(
            "bpe_count expects (corpus, text_col, vocab_rel) literals — vocab_rel " +
              "is a relation with a `token` string column, e.g. " +
              "bpe_count('documents', 'text', 'my_vocab')")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "bpe_count_merges" =>
      // bpe_count_merges('corpus', 'text_col', 'merges_rel') — corpus +
      // n_bpe_merge_tokens: TRUE rank-ordered BPE inference
      // (Bpe.withMergeCount, functions/BpeMergeCountExpr) replaying the
      // merges relation (bpe_train's (left, right, rank) shape) within each
      // canonical word. Greedy bpe_count approximates this from the vocab
      // alone; this is the exact count when the merge list exists.
      args.map(constValue) match {
        case List(Some(corpus: String), Some(textCol: String), Some(mergesRel: String),
            rest @ _*) if rest.lengthCompare(1) <= 0 =>
          // optional trailing pretok mode: 'gpt2' replays merges within
          // GPT-2 pre-tokens (MUST match the mode the merges were trained
          // with — a mismatched stream silently segments differently)
          val pretok = rest.headOption match {
            case Some(Some(p: String)) if p == "gpt2" || p == "words" => p
            case None => "words"
            case other => throw new LoweringException(
              s"bpe_count_merges: pretok must be 'gpt2' or 'words', got '$other'")
          }
          val merges = graft.operators.Bpe.loadMerges(lower(TableRef(mergesRel), ctx))
          Plain(graft.operators.Bpe.withMergeCount(
            lower(TableRef(corpus), ctx), textCol, merges, pretok = pretok))
        case _ =>
          throw new LoweringException(
            "bpe_count_merges expects (corpus, text_col, merges_rel[, 'gpt2'|'words']) " +
              "literals — merges_rel has (left, right, rank) columns (bpe_train's " +
              "output), e.g. bpe_count_merges('documents', 'text', 'my_merges')")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "bpe_encode" =>
      // bpe_encode('corpus', 'id_col', 'text_col', 'merges_rel'
      // [, 'gpt2'|'words']) — the actual TOKENIZE surface (Bpe.encode):
      // (id, bpe_tokens array<string>, n_bpe_tokens) under rank-ordered
      // merge replay — what ships to training after bpe_train. The pretok
      // mode MUST match the one the merges were trained with.
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(mergesRel: String), rest @ _*) if rest.lengthCompare(1) <= 0 =>
          val pretok = rest.headOption match {
            case Some(Some(p: String)) if p == "gpt2" || p == "words" => p
            case None => "words"
            case other => throw new LoweringException(
              s"bpe_encode: pretok must be 'gpt2' or 'words', got '$other'")
          }
          val merges = graft.operators.Bpe.loadMerges(lower(TableRef(mergesRel), ctx))
          Plain(graft.operators.Bpe.encode(
            lower(TableRef(corpus), ctx), idCol, textCol, merges, pretok))
        case _ =>
          throw new LoweringException(
            "bpe_encode expects (corpus, id_col, text_col, merges_rel" +
              "[, 'gpt2'|'words']) literals — merges_rel has (left, right, rank) " +
              "columns (bpe_train's output), e.g. " +
              "bpe_encode('documents', 'doc_id', 'text', 'my_merges')")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "bm25_topk" =>
      // bm25_topk('corpus', 'id_col', 'text_col', 'queries_rel', k[, k1, b])
      // — Okapi BM25 retrieval (operators/Retrieval.bm25TopK): per query
      // doc, the k corpus docs with the highest lexical relevance — the
      // retrieval-based contamination/data-selection net. The queries
      // relation shares the id/text column names (a planted model or an
      // eval table); query terms are DISTINCT (qtf = 1).
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(queriesRel: String), Some(k: Long), rest @ _*)
            if k >= 1 && rest.lengthCompare(2) <= 0 =>
          def num(v: Option[Any], what: String, dflt: Double): Double = v match {
            case Some(d: java.lang.Double) => d.doubleValue()
            case Some(n: Number) => n.doubleValue()
            case None => dflt
            case other => throw new LoweringException(
              s"bm25_topk: $what must be a number literal, got '$other'")
          }
          val k1 = num(rest.headOption.flatten, "k1", 1.2)
          val b = num(rest.drop(1).headOption.flatten, "b", 0.75)
          Plain(graft.operators.Retrieval.bm25TopK(
            lower(TableRef(corpus), ctx), idCol, textCol,
            lower(TableRef(queriesRel), ctx), idCol, textCol, k.toInt, k1, b))
        case _ =>
          throw new LoweringException(
            "bm25_topk expects (corpus, id_col, text_col, queries_rel, k[, k1, b]) " +
              "literals, e.g. bm25_topk('documents', 'doc_id', 'text', 'evalset', 5)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "bm25_index" =>
      // bm25_index('corpus', 'id_col', 'text_col', '/out/path') — WRITES
      // the persisted BM25 index (tok_grp-partitioned postings + "_df" +
      // "_meta" siblings; Retrieval.writeBm25Index — a three-output write
      // a plain CTAS cannot express) and returns a 1-row summary. Query
      // the path with bm25_topk_index(...). Analysis-only contexts get the
      // summary schema with no rows (the ann_pq_index contract).
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(path: String)) =>
          val s = ctx.spark
          import s.implicits._
          if (ctx.analysisOnly)
            Plain(Seq.empty[(String, Long)].toDF("path", "postings"))
          else {
            graft.operators.Retrieval.writeBm25Index(
              lower(TableRef(corpus), ctx), idCol, textCol, path)
            val n = ctx.spark.read.parquet(path).count()
            Plain(Seq((path, n)).toDF("path", "postings"))
          }
        case _ =>
          throw new LoweringException(
            "bm25_index expects (corpus, id_col, text_col, out_path) literals, " +
              "e.g. bm25_index('documents', 'doc_id', 'text', '/tmp/bm25_idx')")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "bm25_index_append" =>
      // bm25_index_append('/index/path', 'batch', 'id_col', 'text_col') —
      // INCREMENTAL maintenance of a persisted BM25 index
      // (Retrieval.bm25IndexAppend): the batch's postings are appended
      // into their tok_grp partitions and the _df/_meta siblings advance
      // by exact arithmetic, so serving over the appended index is
      // bitwise a full rebuild over corpus ∪ batch — without re-reading
      // the corpus (cost scales with |batch|). Returns the bm25_index
      // 1-row summary over the updated index; analysis-only contexts get
      // the summary schema with no rows (the bm25_index contract).
      lowerBm25IndexAppend(args, ctx)

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "bm25_topk_index" =>
      // bm25_topk_index('/index/path', 'queries_rel', 'id_col', 'text_col',
      // k[, k1, b]) — BM25 over the PERSISTED index written by
      // bm25_index(...): the postings scan is partition-pruned to the
      // query terms' buckets; results are bitwise the flat bm25_topk's.
      args.map(constValue) match {
        case List(Some(path: String), Some(queriesRel: String), Some(idCol: String),
            Some(textCol: String), Some(k: Long), rest @ _*)
            if k >= 1 && rest.lengthCompare(2) <= 0 =>
          def num(v: Option[Any], what: String, dflt: Double): Double = v match {
            case Some(d: java.lang.Double) => d.doubleValue()
            case Some(n: Number) => n.doubleValue()
            case None => dflt
            case other => throw new LoweringException(
              s"bm25_topk_index: $what must be a number literal, got '$other'")
          }
          val k1 = num(rest.headOption.flatten, "k1", 1.2)
          val b = num(rest.drop(1).headOption.flatten, "b", 0.75)
          try ctx.spark.read.parquet(path + "_meta").schema
          catch {
            case e: org.apache.spark.sql.AnalysisException =>
              throw new LoweringException(
                s"bm25_topk_index expects a path to a persisted BM25 index " +
                  s"(postings at '$path' plus '_df'/'_meta' siblings — write them " +
                  s"with bm25_index / Retrieval.writeBm25Index) — ${e.getMessage}")
          }
          Plain(graft.operators.Retrieval.bm25IndexTopK(
            ctx.spark, path, lower(TableRef(queriesRel), ctx), idCol, textCol,
            k.toInt, k1, b))
        case _ =>
          throw new LoweringException(
            "bm25_topk_index expects (index_path, queries_rel, id_col, text_col, k" +
              "[, k1, b]) literals, e.g. bm25_topk_index('/tmp/bm25_idx', 'evalset', " +
              "'doc_id', 'text', 5)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "keywords_tfidf" =>
      // keywords_tfidf('corpus', 'id_col', 'text_col'[, k]) — per-doc
      // top-k tf-idf terms (Retrieval.keywordsTfidf): the classic
      // doc-labeling/boilerplate-spotting view; idf = ln(N/df), ties
      // (tfidf desc, token).
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            rest @ _*) if rest.lengthCompare(1) <= 0 =>
          val k = rest.headOption match {
            case Some(Some(n: Long)) if n >= 1 => n.toInt
            case None => 5
            case other => throw new LoweringException(
              s"keywords_tfidf: k must be a positive integer literal, got '$other'")
          }
          Plain(graft.operators.Retrieval.keywordsTfidf(
            lower(TableRef(corpus), ctx), idCol, textCol, k))
        case _ =>
          throw new LoweringException(
            "keywords_tfidf expects (corpus, id_col, text_col[, k]) literals, " +
              "e.g. keywords_tfidf('documents', 'doc_id', 'text', 5)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "bpe_stats" =>
      // bpe_stats('corpus', 'text_col', 'vocab_rel') — tokenizer-fitness
      // report (operators/Bpe.withStats): corpus + n_bpe_tokens / n_bytes /
      // fallback_bytes (OOV byte mass) / n_words / bpe_coverage / fertility
      // — the decide-before-you-train numbers for a vocab on a corpus
      args.map(constValue) match {
        case List(Some(corpus: String), Some(textCol: String), Some(vocabRel: String)) =>
          val vocab = graft.operators.Bpe.loadVocab(lower(TableRef(vocabRel), ctx))
          Plain(graft.operators.Bpe.withStats(lower(TableRef(corpus), ctx), textCol, vocab))
        case _ =>
          throw new LoweringException(
            "bpe_stats expects (corpus, text_col, vocab_rel) literals — vocab_rel " +
              "is a relation with a `token` string column, e.g. " +
              "bpe_stats('documents', 'text', 'my_vocab')")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "dedup_bloom" =>
      // dedup_bloom('corpus', 'id_col', 'text_col'[, fpp[, expected_items]])
      // — bloom-pruned EXACT dedup (operators/Dedup.bloomExactGroups): a
      // "seen-twice" bloom pair routes definitively-unique rows around the
      // shuffle; only bloom hits go through the exact groupBy recheck.
      // Same rows as exact dedup for ANY fpp/sizing (the bloom only
      // prunes); expected_items overrides the plan-statistics row estimate
      // the bloom is sized from (never a count job either way). Analysis-
      // only contexts get the schema through the lazy exact plan — the
      // eager bloom build must not run on a compile/LSP/docs probe.
      lowerDedupBloom(args, ctx)

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "dedup_bloom_against" =>
      // dedup_bloom_against('corpus', 'batch', 'id_col', 'text_col'
      // [, fpp[, expected_items]]) — exact INCREMENTAL dedup of a new
      // batch against an existing corpus (Dedup.bloomDedupAgainst): a
      // corpus-membership bloom prunes the batch, an exact broadcast
      // recheck kills the false positives; the corpus is scanned twice,
      // shuffled never. expected_items overrides the plan-statistics
      // sizing estimate (results identical either way). Analysis-only
      // contexts get the schema through the lazy exact join — the eager
      // bloom build must not run on a compile/LSP/docs probe.
      // Output per batch row: (id, is_dup, dup_of).
      lowerDedupBloomAgainst(args, ctx)

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "dedup_bloom_index" =>
      // dedup_bloom_index('corpus', 'id_col', 'text_col', '/out/path'
      // [, fpp[, expected_items]]) — persist the corpus-membership bloom
      // as a durable APPENDABLE artifact (Dedup.writeBloomIndex): one
      // parquet row (bloom, n, num_bits, fpp). Recurring crawls probe it
      // via dedup_bloom_against_index without rebuilding the filter and
      // maintain it via dedup_bloom_index_append. Analysis-only contexts
      // get the summary schema with no rows.
      lowerDedupBloomIndex(args, ctx)

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "dedup_bloom_index_append" =>
      // dedup_bloom_index_append('/index/path', 'batch', 'id_col',
      // 'text_col') — merge the batch's fingerprints into the persisted
      // bloom (Dedup.bloomIndexAppend): one batch-sized scan, no corpus
      // re-read; same-shape OR is lossless, so the appended filter equals
      // a fresh build over corpus ∪ batch at the stored shape.
      lowerDedupBloomIndexAppend(args, ctx)

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "dedup_bloom_against_index" =>
      // dedup_bloom_against_index('/index/path', 'corpus', 'batch',
      // 'id_col', 'text_col') — dedup_bloom_against probing the PERSISTED
      // bloom (Dedup.bloomDedupAgainstIndex): the filter is read back (one
      // driver row), the exact recheck broadcasts candidates against the
      // recheck corpus. Output per batch row: (id, is_dup, dup_of).
      lowerDedupBloomAgainstIndex(args, ctx)

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "dedup_spans" =>
      // dedup_spans('corpus', 'id_col', 'text_col'[, span_len, min_docs])
      // — exact-substring dedup (operators/Dedup.spanDedup): masks token
      // spans repeated across >= min_docs documents
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String)) =>
          Plain(graft.operators.Dedup.spanDedup(
            lower(TableRef(corpus), ctx), idCol, textCol))
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(spanLen: Long), Some(minDocs: Long)) =>
          Plain(graft.operators.Dedup.spanDedup(
            lower(TableRef(corpus), ctx), idCol, textCol, spanLen.toInt, minDocs.toInt))
        case _ =>
          throw new LoweringException(
            "dedup_spans expects (corpus, id_col, text_col[, span_len, min_docs]) " +
              "literals, e.g. dedup_spans('documents', 'doc_id', 'text', 8, 2)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "dedup_phash" =>
      // dedup_phash('corpus', 'id_col', 'image_col'[, hamming_r]) —
      // near-duplicate IMAGE pairs via DCT perceptual hash
      // (Dedup.phashPairs): one javax.imageio decode pass to a 63-bit
      // pHash per asset, then the simhash family's chunk-pair-blocked
      // candidate join — exact recall within hamming_r below the bucket
      // cap, no cartesian. Output (id_a, id_b, hamming).
      lowerDedupPhash(args, ctx)

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "dedup_phash_against" =>
      // dedup_phash_against('corpus', 'batch', 'id_col', 'image_col'
      // [, hamming_r]) — INCREMENTAL image dedup (Dedup.phashAgainst):
      // near-dup links from a new image batch into the static corpus via
      // single-chunk pigeonhole blocking over the pHash — exact recall
      // within hamming_r below the bucket cap, no cartesian. Output
      // (batch_id, corpus_id, hamming).
      lowerDedupPhashAgainst(args, ctx)

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "ann_int8_index_append" =>
      // ann_int8_index_append('/index/path', 'batch', 'id_col', 'vec_col')
      // — INCREMENTAL maintenance of a persisted int8 ANN index
      // (Similarity.int8IndexAppend): per-row-deterministic quantization
      // makes the appended index row-identical to a full rebuild; the
      // corpus is never re-read. Returns a 1-row summary; analysis-only
      // contexts get the summary schema with no rows.
      lowerInt8IndexAppend(args, ctx)

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "ann_pq_index_append" =>
      // ann_pq_index_append('/index/path', 'batch', 'id_col', 'vec_col') —
      // INCREMENTAL maintenance of a persisted PQ index with the FROZEN
      // persisted codebook (Similarity.pqIndexAppend — the FAISS add()
      // semantic: a rebuild would reseed the codebook; the incremental
      // contract is corpus ∪ batch encoded with the base corpus'
      // codebook). Returns a 1-row summary; analysis-only contexts get
      // the summary schema with no rows.
      lowerPqIndexAppend(args, ctx)

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "dedup_semantic" =>
      // dedup_semantic('corpus', 'id_col', 'vec_col'[, nlist, threshold])
      // — SemDeDup (operators/Dedup.semDedup): keeps one representative per
      // within-cluster semantic-duplicate group
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(vecCol: String)) =>
          Plain(graft.operators.Dedup.semDedup(
            lower(TableRef(corpus), ctx), idCol, vecCol))
        case List(Some(corpus: String), Some(idCol: String), Some(vecCol: String),
            Some(nlist: Long), Some(threshold)) =>
          val t = threshold match {
            case d: java.lang.Double => d.doubleValue()
            case n: Number => n.doubleValue()
            case other => throw new LoweringException(
              s"dedup_semantic: threshold must be a number, got '$other'")
          }
          Plain(graft.operators.Dedup.semDedup(
            lower(TableRef(corpus), ctx), idCol, vecCol, nlist.toInt, t))
        case _ =>
          throw new LoweringException(
            "dedup_semantic expects (corpus, id_col, vec_col[, nlist, threshold]) " +
              "literals, e.g. dedup_semantic('embeddings', 'vec_id', 'embedding', 32, 0.9)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "split_by_cluster" =>
      // split_by_cluster('corpus', 'id_col', 'text_col', train_fraction
      //   [, jaccard_threshold]) — leakage-safe train/test split
      // (operators/Sampling.splitByCluster): verified near-dup clusters
      // (exact n-gram Jaccard pairs → connected components) land whole in
      // one split; the assignment is the deterministic md5 threshold on
      // the cluster-representative id
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(frac)) =>
          val f = frac match {
            case d: java.lang.Double => d.doubleValue()
            case n: Number => n.doubleValue()
            case other => throw new LoweringException(
              s"split_by_cluster: train_fraction must be a number, got '$other'")
          }
          val docs = lower(TableRef(corpus), ctx)
          val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, idCol, textCol,
            n = 2, threshold = 0.12)
          Plain(graft.operators.Sampling.splitByCluster(docs, idCol, pairs, f))
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(frac), Some(thr)) =>
          def num(v: Any, what: String): Double = v match {
            case d: java.lang.Double => d.doubleValue()
            case n: Number => n.doubleValue()
            case other => throw new LoweringException(
              s"split_by_cluster: $what must be a number, got '$other'")
          }
          val docs = lower(TableRef(corpus), ctx)
          val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, idCol, textCol,
            n = 2, threshold = num(thr, "jaccard_threshold"))
          Plain(graft.operators.Sampling.splitByCluster(docs, idCol, pairs,
            num(frac, "train_fraction")))
        case _ =>
          throw new LoweringException(
            "split_by_cluster expects (corpus, id_col, text_col, train_fraction" +
              "[, jaccard_threshold]) literals, e.g. " +
              "split_by_cluster('documents', 'doc_id', 'text', 0.8, 0.12). " +
              "NOTE: an aggressive jaccard_threshold can percolate the near-dup " +
              "graph into one giant cluster whose single draw swings the realized " +
              "train fraction — check split_by_cluster_stats(...) (max_cluster_size, " +
              "frac_delta), and prefer split_by_cluster_pairs(...) to reuse pairs " +
              "the pipeline already verified")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "split_by_cluster_pairs" =>
      // split_by_cluster_pairs('corpus', 'id_col', 'pairs', train_fraction)
      // — the leakage-safe split over a PRECOMPUTED pair relation (a model
      // or table with id_a/id_b columns: dedup_* output, a persisted
      // minhash-index pair dump, or any verified near-dup list). At 100 TB
      // pair discovery is days of work — this form never re-runs it, and
      // the corpus is scanned exactly once (the label left join).
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(pairsRel: String),
            Some(frac)) =>
          val f = frac match {
            case d: java.lang.Double => d.doubleValue()
            case n: Number => n.doubleValue()
            case other => throw new LoweringException(
              s"split_by_cluster_pairs: train_fraction must be a number, got '$other'")
          }
          val pairs = lower(TableRef(pairsRel), ctx)
          val cols = pairs.columns.map(_.toLowerCase).toSet
          if (!cols.contains("id_a") || !cols.contains("id_b"))
            throw new LoweringException(
              s"split_by_cluster_pairs: relation '$pairsRel' must have id_a and " +
                s"id_b columns (got ${pairs.columns.mkString(", ")})")
          Plain(graft.operators.Sampling.splitByCluster(
            lower(TableRef(corpus), ctx), idCol, pairs, f))
        case _ =>
          throw new LoweringException(
            "split_by_cluster_pairs expects (corpus, id_col, pairs, train_fraction) " +
              "literals where pairs names a relation with id_a/id_b columns, e.g. " +
              "split_by_cluster_pairs('documents', 'doc_id', 'dup_pairs', 0.8)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "split_by_cluster_pairs_stats" =>
      // split_by_cluster_pairs_stats('corpus', 'id_col', 'pairs', frac) —
      // the percolation-guard statistics over a PRECOMPUTED pair relation
      // (the split_by_cluster_stats twin of split_by_cluster_pairs)
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(pairsRel: String),
            Some(frac)) =>
          val f = frac match {
            case d: java.lang.Double => d.doubleValue()
            case n: Number => n.doubleValue()
            case other => throw new LoweringException(
              s"split_by_cluster_pairs_stats: train_fraction must be a number, got '$other'")
          }
          val pairs = lower(TableRef(pairsRel), ctx)
          val cols = pairs.columns.map(_.toLowerCase).toSet
          if (!cols.contains("id_a") || !cols.contains("id_b"))
            throw new LoweringException(
              s"split_by_cluster_pairs_stats: relation '$pairsRel' must have id_a and " +
                s"id_b columns (got ${pairs.columns.mkString(", ")})")
          Plain(graft.operators.Sampling.splitByClusterStats(
            lower(TableRef(corpus), ctx), idCol, pairs, f))
        case _ =>
          throw new LoweringException(
            "split_by_cluster_pairs_stats expects (corpus, id_col, pairs, " +
              "train_fraction) literals where pairs names a relation with id_a/id_b " +
              "columns, e.g. split_by_cluster_pairs_stats('documents', 'doc_id', 'dup_pairs', 0.8)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "split_by_cluster_stats" =>
      // split_by_cluster_stats('corpus', 'id_col', 'text_col', train_fraction
      //   [, jaccard_threshold]) — one row of cluster/assignment statistics
      // for the SAME inputs as split_by_cluster (Sampling.splitByClusterStats):
      // the percolation guard — a max_cluster_size that is a material share
      // of n_docs, or a frac_delta far from 0, means the pair threshold is
      // percolating the near-dup graph and the split needs a stricter one.
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(frac), rest @ _*) if rest.lengthCompare(1) <= 0 =>
          def num(v: Any, what: String): Double = v match {
            case d: java.lang.Double => d.doubleValue()
            case n: Number => n.doubleValue()
            case other => throw new LoweringException(
              s"split_by_cluster_stats: $what must be a number, got '$other'")
          }
          val thr = rest.headOption match {
            case Some(Some(t)) => num(t, "jaccard_threshold")
            case None => 0.12
            case other => throw new LoweringException(
              s"split_by_cluster_stats: jaccard_threshold must be a number, got '$other'")
          }
          val docs = lower(TableRef(corpus), ctx)
          val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, idCol, textCol,
            n = 2, threshold = thr)
          Plain(graft.operators.Sampling.splitByClusterStats(docs, idCol, pairs,
            num(frac, "train_fraction")))
        case _ =>
          throw new LoweringException(
            "split_by_cluster_stats expects (corpus, id_col, text_col, train_fraction" +
              "[, jaccard_threshold]) literals, e.g. " +
              "split_by_cluster_stats('documents', 'doc_id', 'text', 0.8, 0.12)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "minhash_index" =>
      // minhash_index('corpus', 'id_col', 'text_col'[, num_hashes, shingle])
      // — offline build of the persisted MinHash signature index
      // (operators/Dedup.buildMinhashIndex): (id, sig array<long>), meant to
      // be CTAS'd; later batches dedupe against it without re-shingling the
      // corpus (dedup_incremental)
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String)) =>
          Plain(graft.operators.Dedup.buildMinhashIndex(
            lower(TableRef(corpus), ctx), idCol, textCol))
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(k: Long), Some(sh: Long)) =>
          Plain(graft.operators.Dedup.buildMinhashIndex(
            lower(TableRef(corpus), ctx), idCol, textCol, k.toInt, sh.toInt))
        case _ =>
          throw new LoweringException(
            "minhash_index expects (corpus, id_col, text_col[, num_hashes, shingle]) " +
              "literals, e.g. minhash_index('documents', 'doc_id', 'text', 64, 2)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "minhash_index_append" =>
      // minhash_index_append('/index/path', 'batch', 'id_col', 'text_col'
      // [, num_hashes, shingle]) — INCREMENTAL maintenance of a persisted
      // MinHash index (Dedup.minhashIndexAppend): the batch's signature
      // rows (payload columns riding along) append to the index parquet —
      // row-identical to a full rebuild over corpus ∪ batch, corpus never
      // re-read. Returns a 1-row summary; analysis-only contexts get the
      // summary schema with no rows (the bm25_index contract).
      lowerMinhashIndexAppend(args, ctx)

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        (name.toLowerCase == "dedup_incremental" ||
         name.toLowerCase == "dedup_incremental_pairs") =>
      // dedup_incremental[_pairs]('batch', 'index', 'id_col', 'text_col'
      //   [, threshold, num_hashes, bands, shingle])
      // — incremental dedup of a NEW batch against a persisted minhash_index
      // (file path or table): _pairs returns the (batch_id, corpus_id,
      // est_jaccard) links; the plain form returns the batch rows with no
      // near-dup in the corpus. (num_hashes, shingle) MUST match the index
      // build (mismatched probes hash different band keys and find nothing).
      {
        val pairsOnly = name.toLowerCase.endsWith("_pairs")
        def run(batch: String, index: String, idCol: String, textCol: String,
            t: Double, k: Int, b: Int, sh: Int): LRes = {
          val batchDf = lower(TableRef(batch), ctx)
          val idxDf = lower(TableRef(index), ctx)
          if (pairsOnly)
            Plain(graft.operators.Dedup.minhashIndexPairs(
              batchDf, idCol, textCol, idxDf, t, k, b, sh))
          else
            Plain(graft.operators.Dedup.dedupAgainstMinhashIndex(
              batchDf, idCol, textCol, idxDf, t, k, b, sh))
        }
        args.map(constValue) match {
          case List(Some(batch: String), Some(index: String),
              Some(idCol: String), Some(textCol: String)) =>
            run(batch, index, idCol, textCol, 0.5, 64, 16, 2)
          case List(Some(batch: String), Some(index: String),
              Some(idCol: String), Some(textCol: String), Some(threshold),
              Some(k: Long), Some(b: Long), Some(sh: Long)) =>
            val t = threshold match {
              case n: Number => n.doubleValue()
              case other => throw new LoweringException(
                s"$name: threshold must be a number, got '$other'")
            }
            run(batch, index, idCol, textCol, t, k.toInt, b.toInt, sh.toInt)
          case _ =>
            throw new LoweringException(
              s"$name expects (batch, index, id_col, text_col[, threshold, " +
                s"num_hashes, bands, shingle]) literals, e.g. " +
                s"$name('new_docs', '/data/minhash_idx.parquet', 'doc_id', 'text', 0.5, 64, 16, 2)")
        }
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "jdbc" =>
      // jdbc('url', 'table') — single-stream remote read; or the parallel
      // form jdbc('url', 'table', partition_col, num_parts, lower, upper)
      // (sources/Jdbc.readPartitioned: bounded-range queries per task — the
      // scale path for fact-table ingest). The reference reaches external
      // databases through its connector layer (wvlet-connector
      // DBConnector.scala); here they are Spark JDBC data sources with
      // filter/column pushdown into the remote query.
      args.map(constValue) match {
        case List(Some(url: String), Some(table: String)) =>
          Plain(graft.sources.Jdbc.read(ctx.spark, url, table))
        case List(Some(url: String), Some(table: String), Some(pc: String),
            Some(np: Long), Some(lo: Long), Some(hi: Long)) =>
          Plain(graft.sources.Jdbc.readPartitioned(
            ctx.spark, url, table, pc, np.toInt, lo, hi))
        case _ =>
          throw new LoweringException(
            "jdbc expects ('url', 'table') or ('url', 'table', partition_col, " +
              "num_partitions, lower, upper) literals")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "similarity_topk" =>
      // similarity_topk('corpus', 'id_col', 'vec_col', k[, method]) —
      // per-row cosine top-k neighbors (self-kNN join, self-matches
      // excluded). method: 'brute' (exact, O(n²) — small corpora/oracles),
      // 'lsh' | 'ivf' (the bucketed scale paths), 'int8' (quantized
      // scoring, on-the-fly — operators/Similarity.int8BruteForceTopK).
      // 'int8_index' | 'lsh_int8_index' read a PERSISTED quantized index
      // instead: vec_col is a pre-quantized array<tinyint> column (built
      // with ann_int8_index(...) and CTAS'd) — the float vector column is
      // never scanned (PlanSpec-gated pruning; the 4×-smaller-index I/O
      // saving is real, not just in-memory). Output:
      // query_id, corpus_id, cos_sim (cos_q8 for int8 methods), rank.
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(vecCol: String),
            Some(k: Long), rest @ _*) if rest.lengthCompare(3) <= 0 =>
          val method = rest.headOption match {
            case Some(Some(m: String)) => m.toLowerCase
            case None => "brute"
            case other => throw new LoweringException(
              s"similarity_topk: method must be a string literal, got '$other'")
          }
          // optional trailing args: (planes, tables) for the lsh-family
          // methods — they MUST match the values the index/postings were
          // built with (mismatched probes silently miss buckets) — or a
          // single train_sample integer for the trained-codebook methods
          // (Lloyd sample bound; default Similarity.PqTrainSampleDefault,
          // effectively min(16384, corpus))
          val trailing = rest.drop(1).toList
          val isTrainedMethod = method == "pq_trained" || method == "ivf_pq_trained"
          val trainSample: Int = trailing match {
            case List(Some(n: Long)) if isTrainedMethod && n >= 1 => n.toInt
            case List(x) if isTrainedMethod => throw new LoweringException(
              s"similarity_topk: '$method' takes an optional positive train_sample " +
                s"integer literal as its trailing arg, got '$x'")
            case _ => graft.operators.Similarity.PqTrainSampleDefault
          }
          val lshParams: Option[(Int, Int)] = trailing match {
            case Nil => None
            case List(Some(_: Long)) if isTrainedMethod => None
            case List(Some(p: Long), Some(t: Long)) => Some((p.toInt, t.toInt))
            case other => throw new LoweringException(
              s"similarity_topk: trailing args must be (planes, tables) integer " +
                s"literals (lsh methods) or a train_sample integer (trained " +
                s"methods), got '$other'")
          }
          val (planes, tables) = lshParams.getOrElse((10, 4))
          if (lshParams.isDefined && !method.startsWith("lsh"))
            throw new LoweringException(
              s"similarity_topk: (planes, tables) only apply to lsh methods, not '$method'")
          // LAZY: the path-based methods ('pq_index', 'lsh_int8_part') read
          // `corpus` as a parquet PATH — resolving it as a table name here
          // would prepend the base dir and fail before the match runs
          lazy val df = lower(TableRef(corpus), ctx)
          val sim = method match {
            case "brute" => graft.operators.Similarity.bruteForceTopK(
              df, idCol, vecCol, df, idCol, vecCol, k.toInt)
            case "lsh" => graft.operators.Similarity.lshTopK(
              df, idCol, vecCol, df, idCol, vecCol, k.toInt,
              planes = planes, tables = tables)
            case "ivf" => graft.operators.Similarity.ivfSeededTopK(
              df, idCol, vecCol, df, idCol, vecCol, k.toInt)
            case "ivf_pq" => graft.operators.Similarity.ivfPqTopK(
              df, idCol, vecCol, df, idCol, vecCol, k.toInt)
            case "ivf_pq_trained" => graft.operators.Similarity.ivfPqTopK(
              df, idCol, vecCol, df, idCol, vecCol, k.toInt,
              subspaces = graft.operators.Similarity.PqTrainedSubspaces,
              ksub = graft.operators.Similarity.PqTrainedKsub, trained = true,
              trainSample = trainSample)
            case "int8" => graft.operators.Similarity.int8BruteForceTopK(
              df, idCol, vecCol, df, idCol, vecCol, k.toInt)
            case "pq" => graft.operators.Similarity.pqTopK(
              df, idCol, vecCol, df, idCol, vecCol, k.toInt)
            case "pq_trained" =>
              // Lloyd-trained PQ32x8 codebook (Similarity.trainedPqCodebook)
              // — the production PQ tier: recall@5 ≥ 0.7 property-gated;
              // same serving plan as 'pq' (codes scan + per-query ADC table)
              graft.operators.Similarity.pqTopK(
                df, idCol, vecCol, df, idCol, vecCol, k.toInt,
                subspaces = graft.operators.Similarity.PqTrainedSubspaces,
                ksub = graft.operators.Similarity.PqTrainedKsub, trained = true,
                trainSample = trainSample)
            case "pq_index" =>
              // corpus must be a PATH to a persisted PQ index (written by
              // Similarity.writePqIndex: codes parquet + "_codebook"
              // sibling); vec_col names the CODES column. Self-kNN by
              // symmetric distance — no float column in the serving path.
              // Validated by the real contract — the codebook sibling must
              // be readable — not by path shape (a '/'-free relative path
              // is valid; a '/'-bearing table name is not; ADVICE r15).
              try ctx.spark.read.parquet(corpus + "_codebook").schema
              catch {
                case e: org.apache.spark.sql.AnalysisException =>
                  throw new LoweringException(
                    s"similarity_topk 'pq_index' expects a path to a persisted " +
                      s"PQ index: codes parquet at '$corpus' plus its codebook " +
                      s"sibling at '${corpus}_codebook' (write both with " +
                      s"ann_pq_index / Similarity.writePqIndex) — ${e.getMessage}")
              }
              val queries = ctx.spark.read.parquet(corpus)
                .dropDuplicates(idCol).select(F.col(idCol), F.col(vecCol))
              graft.operators.Similarity.pqIndexTopK(ctx.spark, corpus, idCol, vecCol,
                queries, idCol, vecCol, k.toInt)
            case "lsh_int8" => graft.operators.Similarity.lshTopK(
              df, idCol, vecCol, df, idCol, vecCol, k.toInt,
              planes = planes, tables = tables, int8Scoring = true)
            case "int8_index" => graft.operators.Similarity.int8IndexTopK(
              df, idCol, vecCol, df, idCol, vecCol, k.toInt)
            case "lsh_int8_index" => graft.operators.Similarity.lshTopKInt8Index(
              df, idCol, vecCol, df, idCol, vecCol, k.toInt,
              planes = planes, tables = tables)
            case "lsh_int8_part" =>
              // corpus must be a PATH to a bucket-partitioned posting index
              // (written from Similarity.lshInt8IndexPostings with
              // partitionBy("bucket_grp"), or the legacy bucket layout);
              // self-kNN queries are the index's
              // distinct (id, q8) rows, the scan is partition-pruned to the
              // probe buckets
              if (!corpus.matches("(?i).*\\.(parquet)$") && !corpus.contains("/"))
                throw new LoweringException(
                  "similarity_topk 'lsh_int8_part' expects a path to a " +
                    "bucket-partitioned posting index (see ann_int8_index + " +
                    "Similarity.lshInt8IndexPostings)")
              val queries = ctx.spark.read.parquet(corpus)
                .dropDuplicates(idCol).select(F.col(idCol), F.col(vecCol))
              graft.operators.Similarity.lshTopKPartitionedIndex(
                corpus, idCol, vecCol, queries, idCol, vecCol, k.toInt,
                planes = planes, tables = tables)
            case other => throw new LoweringException(
              s"similarity_topk: unknown method '$other' (expected brute, lsh, ivf, " +
                "int8, pq, pq_trained, pq_index, ivf_pq, ivf_pq_trained, lsh_int8, " +
                "int8_index, lsh_int8_index, lsh_int8_part)")
          }
          Plain(sim)
        case _ =>
          throw new LoweringException(
            "similarity_topk expects (corpus, id_col, vec_col, k[, method[, planes, " +
              "tables]]) literals, e.g. similarity_topk('embeddings', 'vec_id', " +
              "'embedding', 5, 'int8')")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "ann_int8_index" =>
      // ann_int8_index('corpus', 'id_col', 'vec_col') — one-pass build of
      // the persistable int8 ANN index (id, scale double, q8 array<tinyint>;
      // operators/Similarity.buildInt8Index). CTAS the result once, then
      // query it with similarity_topk(..., 'int8_index' | 'lsh_int8_index')
      // — subsequent scans read the 4×-smaller q8 column, never the floats.
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(vecCol: String)) =>
          Plain(graft.operators.Similarity.buildInt8Index(
            lower(TableRef(corpus), ctx), idCol, vecCol))
        case _ =>
          throw new LoweringException(
            "ann_int8_index expects (corpus, id_col, vec_col) literals, " +
              "e.g. ann_int8_index('embeddings', 'vec_id', 'embedding')")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "ann_pq_index" =>
      // ann_pq_index('corpus', 'id_col', 'vec_col', '/out/path'[, subspaces,
      // ksub]) — WRITES the persisted PQ index (payload-bearing codes
      // parquet + "_codebook" sibling; Similarity.writePqIndex — two
      // outputs, which a plain CTAS of a returned frame cannot express) and
      // returns a 1-row summary. Query the path with
      // similarity_topk('<path>', '<id_col>', 'codes', k, 'pq_index').
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(vecCol: String),
            Some(path: String)) =>
          Plain(pqIndexWriteSummary(ctx, corpus, idCol, vecCol, path, 16, 64,
            trained = false))
        case List(Some(corpus: String), Some(idCol: String), Some(vecCol: String),
            Some(path: String), Some(m: Long), Some(ks: Long), rest @ _*)
            if m >= 1 && ks >= 2 && rest.lengthCompare(2) <= 0 =>
          val trained = rest.headOption match {
            case Some(Some("trained")) => true
            case Some(Some("seeded")) | None => false
            case other => throw new LoweringException(
              s"ann_pq_index: codebook mode must be 'trained' or 'seeded', got '$other'")
          }
          // optional trailing Lloyd train_sample (trained mode only;
          // default Similarity.PqTrainSampleDefault = min(16384, corpus))
          val trainSample = rest.drop(1).headOption match {
            case Some(Some(n: Long)) if trained && n >= 1 => n.toInt
            case None => graft.operators.Similarity.PqTrainSampleDefault
            case other => throw new LoweringException(
              s"ann_pq_index: train_sample must be a positive integer literal " +
                s"following the 'trained' mode, got '$other'")
          }
          Plain(pqIndexWriteSummary(ctx, corpus, idCol, vecCol, path, m.toInt, ks.toInt,
            trained, trainSample))
        case _ =>
          throw new LoweringException(
            "ann_pq_index expects (corpus, id_col, vec_col, out_path[, subspaces, ksub" +
              "[, 'trained'|'seeded'[, train_sample]]]) literals, e.g. " +
              "ann_pq_index('embeddings', 'vec_id', 'embedding', '/tmp/pq_idx', 16, 64)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "ann_lsh_postings" =>
      // ann_lsh_postings('index', 'id_col', 'q8_col'[, planes, tables]) —
      // sign-bit bucket postings of a quantized index
      // (Similarity.lshInt8IndexPostings). CTAS the result with
      // `partition by bucket_grp`, then query it with
      // similarity_topk('<path>', 'id', 'q8', k, 'lsh_int8_part') for a
      // partition-pruned index lookup (defaults planes=10, tables=4 match
      // the query side's).
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(q8Col: String)) =>
          Plain(graft.operators.Similarity.lshInt8IndexPostings(
            lower(TableRef(corpus), ctx), idCol, q8Col))
        case List(Some(corpus: String), Some(idCol: String), Some(q8Col: String),
            Some(planes: Long), Some(tables: Long)) =>
          Plain(graft.operators.Similarity.lshInt8IndexPostings(
            lower(TableRef(corpus), ctx), idCol, q8Col, planes.toInt, tables.toInt))
        case _ =>
          throw new LoweringException(
            "ann_lsh_postings expects (index, id_col, q8_col[, planes, tables]) " +
              "literals, e.g. ann_lsh_postings('idx.parquet', 'vec_id', 'q8')")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "each_top_k" =>
      // each_top_k(relation, k, group_col, score_col) — the Hivemall UDTF
      // pattern (top-k rows per group by score) as a first-class table
      // function: all child columns + `rank`, rank <= k. Same semantics as
      // the SQL shim's window-rank rewrite (SqlDialect.convertEachTopK):
      // rank() keeps boundary ties, matching the SQL form. Relation and
      // column arguments take bare identifiers or string literals; the
      // relation resolves through the same rules as `from <name>`, so
      // tables, files, and in-scope models (subqueries via
      // `model m = { … }`) all work.
      def nameArg(e: Expr): Option[String] = e match {
        case StringLit(s) => Some(s)
        case Ident(n) => Some(n)
        case _ => None
      }
      args match {
        case List(relE, kE, grpE, scoreE) =>
          (nameArg(relE), constValue(kE), nameArg(grpE), nameArg(scoreE)) match {
            case (Some(rel), Some(k: Long), Some(grp), Some(score)) =>
              val df = lower(TableRef(rel), ctx)
              def resolve(c: String) = df.columns.find(_.equalsIgnoreCase(c)).getOrElse(
                throw new LoweringException(s"each_top_k: '$c' is not a column of $rel"))
              val w = org.apache.spark.sql.expressions.Window
                .partitionBy(F.col(resolve(grp))).orderBy(F.col(resolve(score)).desc)
              Plain(df.withColumn("rank", F.rank().over(w)).filter(F.col("rank") <= k))
            case _ =>
              throw new LoweringException(
                "each_top_k expects (relation, k, group_col, score_col), e.g. " +
                  "each_top_k(events, 3, event_type, value)")
          }
        case _ =>
          throw new LoweringException(
            "each_top_k expects (relation, k, group_col, score_col), e.g. " +
              "each_top_k(events, 3, event_type, value)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "token_stats" =>
      // token_stats('corpus', 'id_col', 'text_col') — per-doc corpus
      // token-frequency features (operators/CorpusStats.scala)
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String)) =>
          Plain(graft.operators.CorpusStats.tokenDocFrequencyFeatures(
            lower(TableRef(corpus), ctx), idCol, textCol))
        case _ =>
          throw new LoweringException(
            "token_stats expects (corpus, id_col, text_col) literals")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "select_token_budget" =>
      // select_token_budget('corpus', 'id_col', 'text_col', budget_tokens)
      // — deterministic token-budget prefix selection
      // (Sampling.selectTokenBudget): keep the md5-ordered corpus prefix
      // whose cumulative token count fits the budget (distributed
      // prefix-sum, no single-partition window)
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(budget: Long)) =>
          Plain(graft.operators.Sampling.selectTokenBudget(
            lower(TableRef(corpus), ctx), idCol, textCol, budget))
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(budget: Long), Some(vocabRel: String)) =>
          // optional vocab relation: the budget unit becomes BPE tokens
          val vocab = graft.operators.Bpe.loadVocab(lower(TableRef(vocabRel), ctx))
          Plain(graft.operators.Sampling.selectTokenBudget(
            lower(TableRef(corpus), ctx), idCol, textCol, budget,
            tokenCounter = Some(graft.operators.Bpe.counter(vocab))))
        case _ =>
          throw new LoweringException(
            "select_token_budget expects (corpus, id_col, text_col, budget_tokens" +
              "[, vocab_rel]) literals, e.g. " +
              "select_token_budget('documents', 'doc_id', 'text', 50000)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "select_token_budget_by" =>
      // select_token_budget_by('corpus', 'id_col', 'text_col', budget,
      // 'order_col'[, vocab_rel]) — the QUALITY-FIRST budget cut
      // (Sampling.selectTokenBudgetBy): keep the highest-`order_col` docs
      // whose cumulative token count fits the budget; range-bucketed
      // prefix-sum, boundary-independent output, no single-partition window
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(budget: Long), Some(orderCol: String)) =>
          Plain(graft.operators.Sampling.selectTokenBudgetBy(
            lower(TableRef(corpus), ctx), idCol, textCol, budget, orderCol))
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(budget: Long), Some(orderCol: String), Some(vocabRel: String)) =>
          val vocab = graft.operators.Bpe.loadVocab(lower(TableRef(vocabRel), ctx))
          Plain(graft.operators.Sampling.selectTokenBudgetBy(
            lower(TableRef(corpus), ctx), idCol, textCol, budget, orderCol,
            tokenCounter = Some(graft.operators.Bpe.counter(vocab))))
        case _ =>
          throw new LoweringException(
            "select_token_budget_by expects (corpus, id_col, text_col, budget_tokens, " +
              "order_col[, vocab_rel]) literals, e.g. " +
              "select_token_budget_by('documents', 'doc_id', 'text', 50000, 'quality')")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "bpe_train" =>
      // bpe_train('corpus', 'text_col', n_merges[, max_word_types
      // [, 'gpt2'|'words']]) — exact BPE merge learning
      // (BpeTrain.bpeTrain): ONE corpus scan to the word-frequency table,
      // then the incremental merge loop runs exactly over that bounded
      // table driver-side; deterministic lexicographic tie-break. The
      // optional pretok mode 'gpt2' segments with the GPT-2 pattern
      // (contractions, leading spaces, punctuation runs, case kept) so
      // trained vocabs match what HF tokenizers learn. Output (token,
      // pair_count, rank) feeds bpe_count / select_token_budget /
      // pack_sequences as their vocab_rel.
      args.map(constValue) match {
        case List(Some(corpus: String), Some(textCol: String), Some(n: Long)) =>
          Plain(graft.operators.BpeTrain.bpeTrain(
            lower(TableRef(corpus), ctx), textCol, n.toInt))
        case List(Some(corpus: String), Some(textCol: String), Some(n: Long),
            Some(maxTypes: Long)) =>
          Plain(graft.operators.BpeTrain.bpeTrain(
            lower(TableRef(corpus), ctx), textCol, n.toInt, maxTypes.toInt))
        case List(Some(corpus: String), Some(textCol: String), Some(n: Long),
            Some(maxTypes: Long), Some(pretok: String))
            if pretok == "gpt2" || pretok == "words" =>
          Plain(graft.operators.BpeTrain.bpeTrain(
            lower(TableRef(corpus), ctx), textCol, n.toInt, maxTypes.toInt, pretok))
        case _ =>
          throw new LoweringException(
            "bpe_train expects (corpus, text_col, n_merges[, max_word_types" +
              "[, 'gpt2'|'words']]) literals, e.g. bpe_train('documents', 'text', 200)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "build_vocab" =>
      // build_vocab('corpus', 'text_col', size) — deterministic top-K
      // token vocabulary (token, cnt, rank), rank by (count desc, token):
      // the builder whose output feeds bpe_count / select_token_budget /
      // pack_sequences as their vocab_rel (CorpusStats.buildVocab)
      args.map(constValue) match {
        case List(Some(corpus: String), Some(textCol: String), Some(size: Long))
            if size > 0 =>
          Plain(graft.operators.CorpusStats.buildVocab(
            lower(TableRef(corpus), ctx), textCol, size.toInt))
        case _ =>
          throw new LoweringException(
            "build_vocab expects (corpus, text_col, size) literals, e.g. " +
              "build_vocab('documents', 'text', 1000)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "top_ngrams" =>
      // top_ngrams('corpus', 'text_col', n, k) — heavy-hitter n-grams
      // (CorpusStats.topNgrams): the k most frequent space-joined n-grams,
      // (count desc, ngram) rank — the C4/Gopher boilerplate-template
      // discovery pass (feed offenders back as filters or dedup keys).
      args.map(constValue) match {
        case List(Some(corpus: String), Some(textCol: String), Some(n: Long),
            Some(k: Long)) if n >= 1 && n <= 8 && k > 0 =>
          Plain(graft.operators.CorpusStats.topNgrams(
            lower(TableRef(corpus), ctx), textCol, n.toInt, k.toInt))
        case _ =>
          throw new LoweringException(
            "top_ngrams expects (corpus, text_col, n in 1..8, k) literals, " +
              "e.g. top_ngrams('documents', 'text', 3, 25)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "vocab_profile" =>
      // vocab_profile('corpus', 'text_col'[, top_k]) — one-row Zipf health
      // profile (CorpusStats.vocabProfile): total/distinct/hapax token
      // counts + topK occurrence coverage
      args.map(constValue) match {
        case List(Some(corpus: String), Some(textCol: String)) =>
          Plain(graft.operators.CorpusStats.vocabProfile(
            lower(TableRef(corpus), ctx), textCol))
        case List(Some(corpus: String), Some(textCol: String), Some(k: Long)) if k > 0 =>
          Plain(graft.operators.CorpusStats.vocabProfile(
            lower(TableRef(corpus), ctx), textCol, k.toInt))
        case _ =>
          throw new LoweringException(
            "vocab_profile expects (corpus, text_col[, top_k]) literals, e.g. " +
              "vocab_profile('documents', 'text', 100)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "perplexity_score" =>
      // perplexity_score('corpus', 'id_col', 'text_col') — unigram-LM mean
      // negative log-likelihood per doc (CorpusStats.unigramNll): the
      // CCNet-style perplexity quality filter, model fit on the corpus
      // itself; cut high (rare-token garble) and low (boilerplate) tails
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String)) =>
          Plain(graft.operators.CorpusStats.unigramNll(
            lower(TableRef(corpus), ctx), idCol, textCol))
        case _ =>
          throw new LoweringException(
            "perplexity_score expects (corpus, id_col, text_col) literals, e.g. " +
              "perplexity_score('documents', 'doc_id', 'text')")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "perplexity_score_bigram" =>
      // perplexity_score_bigram('corpus', 'id_col', 'text_col'[, alpha,
      // min_count]) — bigram-LM mean NLL with Stupid Backoff
      // (CorpusStats.bigramNll): context-aware quality filter that catches
      // common-token word salad the unigram score cannot see; alpha is the
      // backoff penalty (0.4), min_count the bigram-model pruning
      // threshold (2 — what bounds the model table at scale AND keeps the
      // backoff branch live under self-fit)
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String)) =>
          Plain(graft.operators.CorpusStats.bigramNll(
            lower(TableRef(corpus), ctx), idCol, textCol))
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(alpha: Number)) if alpha.doubleValue() > 0.0 && alpha.doubleValue() <= 1.0 =>
          Plain(graft.operators.CorpusStats.bigramNll(
            lower(TableRef(corpus), ctx), idCol, textCol, alpha.doubleValue()))
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(alpha: Number), Some(minCount: Long))
            if alpha.doubleValue() > 0.0 && alpha.doubleValue() <= 1.0 && minCount >= 1 =>
          Plain(graft.operators.CorpusStats.bigramNll(
            lower(TableRef(corpus), ctx), idCol, textCol, alpha.doubleValue(), minCount))
        // 'kn' mode: interpolated Kneser-Ney (CorpusStats.bigramNllKn) —
        // the quality-reference smoothing next to web-scale Stupid
        // Backoff; the trailing numbers are (discount in (0,1), min_count)
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some("kn"), rest @ _*) if rest.lengthCompare(2) <= 0 =>
          val (discount, minCount) = rest.toList match {
            case Nil => (0.75, 2L)
            case List(Some(dd: Number))
                if dd.doubleValue() > 0.0 && dd.doubleValue() < 1.0 =>
              (dd.doubleValue(), 2L)
            case List(Some(dd: Number), Some(mc: Long))
                if dd.doubleValue() > 0.0 && dd.doubleValue() < 1.0 && mc >= 1 =>
              (dd.doubleValue(), mc)
            case other => throw new LoweringException(
              s"perplexity_score_bigram 'kn': trailing args must be (discount in " +
                s"(0,1)[, min_count >= 1]) literals, got '$other'")
          }
          Plain(graft.operators.CorpusStats.bigramNllKn(
            lower(TableRef(corpus), ctx), idCol, textCol, discount, minCount))
        case _ =>
          throw new LoweringException(
            "perplexity_score_bigram expects (corpus, id_col, text_col[, alpha in (0,1], " +
              "min_count >= 1]) or (corpus, id_col, text_col, 'kn'[, discount, " +
              "min_count]) literals, e.g. " +
              "perplexity_score_bigram('documents', 'doc_id', 'text', 0.4, 2)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "dsir_weight" =>
      // dsir_weight('corpus', 'id_col', 'text_col', 'target_rel'
      // [, 'target_text_col'][, 'unigram'|'bigram']) — DSIR log importance
      // weight (Sampling.dsirWeight): hashed-n-gram multinomials fit on
      // target and raw corpus, per-doc Σ ln(p_target/p_raw); 'bigram'
      // adds hashed adjacent pairs to the feature bag (the paper's
      // feature set). High = looks like the target; compose with
      // select_token_budget_by for the cut.
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(targetRel: String), rest @ _*) if rest.lengthCompare(2) <= 0 =>
          // a trailing 'unigram'/'bigram' literal is the feature mode; any
          // other single trailing string is the target text column. A
          // target column literally NAMED 'unigram'/'bigram' is shadowed
          // in the one-arg form — use the unambiguous two-arg form
          // (target_text_col, features), e.g. (..., 'unigram', 'unigram')
          val (targetText, feats) = rest.toList match {
            case Nil => (textCol, "unigram")
            case List(Some(f: String)) if f == "unigram" || f == "bigram" =>
              (textCol, f)
            case List(Some(t: String)) => (t, "unigram")
            case List(Some(t: String), Some(f: String))
                if f == "unigram" || f == "bigram" => (t, f)
            case other => throw new LoweringException(
              s"dsir_weight: trailing args must be ([target_text_col,] " +
                s"'unigram'|'bigram') literals, got '$other'. A single trailing " +
                "string equal to 'unigram'/'bigram' is always read as the feature " +
                "mode — for a target text column with that literal name, pass the " +
                "two-arg form (target_text_col, features)")
          }
          Plain(graft.operators.Sampling.dsirWeight(
            lower(TableRef(corpus), ctx), idCol, textCol,
            lower(TableRef(targetRel), ctx), targetText, feats))
        case _ =>
          throw new LoweringException(
            "dsir_weight expects (corpus, id_col, text_col, target_rel" +
              "[, target_text_col][, 'unigram'|'bigram']) literals, e.g. " +
              "dsir_weight('documents', 'doc_id', 'text', 'reference_docs')")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "dsir_sample" =>
      // dsir_sample('corpus', 'id_col', 'text_col', 'target_rel', k
      // [, 'seed'[, 'target_text_col']]) — DSIR's Gumbel-top-k importance
      // RESAMPLING (Sampling.dsirSample): keep the k docs with the largest
      // dsir_weight + seeded portable Gumbel noise (samples ∝ the
      // importance weights, without replacement). target_text_col defaults
      // to text_col (dsir_weight parity; positional after seed, so the two
      // string args never shadow each other).
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(targetRel: String), Some(k: Long), rest @ _*)
            if k > 0 && rest.lengthCompare(2) <= 0 =>
          val seed = rest.headOption match {
            case Some(Some(s: String)) => s
            case None => "dsir"
            case other => throw new LoweringException(
              s"dsir_sample: seed must be a string literal, got '$other'")
          }
          val targetText = rest.drop(1).headOption match {
            case Some(Some(t: String)) => t
            case None => textCol
            case other => throw new LoweringException(
              s"dsir_sample: target_text_col must be a string literal, got '$other'")
          }
          Plain(graft.operators.Sampling.dsirSample(
            lower(TableRef(corpus), ctx), idCol, textCol,
            lower(TableRef(targetRel), ctx), targetText, k.toInt, seed))
        case _ =>
          throw new LoweringException(
            "dsir_sample expects (corpus, id_col, text_col, target_rel, k" +
              "[, seed[, target_text_col]]) literals, e.g. dsir_sample('documents', " +
              "'doc_id', 'text', 'reference_docs', 100)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "prototypicality_score" =>
      // prototypicality_score('corpus', 'id_col', 'vec_col'[, nlist]) —
      // SSL-prototypes pruning metric (Similarity.prototypicalityScore):
      // cosine of each embedding to its own seeded-cluster prototype; high
      // = prototypical/easy, low = hard/outlier (Sorscher et al. 2022's
      // pruning axis).
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(vecCol: String),
            rest @ _*) if rest.lengthCompare(1) <= 0 =>
          val nlist = rest.headOption match {
            case Some(Some(n: Long)) if n > 0 => n.toInt
            case None => 32
            case other => throw new LoweringException(
              s"prototypicality_score: nlist must be a positive integer literal, got '$other'")
          }
          Plain(graft.operators.Similarity.prototypicalityScore(
            lower(TableRef(corpus), ctx), idCol, vecCol, nlist))
        case _ =>
          throw new LoweringException(
            "prototypicality_score expects (corpus, id_col, vec_col[, nlist]) " +
              "literals, e.g. prototypicality_score('embeddings', 'vec_id', 'embedding', 32)")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "quality_classifier_score" =>
      // quality_classifier_score('corpus', 'id_col', 'text_col',
      // 'pos_rel', 'neg_rel') — logistic quality classifier over hashed
      // token features (QualityClassifier): trained driver-side on the
      // BOUNDED pos/neg labeled sets with fixed iterations and pinned
      // order (deterministic, oracle-replayable), scored as one
      // plan-shipped-weights pass over the corpus. The GPT-3/LLaMA third
      // net after heuristics and perplexity.
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(textCol: String),
            Some(posRel: String), Some(negRel: String)) =>
          Plain(graft.operators.QualityClassifier.qualityClassifierScore(
            lower(TableRef(corpus), ctx), idCol, textCol,
            lower(TableRef(posRel), ctx), lower(TableRef(negRel), ctx)))
        case _ =>
          throw new LoweringException(
            "quality_classifier_score expects (corpus, id_col, text_col, pos_rel, " +
              "neg_rel) literals, e.g. quality_classifier_score('documents', " +
              "'doc_id', 'text', 'good_docs', 'boilerplate_docs')")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "decode_images" =>
      // decode_images('corpus', 'id_col', 'payload_col'[, hist_buckets]) —
      // REAL javax.imageio decode to width/height/mean-luminance/histogram
      // (operators/Multimodal.decodeImages; corrupt payloads yield
      // decoded=false rows, never errors)
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(payloadCol: String)) =>
          Plain(graft.operators.Multimodal.decodeImages(
            lower(TableRef(corpus), ctx), idCol, payloadCol))
        case List(Some(corpus: String), Some(idCol: String), Some(payloadCol: String),
            Some(buckets: Long)) =>
          Plain(graft.operators.Multimodal.decodeImages(
            lower(TableRef(corpus), ctx), idCol, payloadCol, buckets.toInt))
        case _ =>
          throw new LoweringException(
            "decode_images expects (corpus, id_col, payload_col[, hist_buckets]) literals")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "decode_audio" =>
      // decode_audio('corpus', 'id_col', 'payload_col') — REAL
      // javax.sound.sampled WAV decode to rate/channels/duration/RMS/
      // zero-crossings (operators/Multimodal.decodeAudio)
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(payloadCol: String)) =>
          Plain(graft.operators.Multimodal.decodeAudio(
            lower(TableRef(corpus), ctx), idCol, payloadCol))
        case _ =>
          throw new LoweringException(
            "decode_audio expects (corpus, id_col, payload_col) literals")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "decode_video" =>
      // decode_video('corpus', 'id_col', 'payload_col'[, stride, max_frames])
      // — REAL AVI frame decode, one row per sampled frame
      // (operators/Multimodal.decodeVideoFrames)
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(payloadCol: String)) =>
          Plain(graft.operators.Multimodal.decodeVideoFrames(
            lower(TableRef(corpus), ctx), idCol, payloadCol))
        case List(Some(corpus: String), Some(idCol: String), Some(payloadCol: String),
            Some(stride: Long), Some(maxF: Long)) =>
          if (stride < 1) throw new LoweringException(
            s"decode_video stride must be >= 1 (got $stride)")
          if (maxF < 1) throw new LoweringException(
            s"decode_video max_frames must be >= 1 (got $maxF)")
          Plain(graft.operators.Multimodal.decodeVideoFrames(
            lower(TableRef(corpus), ctx), idCol, payloadCol, stride.toInt, maxF.toInt))
        case _ =>
          throw new LoweringException(
            "decode_video expects (corpus, id_col, payload_col[, stride, max_frames]) literals")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "resize_images" =>
      // resize_images('corpus', 'id_col', 'payload_col', w, h) — decode,
      // bilinear-resize, re-encode PNG (operators/Multimodal.resizeImages)
      args.map(constValue) match {
        case List(Some(corpus: String), Some(idCol: String), Some(payloadCol: String),
            Some(w: Long), Some(h: Long)) =>
          Plain(graft.operators.Multimodal.resizeImages(
            lower(TableRef(corpus), ctx), idCol, payloadCol, w.toInt, h.toInt))
        case _ =>
          throw new LoweringException(
            "resize_images expects (corpus, id_col, payload_col, width, height) literals")
      }

    case ModelRef(name, args) if !ctx.models.contains(name) &&
        name.toLowerCase == "range" =>
      // builtin table function: range(n) / range(start, end[, step]) → id
      val vals = args.map(a => constValue(a) match {
        case Some(v: Long) => v
        case _ => throw new LoweringException("range() arguments must be integer literals")
      })
      val df = vals match {
        case List(n) => ctx.spark.range(n)
        case List(s, e) => ctx.spark.range(s, e)
        case List(s, e, st) => ctx.spark.range(s, e, st)
        case _ => throw new LoweringException("range() takes 1-3 arguments")
      }
      Plain(df.toDF("id"))

    case ModelRef(name, args) =>
      val m = ctx.models.getOrElse(name,
        throw new LoweringException(s"unknown model: $name"))
      assertNoCycle(name, ctx.models.view.mapValues(_.body).toMap, "model")
      if (args.length > m.params.length)
        throw new LoweringException(
          s"model $name takes ${m.params.length} parameter(s), got ${args.length} argument(s)")
      // bind arguments (or declared defaults) as vals — Ident resolution
      // substitutes them anywhere in the body, the reference's compile-time
      // model expansion (SqlGenerator.scala:1101 `expand`). Named arguments
      // arrive as `param = value` equality expressions — unwrap them, or the
      // binding becomes self-referential (param -> Ident(param), an
      // infinite resolution loop).
      val named = mutable.Map.empty[String, Expr]
      val positional = List.newBuilder[Expr]
      args.foreach {
        case BinaryOp("=", Ident(p), v) if m.params.exists(_._1.equalsIgnoreCase(p)) =>
          named(p.toLowerCase) = v
        case a => positional += a
      }
      val pos = positional.result()
      val bindings = m.params.zipWithIndex.map { case ((pname, default), i) =>
        val v = named.getOrElse(pname.toLowerCase,
          if (i < pos.length) pos(i)
          else default.getOrElse(throw new LoweringException(
            s"model $name: missing argument for parameter '$pname'")))
        pname -> v
      }
      val ctx2 =
        if (bindings.isEmpty) ctx
        else ctx.copy(vals = ctx.vals.clone() ++= bindings)
      Plain(lower(m.body, ctx2).alias(name))

    case PipeInput =>
      throw new LoweringException(
        "partial-query input placeholder outside an application context")

    case PartialApply(child, name, args) =>
      ctx.partials.get(name.toLowerCase) match {
        case Some(p) =>
          if (args.length != p.params.length)
            throw new LoweringException(
              s"partial query $name expects ${p.params.length} argument(s), got ${args.length}")
          assertNoCycle(name.toLowerCase,
            ctx.partials.view.mapValues(_.body).toMap, "partial query")
          val ctx2 =
            if (args.isEmpty) ctx
            else ctx.copy(vals = ctx.vals.clone() ++= p.params.zip(args))
          lowerRel(substPipeInput(p.body, child), ctx2)
        case None =>
          throw new LoweringException(s"unknown pipe operator or partial query: $name")
      }
    case FileScan(path) =>
      val base = readFile(path, ctx)
      // alias by file basename (sans extension) for qualified refs
      val baseName = path.split('/').last.takeWhile(_ != '.')
      Plain(if (baseName.nonEmpty && baseName.head.isLetter) base.alias(baseName) else base)
    case RawSql(sql) =>
      // sql"…" is Spark SQL first; if Spark's parser rejects the fragment,
      // retry once through the dialect shim (DuckDB bare-bracket arrays,
      // MAP{…} literals, typed literals — duckdb/array_value.wv etc.)
      Plain(
        try ctx.spark.sql(sql)
        catch {
          case e: org.apache.spark.sql.catalyst.parser.ParseException =>
            val translated = graft.SqlDialect.normalizeRawFragment(sql)
            if (translated == sql) throw e
            else ctx.spark.sql(translated)
        })
    case RawJson(json) =>
      import ctx.spark.implicits._
      Plain(ctx.spark.read.json(ctx.spark.createDataset(Seq(json))))
    case EmptyRelation => Plain(ctx.spark.range(1).toDF("__dummy"))
    case v: Values => Plain(lowerValues(v, ctx))
    case u: UnnestRel => Plain(lowerUnnest(u, ctx))

    case AliasedRelation(child, alias, cols) =>
      val df = lower(child, ctx)
      val renamed = if (cols.nonEmpty) df.toDF(cols: _*) else df
      Plain(renamed.alias(alias))

    case SubscribeRel(child, params) if ctx.streamingSub.isDefined =>
      // streaming re-lowering (lowerStreamingAgg): the subscription IS the
      // prepared readStream source — dedup/watermark were applied there,
      // and windowing happens in the downstream F.window aggregation (no
      // batch explode; F.window's slide covers hopping)
      Plain(ctx.streamingSub.get)

    case SubscribeRel(child, params) =>
      // Batch lowering = full refresh of the child (the reference's
      // non-incremental fallback for Subscribe). Parameters are validated
      // against the child schema and recorded: the incremental execution
      // path is streaming/Subscribe.scala (readStream + watermark + window
      // + AvailableNow checkpoint re-runs), proven by SubscribeSpec.
      val df = lower(child, ctx)
      val pmap = params.toMap
      val wm = pmap.get("watermark_column")
      wm.foreach { c =>
        if (!df.columns.exists(_.equalsIgnoreCase(c)))
          throw new LoweringException(
            s"subscribe: watermark column '$c' is not a column of the subscribed relation")
      }
      Seq("window_size", "window_slide").foreach { p =>
        pmap.get(p).foreach { w =>
          if (!w.trim.matches("""\d+\s*(ms|s|sec|second|seconds|m|min|minute|minutes|h|hour|hours|d|day|days)"""))
            throw new LoweringException(s"subscribe: unrecognized $p '$w'")
        }
      }
      // dedup_keys: [...] — dedup-on-ingest. Batch full-refresh keeps one
      // representative row per key set (streaming keeps the first row seen
      // within the watermark horizon — streaming/Subscribe.dedupStream,
      // driven from this same recorded metadata).
      val dedupKeys = pmap.get("dedup_keys")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
      val resolvedKeys = dedupKeys.map { c =>
        df.columns.find(_.equalsIgnoreCase(c)).getOrElse(
          throw new LoweringException(
            s"subscribe: dedup key '$c' is not a column of the subscribed relation"))
      }
      ctx.subscriptions += ((wm, pmap))
      val deduped = if (resolvedKeys.nonEmpty) df.dropDuplicates(resolvedKeys) else df
      // session_gap + session_keys — gap sessionization. Batch full refresh
      // runs the declarative window plan; the recorded metadata drives the
      // streaming flatMapGroupsWithState plan (Subscribe.subscribeFromParams).
      Plain(pmap.get("session_gap") match {
        case Some(g) =>
          if (pmap.contains("window_size"))
            throw new LoweringException(
              "subscribe: window_size and session_gap are mutually exclusive")
          if (!g.trim.matches("""\d+\s*(ms|s|sec|second|seconds|m|min|minute|minutes|h|hour|hours|d|day|days)"""))
            throw new LoweringException(s"subscribe: unrecognized session_gap '$g'")
          val tsC = wm.flatMap(c => df.columns.find(_.equalsIgnoreCase(c)))
            .getOrElse(throw new LoweringException(
              "subscribe: session_gap requires watermark_column"))
          val sKeys = pmap.get("session_keys")
            .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
          val resolvedS = sKeys.map { c =>
            df.columns.find(_.equalsIgnoreCase(c)).getOrElse(
              throw new LoweringException(
                s"subscribe: session key '$c' is not a column of the subscribed relation"))
          }
          if (resolvedS.isEmpty)
            throw new LoweringException("subscribe: session_gap requires session_keys")
          // raw mode (group-by-over-session): keep raw rows — the
          // aggregation site sessionizes AFTER intervening filters, in
          // lockstep with the streaming session-window plan
          if (ctx.sessionRaw) deduped
          else graft.streaming.Sessionize.sessionizeBatch(
            deduped, tsC, resolvedS, graft.streaming.Subscribe.durationMs(g))
        case None =>
          // window_slide: hopping subscription — each event belongs to
          // window/slide overlapping windows, so the batch relation
          // materializes one row per containing window with the
          // epoch-aligned `window_start_ms` (the slide-aligned starts,
          // exactly F.window(ts, size, slide)'s buckets — the streaming
          // side of this same metadata). A following group-by picks the
          // column up as an injected key.
          pmap.get("window_slide") match {
            case Some(sl) =>
              val durMs = graft.streaming.Subscribe.durationMs(
                pmap.getOrElse("window_size", throw new LoweringException(
                  "subscribe: window_slide requires window_size")))
              val slMs = graft.streaming.Subscribe.durationMs(sl)
              if (slMs <= 0 || durMs % slMs != 0)
                throw new LoweringException(
                  s"subscribe: window_slide must divide window_size (got $sl)")
              val tsC = wm.flatMap(c => df.columns.find(_.equalsIgnoreCase(c)))
                .getOrElse(throw new LoweringException(
                  "subscribe: window_slide requires watermark_column"))
              val tsMs = graft.functions.EpochTime.epochMs(F.col(tsC))
              // pmod, not %: floor-aligned buckets for pre-1970 timestamps
              // too, matching F.window's origin and the oracle's `//`
              val aligned = tsMs - F.pmod(tsMs, F.lit(slMs))
              deduped.withColumn("window_start_ms",
                F.explode(F.sequence(
                  aligned - F.lit(durMs - slMs), aligned, F.lit(slMs))))
            case None => deduped
          }
      })
    case CallToolRel(connector, tool, args) =>
      // 1-row invocation summary (reference relation.scala:1182-1205):
      // the tool runs ONCE on the driver at lowering time; the result is a
      // literal-backed single-row plan, so downstream operators compose
      // without distributing the invocation
      val argMap = args.map { case (n, e) =>
        n -> constValue(e).getOrElse(
          try ctx.spark.range(1)
            .select(expr(e, ExprCtx(ctx, aggMode = false)).as("v")).collect().head.get(0)
          catch {
            case _: Throwable =>
              throw new LoweringException(
                s"call $connector.$tool: argument '$n' must be a constant expression")
          })
      }.toMap
      val (status, content) = graft.tools.ToolRegistry.invoke(connector, tool, argMap)
      Plain(ctx.spark.range(1).select(
        F.lit(connector).as("connector"), F.lit(tool).as("tool"),
        F.lit(status).as("status"), F.lit(content).as("content")))

    case BracedRelation(child) => lowerRel(child, ctx)

    case SelectAsNamed(child, name) =>
      // name the intermediate result: later `from name` re-derives the same
      // relation (registered like a zero-arg model)
      ctx.models(name) = ModelDef(name, Nil, child)
      Plain(lower(child, ctx).alias(name))

    case SelectAsNamedDyn(child, interp) =>
      lowerRel(SelectAsNamed(child, resolveInterpName(interp, ctx)), ctx)
    case TableRefDyn(interp) =>
      lowerRel(TableRef(resolveInterpName(interp, ctx)), ctx)

    case Filter(child, cond) =>
      lowerRel(child, ctx) match {
        case g: Grouped => g.copy(havings = g.havings :+ cond)
        case Plain(df) => Plain(lowerFilter(df, cond, ctx))
      }

    case GroupBy(Pivot(pchild, pivotCol, values, None), keys) =>
      // pivot followed by an explicit group-by: the pivot's grouping keys
      // and aggregate come from the FOLLOWING group-by/agg stages
      // (reference: pivot-order.wv)
      Grouped(lower(pchild, ctx), keys, Nil, GroupingStyle.Plain,
        pivot = Some((pivotCol, values.map(v => constValue(v).getOrElse(
          throw new LoweringException("pivot values must be literals"))))))
    case GroupBy(child, keys) if sessionizedSubscription(child).isDefined =>
      // Per-session aggregation: `group by <session_keys> agg …` over a
      // sessionized subscription aggregates the RAW subscribed rows per
      // session, with the session bounds injected as extra group keys
      // (the session analogue of the tumbling-window incrementalization
      // above — streaming side: lowerStreamingAgg's native session_window
      // plan). Bounds are computed AFTER intervening filters so batch and
      // stream sessionize the same rows.
      val ssub = sessionizedSubscription(child).get
      val spmap = ssub.params.toMap
      val sts = spmap.getOrElse("watermark_column", throw new LoweringException(
        "subscribe: session_gap requires watermark_column"))
      val sgapMs =
        try graft.streaming.Subscribe.durationMs(spmap("session_gap"))
        catch { case e: IllegalArgumentException => throw new LoweringException(e.getMessage) }
      val sessKeys = spmap.get("session_keys")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
      // the group keys must be exactly the session keys: a coarser set
      // would merge distinct keys' sessions, a finer one would split them —
      // both silently diverge from the per-key session definition
      val bare = keys.map(_.expr match {
        case Ident(n) => n.toLowerCase
        case other => throw new LoweringException(
          s"group by over a sessionized subscription supports bare session-key columns, got $other")
      })
      if (bare.toSet != sessKeys.map(_.toLowerCase).toSet)
        throw new LoweringException(
          s"group by over a sessionized subscription must group by exactly its " +
            s"session_keys (${sessKeys.mkString(", ")}); got (${bare.mkString(", ")})")
      val rawRows = lower(child, ctx.copy(sessionRaw = true))
      (Seq(sts) ++ sessKeys).foreach { c =>
        if (!rawRows.columns.exists(_.equalsIgnoreCase(c)))
          throw new LoweringException(
            s"group by over a sessionized subscription: column '$c' was dropped " +
              "by an intervening operator — session assignment needs it")
      }
      val tsResolved = rawRows.columns.find(_.equalsIgnoreCase(sts)).get
      val keysResolved = sessKeys.map(c => rawRows.columns.find(_.equalsIgnoreCase(c)).get)
      val annotated = graft.streaming.Sessionize.annotateSessions(
        rawRows, tsResolved, keysResolved, sgapMs)
      Grouped(annotated, keys ++ List(
        SelectItem(Ident("session_start_ms"), Some("session_start_ms")),
        SelectItem(Ident("session_end_ms"), Some("session_end_ms"))), Nil, GroupingStyle.Plain)

    case GroupBy(child, keys) if windowedSubscription(child).isDefined =>
      // Incrementalize semantics (reference Incrementalize.scala:27-107):
      // aggregating a windowed subscription groups by the tumbling bucket
      // too, so the batch full refresh recomputes exactly the windowed rows
      // the incremental runner appends (streaming/Subscribe.tumbling; the
      // epoch-aligned ms arithmetic below equals F.window's default
      // origin). Expressed as ordinary language arithmetic so the injected
      // keys lower through the normal expression path and reproduce
      // identically in SQL oracles. The subscription is found through any
      // column-pass-through operators between it and the group-by
      // (windowedSubscription) so an intervening where/select cannot
      // silently drop the window keys and diverge from the streaming plan.
      val sub = windowedSubscription(child).get
      val pmap = sub.params.toMap
      val ts = pmap.getOrElse("watermark_column", throw new LoweringException(
        "subscribe: window_size requires watermark_column"))
      val durMs =
        try graft.streaming.Subscribe.durationMs(pmap("window_size"))
        catch { case e: IllegalArgumentException => throw new LoweringException(e.getMessage) }
      val lowered = lower(child, ctx)
      val winKeys = pmap.get("window_slide") match {
        case Some(_) =>
          // hopping: the subscription lowering already exploded the
          // slide-aligned starts into a window_start_ms column — group on
          // it and derive the end
          if (!lowered.columns.exists(_.equalsIgnoreCase("window_start_ms")))
            throw new LoweringException(
              "group by over a hopping subscription: the window_start_ms column " +
                "injected by subscribe(window_slide: …) was dropped by an " +
                "intervening operator — keep it in the projection so the " +
                "aggregation can group by window")
          List(
            SelectItem(Ident("window_start_ms"), Some("window_start_ms")),
            SelectItem(BinaryOp("+", Ident("window_start_ms"), LongLit(durMs)),
              Some("window_end_ms")))
        case None =>
          if (!lowered.columns.exists(_.equalsIgnoreCase(ts)))
            throw new LoweringException(
              s"group by over a windowed subscription: watermark column '$ts' " +
                "was dropped by an intervening operator — the tumbling window " +
                "keys are derived from it, keep it in the projection")
          // floor-aligned bucket (`//` lowers to floor division in both
          // engines) so pre-1970 timestamps agree with F.window and DuckDB
          val tsMs = BinaryOp("//",
            FunctionCall("unix_micros", List(Ident(ts))), LongLit(1000L))
          val start = BinaryOp("*",
            BinaryOp("//", tsMs, LongLit(durMs)), LongLit(durMs))
          List(
            SelectItem(start, Some("window_start_ms")),
            SelectItem(BinaryOp("+", start, LongLit(durMs)), Some("window_end_ms")))
      }
      Grouped(lowered, keys ++ winKeys, Nil, GroupingStyle.Plain)

    case GroupBy(child, keys) =>
      Grouped(lower(child, ctx), keys, Nil, GroupingStyle.Plain)
    case GroupByStyled(child, keys, style) =>
      Grouped(lower(child, ctx), keys, Nil, style)

    case Agg(child, items0) =>
      lowerRel(child, ctx) match {
        case g0: Grouped =>
          val (g, items) = bindScalarsForAgg(g0,
            items0.map(it => it.copy(expr = bindPositionalKeys(it.expr, g0.keys))), ctx)
          // under a pending pivot a single agg stays UNALIASED so the output
          // columns are the bare pivot values (`1951`, not `1951_count`)
          val aggs =
            if (g.pivot.isDefined && items.length == 1)
              List(expr(items.head.expr, ExprCtx(ctx, aggMode = true)))
            else items.zipWithIndex.map { case (it, i) =>
              expr(it.expr, ExprCtx(ctx, aggMode = true)).as(itemName(it, i))
            }
          val countish = items.forall(it => it.expr match {
            case DotRef(_, n) => n.equalsIgnoreCase("count")
            case MethodCall(_, n, _) => n.equalsIgnoreCase("count")
            case FunctionCall(n, _, _, _) => n.equalsIgnoreCase("count")
            case _ => false
          })
          Plain(aggregate(g, aggs, Nil, ctx,
            pivotCountFill = g.pivot.isDefined && countish))
        case Plain(df0) =>
          val (df, items) = bindScalarsForAggPlain(df0, items0, ctx)
          val aggs = items.zipWithIndex.map { case (it, i) =>
            expr(it.expr, ExprCtx(ctx, aggMode = true)).as(itemName(it, i))
          }
          Plain(df.agg(aggs.head, aggs.tail: _*))
      }

    case Project(child, items0, distinct) =>
      val out = lowerRel(child, ctx) match {
        case g0: Grouped =>
          // `group by supplier_no select supplier_no = l_suppkey`: a group
          // key may name a FORWARD select alias (reference typer resolves
          // grouping keys against the projection); substitute the aliased
          // expression into the key and make the item reference the key name
          val (g1, items1a) = resolveForwardKeys(g0, items0)
          // a select item whose expression structurally equals a grouping
          // key (SQL shape: GROUP BY extract(year FROM d) … SELECT
          // extract(year FROM d)) references the key's OUTPUT column — the
          // source columns are gone after aggregation
          val keyOut: Map[Expr, String] = g1.keys.zipWithIndex
            .map { case (k, i) => (k.expr, itemName(k, i)) }.toMap
          val items1 = items1a.map { it =>
            keyOut.get(it.expr) match {
              case Some(kn) if !hasAgg(it.expr) && !it.expr.isInstanceOf[Ident] =>
                it.copy(expr = Ident(kn))
              case _ => it
            }
          }
          // projection over a grouped relation: agg items + key refs;
          // `_1`/`_2` reference grouping keys positionally
          val (g, items) = bindScalarsForAgg(g1,
            items1.map(it => it.copy(expr = bindPositionalKeys(it.expr, g1.keys))), ctx)
          val ectx = ExprCtx(ctx, aggMode = false)
          val keyNames = g.keys.zipWithIndex.map { case (k, i) => itemName(k, i) }
          val aggItems = items.zipWithIndex.filter { case (it, _) => hasAgg(it.expr) }
          val aggs = aggItems.map { case (it, i) =>
            expr(it.expr, ectx.copy(aggMode = true)).as(itemName(it, i))
          }
          val post = items.zipWithIndex.map { case (it, i) =>
            if (hasAgg(it.expr)) F.col(itemName(it, i))
            else expr(it.expr, ectx).as(itemName(it, i))
          }
          aggregate(g, aggs.toList, post.toList, ctx)
        case Plain(df) =>
          val items = items0
          if (items.exists(it => hasAgg(it.expr))) {
            // global aggregation: select count(*), _.count, …
            val (df2, items2) = bindScalarsForAggPlain(df, items, ctx)
            val aggs = items2.zipWithIndex.map { case (it, i) =>
              expr(it.expr, ExprCtx(ctx, aggMode = true)).as(itemName(it, i))
            }
            df2.agg(aggs.head, aggs.tail: _*)
          } else {
            val (joined, rewritten, _) = bindScalarSubqueries(df, items.map(_.expr), ctx)
            val ectx = ExprCtx(ctx, aggMode = false, dfOpt = Some(joined))
            joined.select(items.zip(rewritten).zipWithIndex.flatMap { case ((it, re), i) =>
              re match {
                // expand * from the PRE-join columns so bound __scalar_N
                // helper columns never leak into the output; when no scalar
                // binding happened, pass * through — per-name expansion
                // breaks on duplicate post-join column names (using-join
                // sides sharing a non-key column)
                case Star(None) if joined eq df => Seq(F.col("*"))
                case Star(None) => df.columns.toSeq.map(F.col)
                case Star(Some(q)) => Seq(F.col(s"$q.*"))
                case e => Seq(expr(e, ectx).as(itemName(it, i)))
              }
            }: _*)
          }
      }
      Plain(if (distinct) out.distinct() else out)

    case AddColumns(child, items, prepend) =>
      val df0 = lower(child, ctx)
      val (df, rewritten, _) = bindScalarSubqueries(df0, items.map(_.expr), ctx)
      val ectx = ExprCtx(ctx, aggMode = false, dfOpt = Some(df))
      val newCols = items.zip(rewritten).zipWithIndex.map { case ((it, re), i) =>
        expr(re, ectx).as(itemName(it, i))
      }
      // existing columns by ATTRIBUTE, not by name: after a multi-join the
      // frame can carry duplicate names (customers.id, products.id —
      // spec/benchmark/q2-join-derived.wv) and F.col("id") would be
      // ambiguous where the positional attribute list is not
      val existing = df0.queryExecution.analyzed.output
        .map(org.apache.spark.sql.graftbridge.ColumnBridge.column(_)).toList
      Plain(
        if (prepend) df.select(newCols ++ existing: _*)
        else df.select(existing ++ newCols: _*)
      )

    case TransformColumns(child, items) =>
      var df = lower(child, ctx)
      val ectx = ExprCtx(ctx, aggMode = false, dfOpt = Some(df))
      items.zipWithIndex.foreach { case (it, i) =>
        df = df.withColumn(itemName(it, i), expr(it.expr, ectx))
      }
      Plain(df)

    case ExcludeColumns(child, cols) =>
      Plain(lower(child, ctx).drop(cols: _*))

    case RenameColumns(child, renames) =>
      Plain(lower(child, ctx).withColumnsRenamed(renames.toMap))

    case ShiftColumns(child, cols, toLeft) =>
      val df = lower(child, ctx)
      val shifted = cols.map(c => df.columns.find(_.equalsIgnoreCase(c)).getOrElse(c))
      val rest = df.columns.filterNot(c => shifted.exists(_.equalsIgnoreCase(c))).toList
      val order = if (toLeft) shifted ++ rest else rest ++ shifted
      Plain(df.select(order.map(F.col): _*))

    case Sort(child, items) =>
      val df = lower(child, ctx)
      Plain(df.orderBy(items.map(si => sortCol(si, df, ctx)): _*))

    case Limit(child, n) => Plain(lower(child, ctx).limit(n.toInt))
    case Offset(child, n) =>
      child match {
        // SQL semantics (reference SqlGenerator.scala:431-433): OFFSET applies
        // before LIMIT regardless of pipe order — `limit 20 offset 10` means
        // skip 10, take 20.
        case Limit(inner, ln) => Plain(lower(inner, ctx).offset(n.toInt).limit(ln.toInt))
        case _ => Plain(lower(child, ctx).offset(n.toInt))
      }

    case CountRel(child) =>
      lowerRel(child, ctx) match {
        case g: Grouped =>
          // count the number of groups — havings stay: `group by k where
          // _.count > 5 | count` counts only the groups passing the filter
          // (aggregate() computes and applies them; dropping them here
          // diverged from the SQL generator's HAVING-preserving block)
          val keysDf = aggregate(g, Nil, Nil, ctx)
          Plain(keysDf.agg(F.count(F.lit(1)).as("count")))
        case Plain(df) => Plain(df.agg(F.count(F.lit(1)).as("count")))
      }

    case DedupRel(child) => Plain(lower(child, ctx).dropDuplicates())

    case SampleRel(child, method, isPercent, size) =>
      val df = lower(child, ctx)
      Plain {
        if (isPercent) df.sample(withReplacement = false, size / 100.0, seed = 42L)
        else {
          // fixed-n reservoir (reference Sample, relation.scala): global
          // top-n by a seeded md5 of the full row — a true deterministic
          // reservoir: every row's key is uniform and independent of input
          // order/partitioning, and md5 is bit-identical across engines
          // (unlike rand(seed), which is engine-private), so the sample is
          // reproducible AND oracle-checkable. Catalyst plans
          // TakeOrderedAndProject: per-partition size-n heaps, one final
          // merge — the per-partition-top-k-then-global-k shape, no full
          // sort/shuffle at 100 TB.
          val n = size.toInt
          // Keying cost note: the md5 key (~1 cast per column + concat +
          // hash per row) parallelizes at parquet ROW-GROUP granularity; a
          // single-row-group file (the sf0.1 bench input) pins the keying
          // scan to one core (~2.5 s / 600k rows). Repartitioning first was
          // measured SLOWER (full-row shuffle > single-core md5), so the
          // plan stays shuffle-free; at scale, many row groups → the keying
          // scan parallelizes naturally and TakeOrderedAndProject keeps the
          // per-partition-heap + single-merge shape.
          val key = F.md5(F.concat_ws("|",
            (F.lit("graft-reservoir") +:
              df.columns.toSeq.map(c => F.col(c).cast("string"))): _*))
          df.orderBy(key).limit(n)
        }
      }

    case j: Join => Plain(lowerJoin(j, ctx))

    case SetOp(kind, left, right, distinct) =>
      val l = lower(left, ctx)
      val r = lower(right, ctx)
      Plain(kind match {
        case SetOpKind.Concat => l.union(r)
        case SetOpKind.Union => l.union(r).distinct()
        case SetOpKind.Intersect => if (distinct) l.intersect(r) else l.intersectAll(r)
        case SetOpKind.Except => if (distinct) l.except(r) else l.exceptAll(r)
      })

    case Pivot(child, pivotCol, values, agg) =>
      val df = lower(child, ctx)
      val aggCol = agg match {
        case Some(it) => expr(it.expr, ExprCtx(ctx, aggMode = true)).as(it.alias.getOrElse("value"))
        case None => F.count(F.lit(1)).as("count")
      }
      val aggSourceCols: Seq[String] = agg.toList.flatMap(it => columnRefs(it.expr))
      val groupCols = df.columns.filterNot(c =>
        c.equalsIgnoreCase(pivotCol) || aggSourceCols.exists(_.equalsIgnoreCase(c)))
      val gb = df.groupBy(groupCols.map(F.col): _*)
      val pv =
        if (values.nonEmpty)
          gb.pivot(pivotCol, values.map(v => constValue(v).getOrElse(
            throw new LoweringException("pivot values must be literals"))))
        else gb.pivot(pivotCol)
      var out = pv.agg(aggCol)
      if (agg.isEmpty) {
        // count pivot: absent combinations are 0, not null (DuckDB PIVOT parity)
        val pivoted = out.columns.filterNot(c => groupCols.exists(_.equalsIgnoreCase(c)))
        out = out.na.fill(0L, pivoted)
      }
      Plain(out)

    case Unpivot(child, valueCol, varCol, cols) =>
      val df = lower(child, ctx)
      val ids = df.columns.filterNot(c => cols.exists(_.equalsIgnoreCase(c)))
      Plain(df.unpivot(ids.map(F.col), cols.map(F.col).toArray, varCol, valueCol))

    case LateralUnnest(child, e, alias, cols, withOrd) =>
      val df = lower(child, ctx)
      val ectx = ExprCtx(ctx, aggMode = false, dfOpt = Some(df))
      val arr = expr(e, ectx)
      val outName = cols.headOption.orElse(alias).getOrElse(exprName(e, 0))
      Plain(
        if (withOrd) {
          // 1-based ordinals (SQL-standard WITH ORDINALITY; posexplode's
          // pos is 0-based), matching the table-form unnest at lowerUnnest
          val exploded = df.select(F.col("*"), F.posexplode(arr))
          exploded.select(
            df.columns.map(F.col) :+
              (F.col("pos") + 1).as(s"${outName}_ordinal") :+
              F.col("col").as(outName): _*)
        } else df.select(F.col("*"), F.explode(arr).as(outName))
      )

    case ExplainRel(child0) =>
      // `''` inside a triple-quoted sql""" block is the reference's escape
      // for a literal quote (spec/basic/explain-sql.wv embeds
      // `like ''%x%''`); unescape before handing the text to Spark's parser
      val child = child0 match {
        case RawSql(sql) if !sql.contains("'''") => RawSql(sql.replace("''", "'"))
        case other => other
      }
      val df = lower(child, ctx)
      import ctx.spark.implicits._
      Plain(Seq(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExtendedMode)).toDF("plan"))

    case DescribeRel(child) =>
      val df = lower(child, ctx)
      val rows = df.schema.fields.map(f => (f.name, wvTypeName(f.dataType))).toSeq
      import ctx.spark.implicits._
      Plain(rows.toDF("column_name", "column_type"))

    case TestRel(child, assertion) =>
      val df = lower(child, ctx)
      ctx.tests += ((df, assertion))
      Plain(df)

    case RunFlow(name, args) =>
      val fd = ctx.flows.getOrElse(name,
        throw new LoweringException(s"unknown flow: $name"))
      Plain(FlowRunner.run(fd, args, ctx))

    case RouteRel(child, _, _) =>
      // pass-through for the routing stage itself; consumers get the filtered
      // view (FlowRunner.routeFilter)
      lowerRel(child, ctx)

    case ForkRel(child, _) =>
      // declarative fork marker — branches are side tasks (parse-level
      // parity; the reference's flow-syntax spec is itself design-only)
      lowerRel(child, ctx)

    case OrchOp(child, kind, args) =>
      kind match {
        case "wait" =>
          // orchestration delay, honored at plan time (flow stages lower
          // inside their executor task, so the wait delays the stage)
          val ms = args.headOption.flatMap(constValue) match {
            case Some(s: String) => parseDurationMs(s)
            case Some(n: Long) => n
            case _ => 0L
          }
          if (ms > 0) Thread.sleep(ms)
          lowerRel(child, ctx)
        case "activate" =>
          val channel = args.headOption.flatMap(constValue).getOrElse("?")
          System.err.println(s"[flow] activate($channel)")
          lowerRel(child, ctx)
        case "wait_until" =>
          // sensor: poll the condition until true or timeout (reference:
          // FlowScheduler wait-until sensors — driver-side control flow by
          // design, like the reference's poll loop). The condition is a
          // scalar boolean; uncorrelated scalar subqueries bind lazily so
          // `wait until (from t agg _.count) > 0` polls live state.
          val cond = args.headOption.getOrElse(
            throw new LoweringException("wait until requires a condition"))
          val timeoutMs = args.lift(1).flatMap(constValue) match {
            case Some(s: String) => parseDurationMs(s)
            case Some(n: Long) => n
            case _ => 60000L
          }
          val pollMs = math.max(10L, math.min(1000L, timeoutMs / 20))
          val deadline = System.currentTimeMillis() + timeoutMs
          var ok = false
          while (!ok && System.currentTimeMillis() < deadline) {
            val base = ctx.spark.range(1).toDF("__one")
            val (df, rewritten, _) = bindScalarSubqueries(base, List(cond), ctx)
            val v = df.select(
              expr(rewritten.head, ExprCtx(ctx, aggMode = false, dfOpt = Some(df)))
                .cast("boolean").as("__c")).collect().head
            ok = !v.isNullAt(0) && v.getBoolean(0)
            if (!ok) Thread.sleep(pollMs)
          }
          if (!ok)
            throw new LoweringException(s"wait until: condition not met within ${timeoutMs}ms")
          lowerRel(child, ctx)
        case "jump" =>
          // `-> OtherFlow`: record the target AFTER the child lowers
          // successfully; FlowRunner triggers it as a NEW run after the
          // current flow completes (control transfer only — the child's
          // rows pass through)
          val lowered = lowerRel(child, ctx)
          args.headOption.flatMap(constValue) match {
            case Some(target: String) =>
              // stages lower on pool threads — guard the shared buffer
              ctx.jumps.synchronized { ctx.jumps += ((ctx.stageName, target)) }
            case _ => ()
          }
          lowered
        case _ => lowerRel(child, ctx) // end(): terminal marker
      }

    case SaveRel(child, target, append) =>
      val df = lower(child, ctx)
      val w = df.write.mode(if (append) "append" else "overwrite")
      if (isPathTarget(target)) {
        val path = resolveTargetPath(target, ctx)
        writeByExtension(w, target, path)
      } else saveAsTableResilient(w, target, append, ctx)
      Plain(df)

    case DebugRel(child, body) =>
      // execute the debug branch eagerly as a side task, printing a bounded
      // sample to stderr (honest semantics: the reference runs the branch)
      val bdf = lower(body, ctx)
      ctx.debugs += bdf
      lowerRel(child, ctx)
  }

  private def resolveTable(name: String, ctx: Context): DataFrame =
    if (name.startsWith("__show_")) lowerShow(name.stripPrefix("__show_"), ctx)
    // a corpus argument that is really a file path (table functions take
    // 'corpus' strings: similarity_topk('/tmp/idx.parquet', …)) dispatches
    // through the same extension reader as `from 'file.parquet'` — but only
    // unconditionally when it contains a path separator: a bare name with a
    // data-file extension (a table or model literally named 'events.csv')
    // must still resolve through the catalog first, falling back to the
    // file reader only when no binding/table of that name exists.
    else {
      val looksLikeFile = name.matches("(?i).*\\.(parquet|orc|csv|json|txt|text)(\\.gz)?$")
      if (looksLikeFile && (name.contains("/") || name.contains("\\")))
        readFile(name, ctx)
      else {
        val resolved = ctx.typeBindings.getOrElse(name, name)
        try ctx.tableResolver(resolved)
        catch {
          case e: Throwable =>
            // fall back to the session catalog (saved tables, temp views),
            // then to the `use`d schema prefix for unqualified names,
            // then — for extension-bearing names — the file reader
            try ctx.spark.table(resolved)
            catch {
              case _: Throwable =>
                ctx.currentSchema.get("schema")
                  .filter(_ => !resolved.contains("."))
                  .flatMap { s =>
                    try Some(ctx.spark.table(s"$s.$resolved"))
                    catch { case _: Throwable => None }
                  }
                  .getOrElse {
                    if (looksLikeFile) readFile(name, ctx) else throw e
                  }
            }
        }
      }
    }

  private def lowerShow(what0: String, ctx: Context): DataFrame = {
    // optional `like 'pattern'` filter over the listing's name column
    // (reference: Show.likePattern, relation.scala:1227)
    val (what, likePat) = what0.split("\\?like=", 2) match {
      case Array(w, p) => (w, Some(p))
      case _ => (what0, None)
    }
    def likeFilter(df: DataFrame, col: String = "name"): DataFrame =
      likePat.map(p => df.filter(F.col(col).like(p))).getOrElse(df)
    likeFilter(lowerShowBase(what, ctx))
  }

  private def lowerShowBase(what: String, ctx: Context): DataFrame = {
    import ctx.spark.implicits._
    // column shapes follow the reference's Show relation types
    // (relation.scala:1228-1296)
    what.toLowerCase match {
      case cv if cv.startsWith("create:") =>
        // show create view/table → Spark's SHOW CREATE TABLE text
        val name = cv.stripPrefix("create:")
        ctx.spark.sql(s"SHOW CREATE TABLE $name")
          .toDF("create_statement")
      case "tables" =>
        ctx.spark.catalog.listTables().select("name")
      case t if t.startsWith("tables:") =>
        // memory.main is the reference's in-memory default catalog.schema;
        // it aliases to the session default database here (see wv_tables)
        val schema = t.stripPrefix("tables:").split('.').last match {
          case "main" => "default"
          case s => s
        }
        try ctx.spark.catalog.listTables(schema).select("name")
        catch { case _: Throwable => Seq.empty[String].toDF("name") }
      case c if c.startsWith("columns:") =>
        val table = c.stripPrefix("columns:")
        val df = resolveTable(table, ctx)
        df.schema.fields.toSeq
          .map(f => (f.name, f.dataType.simpleString, f.nullable, null: String))
          .toDF("column_name", "data_type", "is_nullable", "column_default")
      case q if q.startsWith("query:") =>
        val name = q.stripPrefix("query:")
        val m = ctx.models.getOrElse(name,
          throw new LoweringException(s"unknown model: $name"))
        Seq((name, m.body.toString)).toDF("name", "query")
      case "flow_runs" =>
        // persisted attempt history (flow/FlowRunStore — survives driver
        // restarts), newest first, stage results flattened to one summary
        // string per run
        graft.flow.FlowRunStore.forSession(ctx.spark).list()
          .map { r =>
            (r.runId, r.flowName, r.state, r.startedAtMillis,
              r.runTimeMillis.getOrElse(-1L),
              r.stages.map(s => s"${s.name}:${s.status}:${s.attempts}").mkString(","))
          }
          .toDF("run_id", "flow", "state", "started_at_ms", "run_time_ms", "stages")
      case "schemas" | "databases" =>
        ctx.spark.catalog.listDatabases()
          .select(F.col("catalog"), F.col("name"))
      case "catalogs" =>
        ctx.spark.catalog.listCatalogs().select("name")
      case "models" =>
        ctx.models.toSeq.sortBy(_._1)
          .map { case (n, m) =>
            (n,
              if (m.paramSig.nonEmpty) m.paramSig else m.params.map(_._1).mkString(", "),
              if (m.doc.nonEmpty) m.doc else null,
              null: String)
          }
          .toDF("name", "args", "description", "package_name")
      case "functions" =>
        // registry builtins + user defs + partials (info-schema style;
        // reference SG:718-1080 synthesizes the same union)
        val builtin = ctx.spark.catalog.listFunctions()
          .select(F.col("name"), F.lit("builtin").as("function_type"))
        val user = (ctx.funcs.keys.map((_, "def")).toSeq ++
          ctx.partials.keys.map((_, "partial")).toSeq).sortBy(_._1)
          .toDF("name", "function_type")
        builtin.union(user)
      case other => throw new LoweringException(s"unsupported show target: $other")
    }
  }

  /** Footer metadata rows for a parquet file or directory of part files.
    * Relative paths resolve against basePath; when a test corpus addresses
    * a path by its repo-relative spelling, leading segments are stripped
    * until a basePath-relative suffix exists. */
  private def parquetMetadata(path0: String, ctx: Context): DataFrame = {
    def candidates(p: String): Seq[String] = {
      val base = ctx.basePath.stripSuffix("/")
      if (p.startsWith("/")) Seq(p)
      else {
        val segs = p.split('/')
        Seq(p) ++ (if (base.isEmpty) Nil
        else segs.indices.map(i => s"$base/${segs.drop(i).mkString("/")}"))
      }
    }
    val resolved = candidates(path0)
      .find(p => new java.io.File(p).exists())
      .getOrElse(throw new LoweringException(s"parquet_metadata: '$path0' not found"))
    val f = new java.io.File(resolved)
    val files =
      if (f.isDirectory)
        f.listFiles().filter(x => x.getName.endsWith(".parquet") &&
          !x.getName.startsWith(".") && !x.getName.startsWith("_")).sortBy(_.getName)
      else Array(f)
    import scala.jdk.CollectionConverters._
    val conf = ctx.spark.sparkContext.hadoopConfiguration
    val rows: Seq[(String, Long, Long, String, String, Long)] = files.toSeq.flatMap { file =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        blocks.zipWithIndex.flatMap { case (b, gi) =>
          b.getColumns.asScala.zipWithIndex.map { case (c, ci) =>
            (file.getName, gi.toLong, ci.toLong,
              c.getPath.toDotString, c.getCodec.name(), c.getValueCount)
          }
        }.toSeq
      } finally reader.close()
    }
    import ctx.spark.implicits._
    rows.toDF("file_name", "row_group_id", "column_id", "path_in_schema",
      "compression", "num_values")
  }

  private def readFile(path: String, ctx: Context): DataFrame = {
    val resolved =
      if (path.startsWith("/") || ctx.basePath.isEmpty) path
      else s"${ctx.basePath.stripSuffix("/")}/$path"
    val spark = ctx.spark
    val lower = resolved.toLowerCase
    if (lower.endsWith(".parquet")) spark.read.parquet(resolved)
    else if (lower.endsWith(".orc")) spark.read.orc(resolved)
    else if (lower.endsWith(".txt") || lower.endsWith(".txt.gz") ||
        lower.endsWith(".text"))
      // raw text corpus: one row per line, column `value` — the ingestion
      // shape LLM-pipeline text operators (text_quality, langid, dedup)
      // consume directly; gz decompression is codec-automatic
      spark.read.text(resolved)
    else if (lower.endsWith(".csv") || lower.endsWith(".csv.gz"))
      // gz decompression is codec-automatic, same as .txt.gz/.json.gz
      spark.read.option("header", "true").option("inferSchema", "true").csv(resolved)
    else if (lower.endsWith(".json") || lower.endsWith(".json.gz"))
      readJsonAnyShape(spark, resolved)
    else if (lower.endsWith(".wv")) {
      val src = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(resolved)),
        java.nio.charset.StandardCharsets.UTF_8)
      lower2(src, ctx)
    } else spark.read.parquet(resolved)
  }

  /** JSON comes in two shapes: line-delimited (Spark's own sink, logs) and
    * pretty/multi-line single documents (config-style files, the shape the
    * reference's DuckDB read_json handles). Spark's reader must be told
    * which: multiLine=true silently reads ONLY the first object of a JSONL
    * file, and the default JSONL mode marks a pretty file entirely
    * `_corrupt_record`. Probe with the cheap default mode first — the
    * corrupt-record column (schema-only check, no job) detects the pretty
    * shape, which then rereads with multiLine. */
  private def readJsonAnyShape(spark: SparkSession, resolved: String): DataFrame = {
    val lineMode = spark.read.json(resolved)
    val df =
      if (lineMode.columns.contains("_corrupt_record") || lineMode.columns.isEmpty)
        spark.read.option("multiLine", "true").json(resolved)
      else lineMode
    reorderJsonColumns(df, resolved)
  }

  /** Spark's JSON schema inference SORTS field names; engines that stream
    * JSON (DuckDB, the reference) preserve the file's field order. Recover
    * the order of the first object's keys (Jackson streaming over the first
    * bytes) and reorder the columns to match. */
  private def reorderJsonColumns(df: DataFrame, path: String): DataFrame =
    try {
      // a Spark-written JSON sink is a DIRECTORY of part files — recover
      // key order from the first part (all parts share the writer's schema)
      val f0 = new java.io.File(path)
      val src =
        if (f0.isDirectory)
          Option(f0.listFiles()).getOrElse(Array.empty)
            .filter(f => f.isFile && f.getName.startsWith("part-"))
            .sortBy(_.getName).headOption.map(_.getPath).getOrElse(path)
        else path
      val raw = new java.io.FileInputStream(src)
      val in =
        if (src.toLowerCase.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw)
        else raw
      try {
        val parser = new com.fasterxml.jackson.core.JsonFactory().createParser(in)
        import com.fasterxml.jackson.core.JsonToken._
        val names = List.newBuilder[String]
        var depth = 0
        var done = false
        while (!done) {
          val t = parser.nextToken()
          if (t == null) done = true
          else t match {
            case START_OBJECT => depth += 1
            case END_OBJECT => depth -= 1; if (depth == 0) done = true
            case FIELD_NAME if depth == 1 => names += parser.currentName()
            case _ => ()
          }
        }
        val order = names.result().filter(n => df.columns.contains(n))
        val rest = df.columns.filterNot(order.contains).toList
        if (order.isEmpty) df else df.select((order ++ rest).map(F.col): _*)
      } finally in.close()
    } catch { case _: Throwable => df }

  private def lower2(src: String, ctx: Context): DataFrame = {
    val stmts = Parser.parseStatements(src)
    lowerStatements(stmts, ctx).getOrElse(
      throw new LoweringException("included file has no query"))
  }

  private def lowerValues(v: Values, ctx: Context): DataFrame = {
    // zero-row values with declared columns still carry the schema
    val nCols = math.max(v.rows.map(_.length).maxOption.getOrElse(0), v.columns.length)
    val colNames =
      if (v.columns.nonEmpty) v.columns
      else (1 to nCols).map(i => s"c$i").toList
    // evaluate each literal cell; a deterministic column-free expression
    // (cast('2023-01-01' as date), typed decimal…) folds driver-side over a
    // 1-row plan — values literals are small by construction
    def evalCell(e: Expr): Any = {
      val v =
        try ctx.spark.range(1)
          .select(expr(e, ExprCtx(ctx, aggMode = false)).as("v")).collect().head.get(0)
        catch {
          case _: Throwable =>
            throw new LoweringException(s"values cell must be constant: $e")
        }
      // normalize narrow numerics so the inference below sees Long/Double
      // (a `cast(5 as int)` cell otherwise fell through to StringType)
      v match {
        case i: Int => i.toLong
        case i: Short => i.toLong
        case i: Byte => i.toLong
        case f: Float => f.toDouble
        case other => other
      }
    }
    val cells: List[List[Any]] = v.rows.map(_.map(e =>
      constValue(e).getOrElse(evalCell(e))))
    // per-column type inference with numeric widening
    val types: Seq[DataType] = (0 until nCols).map { i =>
      val vs = cells.flatMap(row => row.lift(i)).filter(_ != null)
      if (vs.isEmpty) StringType
      else if (vs.forall(_.isInstanceOf[Long]))
        LongType
      else if (vs.forall(v => v.isInstanceOf[Long] || v.isInstanceOf[Double]))
        DoubleType
      else if (vs.forall(_.isInstanceOf[Boolean])) BooleanType
      else if (vs.forall(_.isInstanceOf[java.sql.Date])) DateType
      else if (vs.forall(_.isInstanceOf[java.sql.Timestamp])) TimestampType
      else if (vs.forall(v => v.isInstanceOf[java.math.BigDecimal] ||
          v.isInstanceOf[Long])) {
        // decimal cells widen integer siblings (SQL VALUES (1),(1.5) is
        // decimal(11,1)); an all-Long column never reaches this branch
        val ds = vs.map {
          case d: java.math.BigDecimal => d
          case l: Long => java.math.BigDecimal.valueOf(l)
        }
        val scale = ds.map(_.scale).max
        val prec = ds.map(d => d.precision - d.scale).max + scale
        DecimalType(math.min(38, math.max(prec, 1)), scale)
      }
      else if (vs.forall(v => v.isInstanceOf[java.math.BigDecimal] ||
          v.isInstanceOf[Long] || v.isInstanceOf[Double]))
        DoubleType
      else if (vs.forall(_.isInstanceOf[Seq[_]])) {
        val elems = vs.flatMap(_.asInstanceOf[Seq[Any]]).filter(_ != null)
        val et =
          if (elems.nonEmpty && elems.forall(_.isInstanceOf[Long])) LongType
          else if (elems.nonEmpty &&
            elems.forall(v => v.isInstanceOf[Long] || v.isInstanceOf[Double])) DoubleType
          else StringType
        ArrayType(et, containsNull = true)
      } else StringType
    }
    val schema = StructType(colNames.zip(types).map { case (n, t) => StructField(n, t, true) })
    val rows = cells.map { row =>
      org.apache.spark.sql.Row.fromSeq((0 until nCols).map { i =>
        val raw = row.lift(i).orNull
        (raw, types(i)) match {
          case (null, _) => null
          case (v: Long, DoubleType) => v.toDouble
          case (v: java.math.BigDecimal, DoubleType) => v.doubleValue
          case (v: Long, t: DecimalType) =>
            java.math.BigDecimal.valueOf(v).setScale(t.scale)
          case (v: java.math.BigDecimal, t: DecimalType) => v.setScale(t.scale)
          case (v, StringType) if !v.isInstanceOf[String] => v.toString
          case (v: Seq[_], ArrayType(DoubleType, _)) =>
            v.map { case x: Long => x.toDouble; case x: Double => x; case x => x }
          case (v: Seq[_], ArrayType(StringType, _)) =>
            v.map(x => if (x == null) null else x.toString)
          case (v, _) => v
        }
      })
    }
    val df = ctx.spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
    v.alias.map(a => df.alias(a)).getOrElse(df)
  }

  private def lowerUnnest(u: UnnestRel, ctx: Context): DataFrame = {
    val spark = ctx.spark
    val name = u.columns.headOption.orElse(u.alias).getOrElse("value")
    u.expr match {
      case NullLit() | ArrayLit(Nil) =>
        spark.range(0).select(F.lit(null).cast("int").as(name))
      case e =>
        val arr = expr(e, ExprCtx(ctx, aggMode = false))
        val base = spark.range(1)
        if (u.withOrdinality)
          base.select(F.posexplode(arr)).toDF(s"${name}_ordinal", name)
            .select(F.col(name), (F.col(s"${name}_ordinal") + 1).as(s"${name}_ordinal"))
        else base.select(F.explode(arr).as(name))
    }
  }

  // --- joins -----------------------------------------------------------------
  private def lowerJoin(j: Join, ctx: Context): DataFrame = {
    val l = lower(j.left, ctx)
    if (j.lateral) return lowerLateralJoin(l, j, ctx)
    val r = lower(j.right, ctx)
    if (j.asof) return lowerAsofJoin(l, r, j, ctx)
    val ectx = ExprCtx(ctx, aggMode = false)
    j.kind match {
      case JoinKind.Cross if j.on.isEmpty && j.usingColumns.isEmpty => l.crossJoin(r)
      case k =>
        if (j.natural) {
          // natural join: implicit USING over the commonly-named columns
          // (reference: exprs.scala:222-254)
          val rCols = r.columns.map(_.toLowerCase).toSet
          val common = l.columns.filter(c => rCols.contains(c.toLowerCase)).toList
          if (common.isEmpty)
            throw new LoweringException("natural join: no common column names")
          l.join(r, common, k.sparkName)
        } else if (j.usingColumns.nonEmpty) l.join(r, j.usingColumns, k.sparkName)
        else
          j.on match {
            case Some(cond) if containsScalarSubquery(cond) =>
              // scalar subquery in a join condition: bind lazily against the
              // left side (broadcast cross join), drop the helper after
              val (l2, rewritten, bound) = bindScalarSubqueries(l, List(cond), ctx)
              l2.join(r, expr(rewritten.head, ectx), k.sparkName).drop(bound: _*)
            case Some(cond) => l.join(r, expr(cond, ectx), k.sparkName)
            case None => l.crossJoin(r)
          }
    }
  }

  /** Correlated lateral subquery join (reference: Lateral,
    * relation.scala:1046-1051): the subquery's filter conjuncts that
    * reference the outer row decorrelate into join conditions; local
    * conjuncts filter the subquery core; a trailing projection applies after
    * the join (outer columns stay visible, lateral semantics). */
  private def lowerLateralJoin(l: DataFrame, j: Join, ctx: Context): DataFrame = {
    var rel = j.right match {
      case BracedRelation(c) => c
      case other => other
    }
    var projItems: List[SelectItem] = Nil
    rel match {
      case Project(c, items, false) => projItems = items; rel = c
      case _ =>
    }
    val filterConjuncts = mutable.ListBuffer.empty[Expr]
    var unwrapping = true
    while (unwrapping) rel match {
      case Filter(c, fcond) => filterConjuncts ++= splitConjuncts(fcond); rel = c
      case _ => unwrapping = false
    }
    var coreDf = lower(rel, ctx)
    val scope = relationScopeNames(rel)
    val corr = mutable.ListBuffer.empty[Expr]
    filterConjuncts.foreach { cj =>
      if (hasForeignQualifier(cj, scope, coreDf.columns)) corr += cj
      else
        try coreDf = coreDf.filter(expr(cj, ExprCtx(ctx, aggMode = false, dfOpt = Some(coreDf))))
        catch { case _: org.apache.spark.sql.AnalysisException => corr += cj }
    }
    val ecJoin = ExprCtx(ctx, aggMode = false)
    val conds = corr.toList.map(expr(_, ecJoin)) ++ j.on.map(expr(_, ecJoin)).toList
    val joined =
      if (conds.isEmpty) l.crossJoin(coreDf)
      else l.join(coreDf, conds.reduce(_ && _), j.kind.sparkName)
    if (projItems.isEmpty) joined
    else {
      val leftCols = l.columns.toSeq.map(c => l(c))
      val ectx = ExprCtx(ctx, aggMode = false, dfOpt = Some(joined))
      joined.select(leftCols ++ projItems.zipWithIndex.map { case (it, i) =>
        expr(it.expr, ectx).as(itemName(it, i))
      }: _*)
    }
  }

  /** asof join (reference: relation.scala:817-880, spec/basic/join-asof.wv):
    * for each left row, pick the single right row with the greatest (for `<=`)
    * inequality-key not exceeding the left key among equal equi-keys.
    * Delegates to the scalable union+window implementation in
    * [[graft.operators.AsOfJoin]] — one shuffle, no row explosion.
    */
  private def lowerAsofJoin(l: DataFrame, r: DataFrame, j: Join, ctx: Context): DataFrame = {
    val cond = j.on.getOrElse(throw new LoweringException("asof join requires on-condition"))
    val conjuncts = splitConjuncts(cond)
    var eqKeys = List.empty[(String, String)] // (leftCol, rightCol)
    var ineq: Option[(String, String, String)] = None // (leftCol, op, rightCol)

    def sideOf(e: Expr): Option[(String, String)] = e match {
      case DotRef(Ident(q), c) => Some((q, c))
      case Ident(c) => Some(("", c))
      case _ => None
    }
    // determine which qualifier belongs to the left plan by probing its columns
    def isLeftCol(q: String, c: String): Boolean =
      try { l(s"${if (q.nonEmpty) q + "." else ""}$c"); true }
      catch { case _: Throwable => false }

    conjuncts.foreach {
      case BinaryOp(op, a, b) =>
        (sideOf(a), sideOf(b)) match {
          case (Some((qa, ca)), Some((qb, cb))) =>
            val aLeft = isLeftCol(qa, ca)
            op match {
              case "=" =>
                if (aLeft) eqKeys :+= ((ca, cb)) else eqKeys :+= ((cb, ca))
              case "<=" | "<" | ">=" | ">" =>
                // normalize to right-side op left-side: e.g. r.date <= l.date
                if (aLeft) ineq = Some((ca, flipOp(op), cb))
                else ineq = Some((cb, op, ca))
              case other => throw new LoweringException(s"unsupported asof condition op: $other")
            }
          case _ => throw new LoweringException("asof join conditions must be column comparisons")
        }
      case other => throw new LoweringException(s"unsupported asof condition: $other")
    }
    val (lKey, op, rKey) =
      ineq.getOrElse(throw new LoweringException("asof join needs an inequality condition"))
    // `asof join` is inner (DuckDB ASOF JOIN drops unmatched left rows);
    // `asof left join` keeps them with nulls.
    val keepUnmatched = j.kind match {
      case JoinKind.Inner => false
      case JoinKind.Left => true
      case other => throw new LoweringException(s"unsupported asof join kind: $other")
    }
    graft.operators.AsOfJoin.asofJoin(l, r, eqKeys, lKey, rKey, op, keepUnmatched)
  }

  private def flipOp(op: String): String = op match {
    case "<=" => ">="
    case "<" => ">"
    case ">=" => "<="
    case ">" => "<"
    case o => o
  }

  private def splitConjuncts(e: Expr): List[Expr] = e match {
    case BinaryOp("and", l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => List(other)
  }

  /** Replace the [[PipeInput]] leaf of a partial-query body with the piped-in
    * relation (reference: PartialQueryApply, relation.scala:405-418). */
  private def substPipeInput(r: Relation, input: Relation): Relation = {
    def go(x: Relation): Relation = x match {
      case PipeInput => input
      case u: AliasedRelation => u.copy(child = go(u.child))
      case u: BracedRelation => u.copy(child = go(u.child))
      case u: Filter => u.copy(child = go(u.child))
      case u: Project => u.copy(child = go(u.child))
      case u: GroupBy => u.copy(child = go(u.child))
      case u: GroupByStyled => u.copy(child = go(u.child))
      case u: Agg => u.copy(child = go(u.child))
      case u: AddColumns => u.copy(child = go(u.child))
      case u: TransformColumns => u.copy(child = go(u.child))
      case u: ExcludeColumns => u.copy(child = go(u.child))
      case u: RenameColumns => u.copy(child = go(u.child))
      case u: ShiftColumns => u.copy(child = go(u.child))
      case u: Sort => u.copy(child = go(u.child))
      case u: Limit => u.copy(child = go(u.child))
      case u: Offset => u.copy(child = go(u.child))
      case u: CountRel => u.copy(child = go(u.child))
      case u: DedupRel => u.copy(child = go(u.child))
      case u: SampleRel => u.copy(child = go(u.child))
      case u: Pivot => u.copy(child = go(u.child))
      case u: Unpivot => u.copy(child = go(u.child))
      case u: LateralUnnest => u.copy(child = go(u.child))
      case u: DescribeRel => u.copy(child = go(u.child))
      case u: ExplainRel => u.copy(child = go(u.child))
      case u: TestRel => u.copy(child = go(u.child))
      case u: DebugRel => u.copy(child = go(u.child), body = go(u.body))
      case u: PartialApply => u.copy(child = go(u.child))
      case u: SaveRel => u.copy(child = go(u.child))
      case u: SelectAsNamed => u.copy(child = go(u.child))
      case u: RouteRel => u.copy(child = go(u.child))
      case u: ForkRel => u.copy(child = go(u.child))
      case u: OrchOp => u.copy(child = go(u.child))
      case j: Join => j.copy(left = go(j.left), right = go(j.right))
      case s: SetOp => s.copy(left = go(s.left), right = go(s.right))
      case leaf => leaf
    }
    go(r)
  }

  /** Bottom-up expression rewrite: applies `f` where defined, recursing into
    * children first (shared by scalar-subquery binding, model-parameter
    * substitution and user-def inlining). */
  def transformExpr(e: Expr)(f: PartialFunction[Expr, Expr]): Expr = {
    def go(x: Expr): Expr = {
      val rebuilt: Expr = x match {
        case DotRef(t, n) => DotRef(go(t), n)
        case MethodCall(t, n, args) => MethodCall(go(t), n, args.map(go))
        case FunctionCall(n, args, d, filt) => FunctionCall(n, args.map(go), d, filt.map(go))
        case WindowApply(fn, spec) =>
          WindowApply(go(fn), WindowSpec(
            spec.partitionBy.map(go),
            spec.orderBy.map(s => s.copy(expr = go(s.expr))),
            spec.frame))
        case ArrayLit(items) => ArrayLit(items.map(go))
        case MapLit(es) => MapLit(es.map { case (k, v) => (go(k), go(v)) })
        case StructLit(fs) => StructLit(fs.map { case (n, v) => (n, go(v)) })
        case Subscript(t, ix) => Subscript(go(t), go(ix))
        case LambdaExpr(ps, b) => LambdaExpr(ps, go(b))
        case BinaryOp(op, l, r) => BinaryOp(op, go(l), go(r))
        case UnaryOp(op, v) => UnaryOp(op, go(v))
        case Not(v) => Not(go(v))
        case IsNull(v, n) => IsNull(go(v), n)
        case Between(v, lo, hi, n) => Between(go(v), go(lo), go(hi), n)
        case InList(v, items, n) => InList(go(v), items.map(go), n)
        case LikeOp(v, p, n) => LikeOp(go(v), go(p), n)
        case RLikeOp(v, p, n) => RLikeOp(go(v), go(p), n)
        case Cast(v, t, tr) => Cast(go(v), t, tr)
        case CaseWhen(t, bs, o) =>
          CaseWhen(t.map(go), bs.map { case (c, v) => (go(c), go(v)) }, o.map(go))
        case IfExpr(c, t, fo) => IfExpr(go(c), go(t), fo.map(go))
        case Interpolation(parts, args) => Interpolation(parts, args.map(go))
        case Extract(fi, v) => Extract(fi, go(v))
        case TupleLit(items) => TupleLit(items.map(go))
        case AtTimeZone(v, tz) => AtTimeZone(go(v), go(tz))
        case other => other
      }
      if (f.isDefinedAt(rebuilt)) f(rebuilt) else rebuilt
    }
    go(e)
  }

  /** Replace each uncorrelated ScalarSubquery with a reference to a column
    * cross-joined from the 1-row aggregate (Catalyst broadcasts it) — the
    * plan stays lazy; no driver-side collect (reference semantics:
    * exprs.scala ScalarSubquery; a >1-row subquery is a user error, surfaced
    * by the multiplied row count). Returns (joined df, rewritten exprs,
    * bound temp column names to drop afterwards). */
  private def bindScalarSubqueries(
      df0: DataFrame,
      exprs: List[Expr],
      ctx: Context
  ): (DataFrame, List[Expr], List[String]) = {
    if (!exprs.exists(containsScalarSubquery)) return (df0, exprs, Nil)
    var df = df0
    var i = 0
    val names = List.newBuilder[String]
    val rewritten = exprs.map(transformExpr(_) {
      case ScalarSubquery(q) =>
        val name = s"__scalar_$i"; i += 1
        names += name
        def correlated(orElse: Throwable): Unit =
          df = correlatedScalarJoin(df, q, name, i, ctx).getOrElse(throw orElse)
        val scope = relationScopeNames(q)
        if (collectFilterConds(q).exists(c => hasForeignQualifier(c, scope, Nil)))
          correlated(new LoweringException("cannot decorrelate scalar subquery"))
        else
          try {
            val sub = lower(q, ctx)
            if (sub.columns.length != 1)
              throw new LoweringException("scalar subquery must return a single column")
            df = df.crossJoin(F.broadcast(sub.select(F.col(sub.columns.head).as(name))))
          } catch {
            case ae: org.apache.spark.sql.AnalysisException => correlated(ae)
          }
        Ident(name)
    })
    (df, rewritten, names.result())
  }

  /** Decorrelate `… cmp { from t where t.k = outer.k select <agg> }`: group
    * the inner by its correlation keys and LEFT-join the 1-row-per-key
    * aggregate onto the outer frame (reference semantics: a correlated
    * scalar subquery evaluates per outer row; SQL returns NULL over an empty
    * group, which the left join reproduces — note count-style aggregates
    * would need a 0-coalesce, fine for the min/avg/sum shapes this serves).
    * One shuffle on the correlation keys; the join output stays lazy. */
  private def correlatedScalarJoin(
      outer: DataFrame,
      q0: Relation,
      name: String,
      serial: Int,
      ctx: Context
  ): Option[DataFrame] = {
    var rel = q0 match { case BracedRelation(c) => c; case r => r }
    val items = rel match {
      case Project(c, its, false) if its.length == 1 => rel = c; its
      case _ => return None
    }
    val filterConjuncts = mutable.ListBuffer.empty[Expr]
    var unwrapping = true
    while (unwrapping) rel match {
      case Filter(c, fcond) => filterConjuncts ++= splitConjuncts(fcond); rel = c
      case _ => unwrapping = false
    }
    if (filterConjuncts.isEmpty) return None
    var coreDf = try lower(rel, ctx) catch { case _: Throwable => return None }
    val scope = relationScopeNames(rel)
    val corr = mutable.ListBuffer.empty[Expr]
    filterConjuncts.foreach { cj =>
      if (hasForeignQualifier(cj, scope, coreDf.columns)) corr += cj
      else
        try coreDf = coreDf.filter(expr(cj, ExprCtx(ctx, aggMode = false, dfOpt = Some(coreDf))))
        catch { case _: org.apache.spark.sql.AnalysisException => corr += cj }
    }
    if (corr.isEmpty) return None
    // every correlated conjunct must be an equality with exactly one side
    // resolvable on the inner frame — those sides become the grouping keys
    val ecCore = ExprCtx(ctx, aggMode = false, dfOpt = Some(coreDf))
    def innerSide(e: Expr): Option[Column] =
      if (hasForeignQualifier(e, scope, coreDf.columns)) None
      else
        try { val c = expr(e, ecCore); coreDf.select(c); Some(c) }
        catch { case _: Throwable => None }
    val pairs = corr.toList.zipWithIndex.map {
      case (BinaryOp("=", a, b), j) =>
        val keyName = s"__ck_${serial}_$j"
        (innerSide(a), innerSide(b)) match {
          case (Some(ia), None) => (keyName, ia, b)
          case (None, Some(ib)) => (keyName, ib, a)
          case _ => return None
        }
      case _ => return None
    }
    val aggCol = expr(items.head.expr, ExprCtx(ctx, aggMode = true, dfOpt = Some(coreDf)))
    val grouped = coreDf
      .groupBy(pairs.map { case (kn, ic, _) => ic.as(kn) }: _*)
      .agg(aggCol.as(name))
    val ecOuter = ExprCtx(ctx, aggMode = false, dfOpt = Some(outer))
    val cond = pairs.map { case (kn, _, oe) => grouped(kn) === expr(oe, ecOuter) }
      .reduce(_ && _)
    Some(outer.join(grouped, cond, "left").drop(pairs.map(_._1): _*))
  }

  private def containsScalarSubquery(e: Expr): Boolean = {
    var found = false
    transformExpr(e) { case s: ScalarSubquery => found = true; s }
    found
  }

  /** where-clause lowering with semi/anti-join extraction for subquery
    * predicates (reference: InRelation/Exists exprs.scala:424-450, 522;
    * Spark lowering per SURVEY §2.D: left_semi / left_anti joins). */
  private def lowerFilter(df: DataFrame, cond: Expr, ctx: Context): DataFrame = {
    val conjuncts = splitConjuncts(cond)
    var out = df
    val plain = List.newBuilder[Expr]
    conjuncts.foreach {
      case InSubquery(e, q, negated) =>
        out = subqueryJoin(out, Some(e), q, if (negated) "left_anti" else "left_semi", ctx)
      case ExistsExpr(q) =>
        out = subqueryJoin(out, None, q, "left_semi", ctx)
      case Not(ExistsExpr(q)) =>
        out = subqueryJoin(out, None, q, "left_anti", ctx)
      // `not (x in {subq})` — same predicate with the negation outside the
      // IN (the SQL→wv transpiler emits this shape for NOT IN)
      case Not(InSubquery(e, q, negated)) =>
        out = subqueryJoin(out, Some(e), q, if (negated) "left_semi" else "left_anti", ctx)
      case other => plain += other
    }
    val rest0 = plain.result()
    if (rest0.isEmpty) out
    else {
      val (joined, rest, bound) = bindScalarSubqueries(out, rest0, ctx)
      val filtered = joined.filter(
        rest.map(e => expr(e, ExprCtx(ctx, aggMode = false, dfOpt = Some(joined)))).reduce(_ && _))
      if (bound.isEmpty) filtered else filtered.drop(bound: _*)
    }
  }

  /** Resolve an interpolated identifier s`name_${i}` to a concrete name:
    * every argument must fold to a constant after val substitution
    * (reference: backquote-interpolation.wv — model args and vals resolve
    * in the caller's context before the interpolation evaluates). */
  private def resolveInterpName(interp: Interpolation, ctx: Context): String = {
    def fold(e0: Expr): Any = {
      var e = e0
      var i = 0
      while (i < 10 && constValue(e).isEmpty) {
        e = transformExpr(e) { case Ident(n) if ctx.vals.contains(n) => ctx.vals(n) }
        i += 1
      }
      constValue(e).getOrElse(throw new LoweringException(
        s"interpolated identifier requires constant arguments, got: $e0"))
    }
    val vals = interp.args.map(fold)
    val sb = new StringBuilder
    interp.parts.zipWithIndex.foreach { case (p, i) =>
      sb ++= p
      if (i < vals.length) sb ++= String.valueOf(vals(i))
    }
    sb.toString
  }

  /** Reject (mutually) recursive model / partial-query definitions BEFORE
    * expansion: a cycle would otherwise recurse without bound (reference:
    * spec/neg recursive-model.wv, recursive-partial-query.wv — a user
    * error, not a StackOverflowError). Static DFS over the definition
    * graph; references collected by product walk so nested subqueries and
    * pipe chains are covered. */
  private def assertNoCycle(
      start: String,
      defs: Map[String, Relation],
      what: String
  ): Unit = {
    def refs(r: Relation): Set[String] = {
      val acc = Set.newBuilder[String]
      def walk(x: Any): Unit = x match {
        case TableRef(n) if defs.contains(n) => acc += n
        case m @ ModelRef(n, _) =>
          if (defs.contains(n)) acc += n
          m.productIterator.foreach(walk)
        case p @ PartialApply(_, n, _) =>
          if (defs.contains(n.toLowerCase)) acc += n.toLowerCase
          p.productIterator.foreach(walk)
        case p: Product => p.productIterator.foreach(walk)
        case it: Iterable[_] => it.foreach(walk)
        case _ => ()
      }
      walk(r)
      acc.result()
    }
    val visiting = mutable.Set.empty[String]
    val done = mutable.Set.empty[String]
    def dfs(n: String, path: List[String]): Unit = {
      if (visiting.contains(n))
        throw new LoweringException(
          s"recursive $what reference: ${(path :+ n).mkString(" -> ")}")
      if (done.contains(n)) return
      visiting += n
      defs.get(n).foreach(body => refs(body).foreach(dfs(_, path :+ n)))
      visiting -= n
      done += n
    }
    dfs(start, Nil)
  }

  /** Table names and aliases visible inside a relation tree (lowercased) —
    * the name scope a subquery's own qualified refs may legally use. */
  private def relationScopeNames(r: Relation): Set[String] = {
    val acc = Set.newBuilder[String]
    def walk(x: Any): Unit = x match {
      case TableRef(n) => acc += n.toLowerCase
      case AliasedRelation(c, alias, _) => acc += alias.toLowerCase; walk(c)
      case p: Product => p.productIterator.foreach(walk)
      case it: Iterable[_] => it.foreach(walk)
      case _ => ()
    }
    walk(r)
    acc.result()
  }

  /** Does `e` contain a qualified column ref `q.c` whose qualifier names
    * neither a relation in `scope` nor a column of `cols`? Such a ref can
    * only come from an OUTER query — the expression is correlated. This must
    * be checked structurally: resolving it against the inner frame would
    * silently drop the foreign qualifier to the bare column (the post-join
    * fallback in expr's DotRef case), turning `l2.k = l1.k` into the
    * always-true `k = k`. */
  private def hasForeignQualifier(e: Expr, scope: Set[String], cols: Seq[String]): Boolean = {
    var found = false
    transformExpr(e) {
      case d @ DotRef(Ident(q), member)
        if !Stdlib.isAggMethod(member) && !Stdlib.scalarMethods.contains(member.toLowerCase) &&
          !scope.contains(q.toLowerCase) && !cols.exists(_.equalsIgnoreCase(q)) =>
        found = true; d
    }
    found
  }

  /** All Filter conditions anywhere in a relation tree (for structural
    * correlation detection of whole subqueries). */
  private def collectFilterConds(r: Relation): List[Expr] = {
    val acc = List.newBuilder[Expr]
    def walk(x: Any): Unit = x match {
      case Filter(c, cond) => acc += cond; walk(c)
      case p: Product => p.productIterator.foreach(walk)
      case it: Iterable[_] => it.foreach(walk)
      case _ => ()
    }
    walk(r)
    acc.result()
  }

  /** Lower an in/exists subquery predicate as a semi/anti join. Uncorrelated
    * subqueries lower directly; subqueries whose filters use foreign
    * qualifiers (or whose lowering fails on unresolved columns) are
    * decorrelated: correlated filter conjuncts become join conditions
    * (reference: Lateral / InRelation, relation.scala:1046-1051,
    * exprs.scala:424-450; Spark plans a semi/anti hash join either way). */
  private def subqueryJoin(
      out: DataFrame,
      probeExpr: Option[Expr],
      q: Relation,
      joinType: String,
      ctx: Context
  ): DataFrame = {
    // structurally-correlated subqueries must NOT take the uncorrelated path:
    // their foreign quals would silently mis-resolve against the inner frame
    val scope = relationScopeNames(q)
    if (collectFilterConds(q).exists(c => hasForeignQualifier(c, scope, Nil)))
      return decorrelated(out, probeExpr, q, joinType, ctx).getOrElse(
        throw new LoweringException("cannot decorrelate subquery predicate"))
    def uncorrelated(): DataFrame = {
      val sub = lower(q, ctx)
      probeExpr match {
        case Some(TupleLit(fields)) =>
          // tuple-IN over a multi-column subquery: compare positional structs
          // (field names forced to _c0… so struct equality resolves)
          if (fields.length != sub.columns.length)
            throw new LoweringException(
              s"tuple IN arity mismatch: ${fields.length} vs subquery's ${sub.columns.length} columns")
          val ec = ExprCtx(ctx, aggMode = false, dfOpt = Some(out))
          val probe = F.struct(fields.zipWithIndex.map { case (f, i) =>
            expr(f, ec).as(s"_c$i")
          }: _*)
          val renamed = sub.select(F.struct(sub.columns.zipWithIndex.map { case (c, i) =>
            F.col(c).as(s"_c$i")
          }: _*).as("__in_key"))
          out.join(renamed, probe === F.col("__in_key"), joinType)
        case Some(e) =>
          val probe = expr(e, ExprCtx(ctx, aggMode = false, dfOpt = Some(out)))
          val renamed = sub.select(F.col(sub.columns.head).as("__in_key"))
          if (joinType == "left_anti") {
            // SQL NOT IN is null-aware: a NULL probe (or any NULL key when
            // the subquery is non-empty) excludes the row. The
            // `cond || isnull(cond)` shape is exactly what Spark's
            // ExtractSingleColumnNullAwareAntiJoin optimizes into a
            // broadcast null-aware anti join (no nested-loop fallback).
            val eq = probe === F.col("__in_key")
            out.join(renamed, eq || eq.isNull, joinType)
          } else out.join(renamed, probe === F.col("__in_key"), joinType)
        case None =>
          out.join(sub.limit(1), F.lit(true), joinType)
      }
    }
    try uncorrelated()
    catch {
      case ae: org.apache.spark.sql.AnalysisException =>
        decorrelated(out, probeExpr, q, joinType, ctx).getOrElse(throw ae)
    }
  }

  /** Decorrelate a Project/Filter-chain subquery: local conjuncts filter the
    * core, conjuncts that do not resolve against it become join conditions. */
  private def decorrelated(
      out: DataFrame,
      probeExpr: Option[Expr],
      q: Relation,
      joinType: String,
      ctx: Context
  ): Option[DataFrame] = {
    var rel = q
    var projItems: List[SelectItem] = Nil
    rel match {
      case Project(c, items, _) => projItems = items; rel = c
      case _ =>
    }
    val filterConjuncts = mutable.ListBuffer.empty[Expr]
    var unwrapping = true
    while (unwrapping) rel match {
      case Filter(c, fcond) => filterConjuncts ++= splitConjuncts(fcond); rel = c
      case _ => unwrapping = false
    }
    if (filterConjuncts.isEmpty) return None
    val core = try lower(rel, ctx) catch { case _: Throwable => return None }
    var coreDf = core
    val scope = relationScopeNames(rel)
    val corr = mutable.ListBuffer.empty[Expr]
    filterConjuncts.foreach { cj =>
      // structural check first: a foreign qualifier would silently resolve to
      // the bare inner column (always-true/false condition), not throw
      if (hasForeignQualifier(cj, scope, coreDf.columns)) corr += cj
      else
        try coreDf = coreDf.filter(expr(cj, ExprCtx(ctx, aggMode = false, dfOpt = Some(coreDf))))
        catch { case _: org.apache.spark.sql.AnalysisException => corr += cj }
    }
    if (corr.isEmpty) return None
    // correlated conjuncts lower unbound — the join resolves their qualified
    // refs against both children (outer keeps its alias, core keeps its own)
    val ecJoin = ExprCtx(ctx, aggMode = false)
    val corrCond = corr.toList.map(expr(_, ecJoin)).reduce(_ && _)
    val cond = probeExpr match {
      case Some(pe) =>
        val probe = expr(pe, ExprCtx(ctx, aggMode = false, dfOpt = Some(out)))
        val subCol = projItems.headOption
          .map(it => expr(it.expr, ExprCtx(ctx, aggMode = false, dfOpt = Some(coreDf))))
          .getOrElse(coreDf(coreDf.columns.head))
        corrCond && (probe === subCol)
      case None => corrCond
    }
    Some(out.join(coreDf, cond, joinType))
  }

  private def sortCol(si: SortItem, df: DataFrame, ctx: Context): Column = {
    val base = si.expr match {
      case LongLit(n) => F.col(df.columns((n - 1).toInt)) // ordinal: order by 1
      case e => expr(e, ExprCtx(ctx, aggMode = false, dfOpt = Some(df)))
    }
    (si.descending, si.nullsFirst) match {
      case (false, None) => base.asc
      case (true, None) => base.desc
      case (false, Some(true)) => base.asc_nulls_first
      case (false, Some(false)) => base.asc_nulls_last
      case (true, Some(true)) => base.desc_nulls_first
      case (true, Some(false)) => base.desc_nulls_last
    }
  }

  // ---------------------------------------------------------------------------
  // Expression lowering
  // ---------------------------------------------------------------------------
  final case class ExprCtx(
      ctx: Context,
      aggMode: Boolean,
      env: Map[String, Column] = Map.empty,
      dfOpt: Option[DataFrame] = None,
      inlineDepth: Int = 0
  )

  /** Inline a user `def` by argument substitution (reference:
    * FunctionInliner.scala:43+ — sql-template expansion; here the template is
    * the AST and the result is a Column tree). */
  private def inlineUserFunc(name: String, args: List[Expr], ec: ExprCtx): Column = {
    val fd = ec.ctx.funcs(name)
    if (args.length != fd.params.length)
      throw new LoweringException(
        s"function ${fd.name} expects ${fd.params.length} argument(s), got ${args.length}")
    if (ec.inlineDepth > 20)
      throw new LoweringException(
        s"user function inlining exceeded depth 20 — is '${fd.name}' recursive?")
    val bound = fd.params.zip(args).toMap
    val body2 = transformExpr(fd.body) {
      case Ident(p) if bound.contains(p) => bound(p)
    }
    expr(body2, ec.copy(inlineDepth = ec.inlineDepth + 1))
  }

  /** Inline a type member def (`type t = { def m = … }`): bind `this` (and
    * `${this}` inside sql templates) to the target expression, then lower the
    * body. Row-level members (`_.m`) reference columns directly. */
  private def inlineTypeMember(name: String, target: Expr, ec: ExprCtx): Column = {
    if (ec.inlineDepth > 20)
      throw new LoweringException(
        s"type member inlining exceeded depth 20 — is '$name' recursive?")
    val targetSqlName: Option[String] = target match {
      case Ident(c) => Some(c)
      case DotRef(Ident(q), c) => Some(s"$q.$c")
      case _ => None
    }
    val body = ec.ctx.typeMemberDefs(name)._1
    val substituted = transformExpr(body) {
      case Ident("this") => target
      case RawSqlExpr(s) if targetSqlName.isDefined =>
        RawSqlExpr(s.replace("${this}", targetSqlName.get))
    }
    expr(substituted, ec.copy(inlineDepth = ec.inlineDepth + 1))
  }

  def expr(e: Expr, ec: ExprCtx): Column = e match {
    case NullLit() => F.lit(null)
    case BoolLit(b) => F.lit(b)
    case LongLit(v) => F.lit(v)
    case DoubleLit(v) => F.lit(v)
    case DecimalLit(v) => F.lit(v)
    case StringLit(s) => F.lit(s)
    case ArrayLit(items) => F.array(items.map(expr(_, ec)): _*)
    case MapLit(entries) =>
      F.map(entries.flatMap { case (k, v) => List(expr(k, ec), expr(v, ec)) }: _*)
    case StructLit(fields) =>
      F.struct(fields.map { case (n, v) => expr(v, ec).as(n) }: _*)
    case Star(None) => F.col("*")
    case Star(Some(q)) => F.col(s"$q.*")

    case RawSqlExpr(s) =>
      // sql"…" fragment: remaining `${x}` placeholders degrade to bare
      // identifiers (engine-side references), then Spark parses the fragment
      F.expr(s.replaceAll("""\$\{([A-Za-z_][A-Za-z0-9_.]*)\}""", "$1"))

    case Ident(name) =>
      ec.env.get(name)
        .orElse(ec.ctx.vals.get(name).map(v => expr(v, ec)))
        .orElse(ec.ctx.funcs.get(name.toLowerCase).filter(_.params.isEmpty)
          .map(_ => inlineUserFunc(name.toLowerCase, Nil, ec)))
        .orElse {
          // zero-arg builtins usable without parens (ulid_string, now, …) —
          // a real column of the same name wins
          val lower = name.toLowerCase
          if (zeroArgBuiltins.contains(lower) &&
            !ec.dfOpt.exists(_.columns.exists(_.equalsIgnoreCase(name))))
            Some(expr(FunctionCall(lower, Nil), ec))
          else None
        }
        .getOrElse(F.col(name))

    case Underscore =>
      if (ec.aggMode) F.lit(1) // _.count → count(1); other agg methods special-cased
      else ec.env.getOrElse("_", F.col("*"))

    case DotRef(target, name) =>
      val lname = name.toLowerCase
      if (ec.aggMode && Stdlib.isAggMethod(lname)) {
        val t = target match {
          case Underscore => F.lit(1)
          case other => expr(other, ec.copy(aggMode = false))
        }
        Stdlib.aggMethods(lname)(t, Nil)
      } else if (Stdlib.scalarMethods.contains(lname) && !resolvesAsColumn(target, name, ec)) {
        Stdlib.scalarMethods(lname)(expr(target, ec), Nil)
      } else if (ec.ctx.funcs.get(lname).exists(_.params.length == 1) &&
          !resolvesAsColumn(target, name, ec)) {
        // zero-paren method-style user def: x.f == f(x)
        inlineUserFunc(lname, List(target), ec)
      } else if (ec.ctx.typeMemberDefs.contains(lname) &&
          !resolvesAsColumn(target, name, ec)) {
        // type member def: `_.is_valid_behavior`, `td_user_agent.category`
        // (reference: sql-template methods on `type` blocks) — inline the
        // member body with `this`/placeholders bound to the target
        inlineTypeMember(lname, target, ec)
      } else
        target match {
          case Ident(q) if ec.env.contains(q) => ec.env(q).getField(name)
          case Ident(q) =>
            // qualified column `q.c`: after joins the qualifier may be gone
            // from the output — probe the DataFrame and fall back to the
            // bare column name (reference merges join columns similarly)
            ec.dfOpt match {
              case Some(df) =>
                try { df(s"$q.$name") }
                catch {
                  case _: Throwable =>
                    if (df.columns.exists(_.equalsIgnoreCase(name))) F.col(name)
                    else F.col(s"$q.$name")
                }
              case None => F.col(s"$q.$name")
            }
          case other => expr(other, ec).getField(name)
        }

    case MethodCall(target, name, args) =>
      val lname = name.toLowerCase
      if (ec.aggMode && Stdlib.isAggMethod(lname)) {
        val t = target match {
          case Underscore => F.lit(1)
          case other => expr(other, ec.copy(aggMode = false))
        }
        Stdlib.aggMethods(lname)(t, args.map(expr(_, ec.copy(aggMode = false))))
      } else if (lname == "in") {
        expr(target, ec).isin(args.map(a => constValue(a).getOrElse(expr(a, ec))): _*)
      } else if (lname == "not_in") {
        !expr(target, ec).isin(args.map(a => constValue(a).getOrElse(expr(a, ec))): _*)
      } else if (lname == "between") {
        expr(target, ec).between(expr(args.head, ec), expr(args(1), ec))
      } else if (Stdlib.scalarMethods.contains(lname)) {
        Stdlib.scalarMethods(lname)(expr(target, ec), args.map(expr(_, ec)))
      } else if (higherOrder.contains(lname)) {
        lowerHigherOrder(lname, target, args, ec)
      } else if (ec.ctx.funcs.contains(lname)) {
        // method-style user-def call: x.f(a) == f(x, a)
        inlineUserFunc(lname, target :: args, ec)
      } else {
        // fall back to function-call form: x.f(a) == f(x, a)
        F.call_function(name, (target :: args).map(expr(_, ec)): _*)
      }

    case fc: FunctionCall => lowerFunction(fc, ec)

    case WindowApply(fn, spec) => lowerWindow(fn, spec, ec)

    case BinaryOp(op, l, r) =>
      val (lc, rc) = (expr(l, ec), expr(r, ec))
      op match {
        case "and" => lc && rc
        case "or" => lc || rc
        case "=" => lc === rc
        case "!=" | "<>" => lc =!= rc
        case "<=>" => lc <=> rc
        case "<" => lc < rc
        case "<=" => lc <= rc
        case ">" => lc > rc
        case ">=" => lc >= rc
        case "+" =>
          if (isStringy(l, ec) || isStringy(r, ec)) F.concat(lc.cast("string"), rc.cast("string"))
          else lc + rc
        case "-" => lc - rc
        case "*" => lc * rc
        case "/" => lc / rc
        case "//" => F.floor(lc / rc).cast("bigint")
        case "%" => lc % rc
        case "||" => F.concat(lc.cast("string"), rc.cast("string"))
        case other => throw new LoweringException(s"unsupported operator: $other")
      }

    case UnaryOp("-", operand) => -expr(operand, ec)
    case UnaryOp(op, _) => throw new LoweringException(s"unsupported unary op: $op")
    case Not(operand) => !expr(operand, ec)
    case IsNull(operand, negated) =>
      if (negated) expr(operand, ec).isNotNull else expr(operand, ec).isNull
    case Between(operand, lo, hi, negated) =>
      val b = expr(operand, ec).between(expr(lo, ec), expr(hi, ec))
      if (negated) !b else b
    case InList(TupleLit(fields), items, negated) =>
      // tuple-IN (reference exprs.scala:430-450): expand to a disjunction of
      // conjunctive equalities — stays inside codegen, no struct allocation
      val lhs = fields.map(expr(_, ec))
      val in = items.map {
        case TupleLit(rhs) =>
          if (rhs.length != fields.length)
            throw new LoweringException(
              s"tuple IN arity mismatch: ${fields.length} vs ${rhs.length}")
          lhs.zip(rhs.map(expr(_, ec))).map { case (l, r) => l === r }.reduce(_ && _)
        case other =>
          throw new LoweringException(s"tuple IN requires tuple items, got $other")
      }.reduce(_ || _)
      if (negated) !in else in
    case InList(operand, items, negated) =>
      val in = expr(operand, ec).isin(items.map(i => constValue(i).getOrElse(expr(i, ec))): _*)
      if (negated) !in else in
    case TupleLit(items) => F.struct(items.map(expr(_, ec)): _*)
    case ParamRef(i) =>
      if (i >= ec.ctx.params.length)
        throw new LoweringException(
          s"prepared parameter ?${i + 1} has no bound value (${ec.ctx.params.length} provided)")
      F.lit(ec.ctx.params(i))
    case AtTimeZone(operand, tz) =>
      // interpret/convert instant to the target zone's local wall time
      // (timestamp_ntz result, like engines render TIMESTAMP AT TIME ZONE)
      F.convert_timezone(expr(tz, ec), expr(operand, ec))
    case LikeOp(operand, pattern, negated) =>
      val lk = F.call_function("like", expr(operand, ec), expr(pattern, ec))
      if (negated) !lk else lk
    case RLikeOp(operand, pattern, negated) =>
      val rl = F.call_function("rlike", expr(operand, ec), expr(pattern, ec))
      if (negated) !rl else rl
    case Cast(operand, tpe, isTry) =>
      val c = expr(operand, ec)
      val sparkType = mapTypeName(tpe)
      if (isTry) c.try_cast(sparkType) else c.cast(sparkType)
    case CaseWhen(target, branches, otherwise) =>
      val whens = target match {
        case Some(t) =>
          val tc = expr(t, ec)
          branches.map { case (c, v) => (tc === expr(c, ec), expr(v, ec)) }
        case None => branches.map { case (c, v) => (expr(c, ec), expr(v, ec)) }
      }
      val first = F.when(whens.head._1, whens.head._2)
      val chained = whens.tail.foldLeft(first) { case (acc, (c, v)) => acc.when(c, v) }
      otherwise.map(o => chained.otherwise(expr(o, ec))).getOrElse(chained)
    case IfExpr(cond, t, f) =>
      F.when(expr(cond, ec), expr(t, ec)).otherwise(f.map(expr(_, ec)).getOrElse(F.lit(null)))
    case Interpolation(parts, args) =>
      val pieces = List.newBuilder[Column]
      parts.zipWithIndex.foreach { case (p, i) =>
        if (p.nonEmpty) pieces += F.lit(p)
        if (i < args.length) pieces += expr(args(i), ec).cast("string")
      }
      F.concat(pieces.result(): _*)
    case Extract(field, from) => F.date_part(F.lit(field), expr(from, ec))
    case Subscript(target, index) =>
      index match {
        // string subscript: struct field / map key access via getItem
        case StringLit(s) => expr(target, ec).getItem(s)
        // element_at requires an INT ordinal for arrays
        case LongLit(v) => F.element_at(expr(target, ec), F.lit(v.toInt))
        case _ => F.element_at(expr(target, ec), expr(index, ec))
      }
    case LambdaExpr(_, _) =>
      throw new LoweringException("lambda outside higher-order function context")
    case ScalarSubquery(_) =>
      // Every supported position (where / select / add / agg / having /
      // join-on) binds scalar subqueries LAZILY via bindScalarSubqueries —
      // reaching this case means an unsupported position (e.g. a sort key).
      // Throw instead of silently running an eager driver-side job.
      throw new LoweringException(
        "scalar subquery is not supported in this position; supported: " +
          "where, select, add, agg, having, join conditions")
    case InSubquery(_, _, _) | ExistsExpr(_) =>
      // reached for non-conjunct positions too (e.g. `x in {…} or y > 5`:
      // the subquery extraction walks top-level AND conjuncts only) — name
      // the actual limitation and a rewrite, not a false "outside where"
      throw new LoweringException(
        "IN/EXISTS subqueries are supported only as top-level AND conjuncts " +
          "of where/having (and join conditions) — a subquery under OR/NOT " +
          "is not decorrelated; rewrite as a union of filters or join the " +
          "subquery explicitly")
    case Underscore => F.lit(1)
    case other => throw new LoweringException(s"cannot lower expression: $other")
  }

  /** True when `target.name` resolves as a qualified column of the current
    * DataFrame — a column named like a scalar method (e.g. `t.length`) then
    * wins over the method interpretation. */
  private def resolvesAsColumn(target: Expr, name: String, ec: ExprCtx): Boolean = target match {
    case Ident(q) =>
      ec.dfOpt.exists { df =>
        try { df(s"$q.$name"); true }
        catch { case _: Throwable => false }
      }
    case _ => false
  }

  private def isStringy(e: Expr, ec: ExprCtx): Boolean = e match {
    case StringLit(_) | Interpolation(_, _) => true
    case BinaryOp("+", l, r) => isStringy(l, ec) || isStringy(r, ec)
    case _ => false
  }

  /** `_1`, `_2`, … reference grouping keys positionally in agg/select items
    * over a grouped relation (reference: agg_tpe_resolve.wv). */
  private def bindPositionalKeys(e: Expr, keys: List[SelectItem]): Expr =
    transformExpr(e) {
      case Ident(n)
          if n.length > 1 && n.head == '_' && n.tail.forall(_.isDigit) &&
            n.tail.toInt >= 1 && n.tail.toInt <= keys.length =>
        keys(n.tail.toInt - 1).expr
    }

  /** Zero-argument builtins callable as bare identifiers. */
  private val zeroArgBuiltins: Set[String] =
    Set("ulid", "ulid_string", "uuid", "current_date", "current_timestamp", "now")

  // Higher-order array functions: arr.filter(x -> …), arr.transform, …
  private val higherOrder = Set("filter", "transform", "map_each", "exists",
    "all_match", "reduce", "aggregate", "zip_with", "array_sort")

  private def lowerHigherOrder(name: String, target: Expr, args: List[Expr], ec: ExprCtx): Column = {
    val t = expr(target, ec)
    def fn1(l: Expr): Column => Column = l match {
      case LambdaExpr(p :: Nil, body) => (x: Column) => expr(body, ec.copy(env = ec.env + (p -> x)))
      case other => throw new LoweringException(s"expected 1-arg lambda, got $other")
    }
    def fn2(l: Expr): (Column, Column) => Column = l match {
      case LambdaExpr(p1 :: p2 :: Nil, body) =>
        (a: Column, b: Column) => expr(body, ec.copy(env = ec.env + (p1 -> a) + (p2 -> b)))
      case other => throw new LoweringException(s"expected 2-arg lambda, got $other")
    }
    name match {
      case "filter" => F.filter(t, fn1(args.head))
      case "transform" | "map_each" => F.transform(t, fn1(args.head))
      case "exists" => F.exists(t, fn1(args.head))
      case "all_match" => F.forall(t, fn1(args.head))
      case "reduce" | "aggregate" =>
        F.aggregate(t, expr(args.head, ec), fn2(args(1)))
      case "zip_with" => F.zip_with(t, expr(args.head, ec), fn2(args(1)))
      case "array_sort" =>
        // the comparator contract is an INT return; wv integer literals are
        // longs, so coerce the comparator result
        val cmp = fn2(args.head)
        F.array_sort(t, (a, b) => cmp(a, b).cast("int"))
      case other => throw new LoweringException(s"unsupported higher-order fn: $other")
    }
  }

  /** Aggregates that take a single value argument — eligible for the generic
    * FILTER (WHERE …) rewrite `agg(when(cond, x))` (nulls are ignored by all
    * of them) and for `__orderby`-aware collection. */
  private val singleArgAggs: Set[String] = Set(
    "sum", "avg", "min", "max", "median", "any_value", "arbitrary",
    "stddev", "stddev_samp", "stddev_pop", "variance", "var_samp", "var_pop",
    "skewness", "kurtosis", "collect_list", "array_agg", "collect_set",
    "approx_count_distinct", "count_if", "bool_and", "bool_or", "mode",
    "bit_and", "bit_or", "bit_xor", "product")

  private def lowerFunction(fc: FunctionCall, ec: ExprCtx): Column = {
    val name = fc.name.toLowerCase
    // strip parser-internal order-by args (string_agg(x order by y) etc.)
    val (orderArgsRaw, plainArgs) = fc.args.partition {
      case FunctionCall("__orderby", _, _, _) => true
      case _ => false
    }
    val orderArgs: List[(Expr, Boolean)] = orderArgsRaw.map {
      case FunctionCall("__orderby", List(e, BoolLit(desc)), _, _) => (e, desc)
      case other => throw new LoweringException(s"malformed order-by arg: $other")
    }
    val args = plainArgs

    // aggregate FILTER (WHERE cond): rewritten as agg(when(cond, x)) — valid
    // for any null-ignoring single-value aggregate; count(*) counts when(cond,1)
    val filt: Option[Column] = fc.filter.map(f0 => expr(f0, ec))
    def ag(c: Column): Column = filt.fold(c)(p => F.when(p, c))
    val isKnownAgg = Stdlib.aggFunctionNames.contains(name) || singleArgAggs.contains(name)
    if (filt.isDefined && !isKnownAgg)
      throw new LoweringException(s"FILTER (WHERE …) not supported for function: ${fc.name}")
    if (orderArgs.nonEmpty && name != "string_agg" && name != "listagg" &&
        name != "array_agg" && name != "collect_list")
      throw new LoweringException(s"ORDER BY inside ${fc.name}(…) is not supported")

    // SQL-style higher-order calls — filter(arr, x -> …) — route through
    // the same dispatch as the method form arr.filter(x -> …)
    if (higherOrder.contains(name) && args.length >= 2 &&
        args.tail.exists(_.isInstanceOf[LambdaExpr]))
      return lowerHigherOrder(name, args.head, args.tail, ec)

    def a(i: Int): Column = expr(args(i), ec)
    def all: List[Column] = args.map(expr(_, ec))

    /** collect values in the user-specified `order by` (default: by value),
      * as an array — shared by string_agg / array_agg with order. */
    def orderedCollect(value: Column): Column = {
      if (orderArgs.isEmpty) F.sort_array(F.collect_list(ag(value)))
      else {
        val sortCols = orderArgs.zipWithIndex.map { case ((e, _), i) =>
          expr(e, ec).as(s"__s$i")
        }
        val st = F.struct(sortCols :+ value.as("__v"): _*)
        val arr = F.collect_list(ag(st))
        // array_sort comparator honoring per-key direction; ties broken by
        // the value itself for deterministic output
        val sorted = F.array_sort(arr, (x: Column, y: Column) => {
          val valCmp = F.when(x.getField("__v") < y.getField("__v"), F.lit(-1))
            .when(x.getField("__v") > y.getField("__v"), F.lit(1))
            .otherwise(F.lit(0))
          orderArgs.zipWithIndex.foldRight(valCmp: Column) { case (((_, desc), i), acc) =>
            val (xa, ya) = (x.getField(s"__s$i"), y.getField(s"__s$i"))
            val lt = if (desc) 1 else -1
            F.when(xa.isNull && ya.isNull, acc)
              .when(xa.isNull, F.lit(-lt))   // nulls last on asc (SQL default)
              .when(ya.isNull, F.lit(lt))
              .when(xa < ya, F.lit(lt))
              .when(xa > ya, F.lit(-lt))
              .otherwise(acc)
          }
        })
        F.transform(sorted, x => x.getField("__v"))
      }
    }

    val base: Column = name match {
      case "count" if args.isEmpty || args.headOption.contains(Star(None)) =>
        if (fc.isDistinct) throw new LoweringException("count(distinct *) unsupported")
        F.count(ag(F.lit(1)))
      case "count" if fc.isDistinct => F.countDistinct(ag(all.head), all.tail.map(ag): _*)
      case "count_distinct" => F.countDistinct(ag(all.head), all.tail.map(ag): _*)
      case "count" => F.count(ag(a(0)))
      case "sum" if fc.isDistinct => F.sum_distinct(ag(a(0)))
      case "avg" if fc.isDistinct =>
        // avg(distinct x) = sum(distinct x) / count(distinct x)
        F.sum_distinct(ag(a(0))).cast("double") / F.countDistinct(ag(a(0)))
      case "collect_list" | "array_agg" if fc.isDistinct =>
        // ordered-distinct: dedup after the ordered collect (array_distinct
        // keeps the first occurrence, preserving the order-by position)
        if (orderArgs.nonEmpty) F.array_distinct(orderedCollect(a(0)))
        else F.collect_set(ag(a(0)))
      case _ if fc.isDistinct && !Set("string_agg", "listagg").contains(name) =>
        throw new LoweringException(s"DISTINCT not supported for function: ${fc.name}")
      case "if" =>
        F.when(a(0), a(1)).otherwise(if (args.length > 2) a(2) else F.lit(null))
      case "coalesce" | "or_else" => F.coalesce(all: _*)
      case "unnest" | "explode" =>
        args.headOption match {
          // unnest(null) / unnest([]) → zero rows, typed (explode(NULL) is
          // an analysis error)
          case Some(NullLit()) | Some(ArrayLit(Nil)) =>
            F.explode(F.typedLit(Array.empty[Int]))
          case _ => F.explode(a(0))
        }
      case "concat" => F.concat(all: _*)
      case "collect_list" | "array_agg" if orderArgs.nonEmpty => orderedCollect(a(0))
      case "string_agg" | "listagg" =>
        val sep = if (args.length > 1) a(1) else F.lit(",")
        val arr0 = orderedCollect(a(0).cast("string"))
        val arr = if (fc.isDistinct) {
          if (orderArgs.nonEmpty)
            throw new LoweringException("string_agg(distinct … order by …) unsupported")
          F.array_distinct(arr0)
        } else arr0
        F.call_function("array_join", arr, sep)
      case "row_number" => F.row_number()
      case "rank" => F.rank()
      case "dense_rank" => F.dense_rank()
      case "percent_rank" => F.percent_rank()
      case "cume_dist" => F.cume_dist()
      case "ntile" =>
        constValue(args.head) match {
          case Some(n: Long) => F.ntile(n.toInt)
          case _ => throw new LoweringException("ntile requires integer literal")
        }
      case "lag" | "lead" =>
        val offset = if (args.length > 1) constValue(args(1)).map(_.toString.toInt).getOrElse(1) else 1
        val default: Any = if (args.length > 2) constValue(args(2)).orNull else null
        if (name == "lag") F.lag(a(0), offset, default) else F.lead(a(0), offset, default)
      // FILTER (WHERE c): first non-null of when(c, x) — ignoreNulls makes the
      // rewrite honor the filter (plain first/last keep default null handling)
      case "first_value" | "first" =>
        if (filt.isDefined) F.first(ag(a(0)), ignoreNulls = true) else F.first(a(0))
      case "last_value" | "last" =>
        if (filt.isDefined) F.last(ag(a(0)), ignoreNulls = true) else F.last(a(0))
      case "product" => F.product(ag(a(0)))
      case "arbitrary" | "any_value" => F.any_value(ag(a(0)))
      case "median" => F.median(ag(a(0)))
      case "approx_quantile" | "percentile_approx" =>
        F.percentile_approx(ag(a(0)), a(1), F.lit(10000))
      // DuckDB-style list HOFs in function-call position
      case "list_transform" | "array_transform" if args.length == 2 =>
        lowerHigherOrder("transform", args.head, args.tail, ec)
      case "list_filter" | "array_filter" if args.length == 2 =>
        lowerHigherOrder("filter", args.head, args.tail, ec)
      case "list_reduce" if args.length == 2 =>
        // DuckDB list_reduce: first element is the initial accumulator
        val arr = a(0)
        val fn2 = args(1) match {
          case LambdaExpr(p1 :: p2 :: Nil, body) =>
            (x: Column, y: Column) => expr(body, ec.copy(env = ec.env + (p1 -> x) + (p2 -> y)))
          case other => throw new LoweringException(s"expected 2-arg lambda, got $other")
        }
        F.aggregate(
          F.slice(arr, F.lit(2), F.greatest(F.size(arr) - 1, F.lit(0))),
          F.element_at(arr, 1), fn2)
      case "__interval" =>
        args.head match {
          case StringLit(s) => F.expr(s"interval '$s'")
          case _ => throw new LoweringException("bad interval literal")
        }
      case "__should_be" | "__should_not_be" | "__should_contain" | "__should_not_contain" =>
        throw new LoweringException("test assertion cannot be lowered as a column")
      case "regexp_extract" if args.length == 2 =>
        // DuckDB 2-arg form returns the whole match (group 0)
        F.regexp_extract(a(0), args(1) match {
          case StringLit(p) => p
          case _ => throw new LoweringException("regexp_extract pattern must be a literal")
        }, 0)
      case "current_date" => F.current_date()
      case "current_timestamp" | "now" => F.current_timestamp()
      // NTZ-tolerant epoch conversions (Spark's builtins reject
      // TIMESTAMP_NTZ; the reference's DuckDB backend coerces freely)
      case "unix_micros" if args.length == 1 =>
        graft.functions.EpochTime.unixMicros(a(0))
      case "unix_millis" | "epoch_ms" if args.length == 1 =>
        graft.functions.EpochTime.unixMillis(a(0))
      case "to_unixtime" | "unix_seconds" | "epoch" if args.length == 1 =>
        F.unix_seconds(a(0).cast("timestamp"))
      case "ulid" | "ulid_string" => graft.functions.UlidExpression.ulidString()
      case n if singleArgAggs.contains(n) && args.length == 1 =>
        F.call_function(fc.name, ag(a(0)))
      case _ if ec.ctx.funcs.contains(name) =>
        if (filt.isDefined || fc.isDistinct)
          throw new LoweringException(
            s"DISTINCT / FILTER not applicable to user function: ${fc.name}")
        inlineUserFunc(name, args, ec)
      case _ =>
        if (filt.isDefined)
          throw new LoweringException(s"FILTER (WHERE …) not supported for function: ${fc.name}")
        F.call_function(fc.name, all: _*)
    }
    base
  }

  private def lowerWindow(fn: Expr, spec: WindowSpec, ec: ExprCtx): Column = {
    import org.apache.spark.sql.expressions.Window
    val fnCol = expr(fn, ec.copy(aggMode = true))
    var w = Window.partitionBy(spec.partitionBy.map(expr(_, ec)): _*)
    if (spec.orderBy.nonEmpty)
      w = w.orderBy(spec.orderBy.map { si =>
        val c = expr(si.expr, ec)
        (si.descending, si.nullsFirst) match {
          case (false, None) => c.asc
          case (true, None) => c.desc
          case (false, Some(true)) => c.asc_nulls_first
          case (false, Some(false)) => c.asc_nulls_last
          case (true, Some(true)) => c.desc_nulls_first
          case (true, Some(false)) => c.desc_nulls_last
        }
      }: _*)
    spec.frame.foreach { fr =>
      val start = fr.start.getOrElse(Window.unboundedPreceding)
      val end = fr.end.getOrElse(Window.unboundedFollowing)
      w = if (fr.isRows) w.rowsBetween(start, end) else w.rangeBetween(start, end)
    }
    fnCol.over(w)
  }

  // --- helpers ---------------------------------------------------------------

  /** Does the expression contain an aggregate (dot-agg method or aggregate
    * function call) not wrapped in a window? */
  def hasAgg(e: Expr): Boolean = e match {
    case DotRef(t, n) => Stdlib.isAggMethod(n) || hasAgg(t)
    case MethodCall(t, n, args) =>
      Stdlib.isAggMethod(n) || hasAgg(t) || args.exists(hasAgg)
    case FunctionCall(n, args, _, _) =>
      Stdlib.aggFunctionNames.contains(n.toLowerCase) || args.exists(hasAgg)
    case WindowApply(_, _) => false
    case BinaryOp(_, l, r) => hasAgg(l) || hasAgg(r)
    case UnaryOp(_, x) => hasAgg(x)
    case Not(x) => hasAgg(x)
    case IsNull(x, _) => hasAgg(x)
    case Between(x, lo, hi, _) => hasAgg(x) || hasAgg(lo) || hasAgg(hi)
    case InList(x, items, _) => hasAgg(x) || items.exists(hasAgg)
    case Cast(x, _, _) => hasAgg(x)
    case CaseWhen(t, bs, o) =>
      t.exists(hasAgg) || bs.exists { case (c, v) => hasAgg(c) || hasAgg(v) } || o.exists(hasAgg)
    case IfExpr(c, t, f) => hasAgg(c) || hasAgg(t) || f.exists(hasAgg)
    case Interpolation(_, args) => args.exists(hasAgg)
    case Subscript(t, i) => hasAgg(t) || hasAgg(i)
    case _ => false
  }

  /** Column names referenced by an expression (for pivot group-key inference). */
  private def columnRefs(e: Expr): List[String] = e match {
    case Ident(n) => List(n)
    case DotRef(t, _) => columnRefs(t)
    case MethodCall(t, _, args) => columnRefs(t) ++ args.flatMap(columnRefs)
    case FunctionCall(_, args, _, _) => args.flatMap(columnRefs)
    case BinaryOp(_, l, r) => columnRefs(l) ++ columnRefs(r)
    case UnaryOp(_, x) => columnRefs(x)
    case Cast(x, _, _) => columnRefs(x)
    case _ => Nil
  }

  /** Constant-fold literal expressions (used for Values cells, pivot values,
    * isin lists; reference: transform/ExpressionEvaluator.scala). */
  def constValue(e: Expr): Option[Any] = e match {
    case ArrayLit(items) =>
      val vs = items.map(constValue)
      if (vs.forall(_.isDefined)) Some(vs.map(_.get)) else None
    case NullLit() => Some(null)
    case BoolLit(b) => Some(b)
    case LongLit(v) => Some(v)
    case DoubleLit(v) => Some(v)
    case DecimalLit(v) => Some(v)
    case StringLit(s) => Some(s)
    case UnaryOp("-", x) =>
      constValue(x).map {
        case v: Long => -v
        case v: Double => -v
        case v: BigDecimal => -v
        case other => return None
      }
    case BinaryOp(op, l, r) =>
      for {
        lv <- constValue(l)
        rv <- constValue(r)
        result <- (lv, rv) match {
          case (a: Long, b: Long) =>
            op match {
              case "+" => Some(a + b)
              case "-" => Some(a - b)
              case "*" => Some(a * b)
              case "/" => Some(a.toDouble / b)
              case _ => None
            }
          case (a: String, b: String) if op == "+" || op == "||" => Some(a + b)
          case _ => None
        }
      } yield result
    case _ => None
  }

  /** Spark type → language-level type display name (reference: long not
    * bigint, etc. — describe.wv output shape). */
  def wvTypeName(dt: DataType): String = dt match {
    case LongType => "long"
    case IntegerType => "int"
    case ShortType => "short"
    case ByteType => "byte"
    case FloatType => "float"
    case ArrayType(et, _) => s"array(${wvTypeName(et)})"
    case MapType(k, v, _) => s"map(${wvTypeName(k)},${wvTypeName(v)})"
    case other => other.simpleString
  }

  /** Graft type name → Spark SQL DDL type string (SURVEY §1.2 mapping). */
  def mapTypeName(t: String): String = {
    val base = t.toLowerCase
    base match {
      case "int" | "integer" => "int"
      case "long" | "bigint" => "bigint"
      case "short" | "smallint" => "smallint"
      case "byte" | "tinyint" => "tinyint"
      case "float" | "real" => "float"
      case "double" => "double"
      case "string" | "varchar" | "text" | "json" => "string"
      case "boolean" | "bool" => "boolean"
      case "date" => "date"
      case "time" => "timestamp_ntz"
      case "timestamp" => "timestamp"
      case "binary" => "binary"
      case other if other.startsWith("decimal") => other
      case other if other.startsWith("varchar") || other.startsWith("char") => "string"
      case other if other.startsWith("array") || other.startsWith("map") ||
        other.startsWith("struct") => other
      case other => other
    }
  }
}
