package graft.lang

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** Stdlib method surface: the reference defines these as `sql"..."` templates on
  * column types (/root/reference/wvlet-stdlib/module/standard/ — string.wv, int.wv, array.wv);
  * here each maps directly to a Catalyst `Column` builder so everything stays
  * inside whole-stage codegen (no UDFs).
  */
object Stdlib {

  /** Aggregation methods available via dot-syntax on grouped columns
    * (reference: wvlet-stdlib/module/standard/array.wv, resolved by
    * analyzer/AggregationResolver.scala:30-62).
    * Key: method name; value: (target, args) => aggregate Column.
    */
  val aggMethods: Map[String, (Column, List[Column]) => Column] = Map(
    "count" -> ((t, _) => F.count(t)),
    "count_distinct" -> ((t, _) => F.countDistinct(t)),
    "count_if" -> ((t, args) => F.count_if(if (args.nonEmpty) args.head else t)),
    "count_approx_distinct" -> ((t, _) => F.approx_count_distinct(t)),
    "approx_count_distinct" -> ((t, _) => F.approx_count_distinct(t)),
    "sum" -> ((t, _) => F.sum(t)),
    "avg" -> ((t, _) => F.avg(t)),
    "mean" -> ((t, _) => F.avg(t)),
    "min" -> ((t, _) => F.min(t)),
    "max" -> ((t, _) => F.max(t)),
    "median" -> ((t, _) => F.median(t)),
    "mode" -> ((t, _) => F.mode(t)),
    "variance" -> ((t, _) => F.variance(t)),
    "var_samp" -> ((t, _) => F.var_samp(t)),
    "var_pop" -> ((t, _) => F.var_pop(t)),
    "stddev" -> ((t, _) => F.stddev(t)),
    "stddev_samp" -> ((t, _) => F.stddev_samp(t)),
    "stddev_pop" -> ((t, _) => F.stddev_pop(t)),
    "arbitrary" -> ((t, _) => F.any_value(t)),
    "any" -> ((t, _) => F.any_value(t)),
    "any_value" -> ((t, _) => F.any_value(t)),
    "first" -> ((t, _) => F.first(t)),
    "last" -> ((t, _) => F.last(t)),
    "min_by" -> ((t, args) => F.min_by(t, args.head)),
    "max_by" -> ((t, args) => F.max_by(t, args.head)),
    "approx_quantile" -> ((t, args) => F.percentile_approx(t, args.head, F.lit(10000))),
    "percentile" -> ((t, args) => F.percentile(t, args.head)),
    "to_array" -> ((t, _) => F.collect_list(t)),
    "array_agg" -> ((t, _) => F.collect_list(t)),
    "array_distinct_agg" -> ((t, _) => F.collect_set(t)),
    "string_agg" -> ((t, args) => {
      val sep = if (args.nonEmpty) args.head else F.lit(",")
      F.call_function("array_join", F.sort_array(F.collect_list(t.cast("string"))), sep)
    }),
    "bool_and" -> ((t, _) => F.bool_and(t)),
    "bool_or" -> ((t, _) => F.bool_or(t)),
    "exists_agg" -> ((t, _) => F.bool_or(t))
  )

  /** True when the method name is an aggregation method (drives dot-agg
    * resolution inside agg/having contexts). */
  def isAggMethod(name: String): Boolean = aggMethods.contains(name.toLowerCase)

  /** SQL aggregate function names recognized in plain function-call position. */
  val aggFunctionNames: Set[String] = Set(
    "count", "sum", "avg", "mean", "min", "max", "median", "mode",
    "count_if", "approx_count_distinct", "percentile", "percentile_approx",
    "variance", "var_samp", "var_pop", "stddev", "stddev_samp", "stddev_pop",
    "corr", "covar_pop", "covar_samp", "skewness", "kurtosis",
    "first", "first_value", "last", "last_value", "any_value", "arbitrary",
    "min_by", "max_by", "collect_list", "collect_set", "array_agg", "string_agg",
    "listagg", "bool_and", "bool_or", "bit_and", "bit_or", "bit_xor",
    "count_distinct", "sum_distinct", "hll_sketch_agg", "grouping", "grouping_id"
  )

  /** JSON path arguments accept both `$.k` JSONPath and bare `k` key names
    * (the reference's DuckDB backend accepts both spellings); bare names
    * get the `$.` prefix. Runtime-conditional so non-literal path columns
    * work too — constant-folded away for the literal case. */
  private def pathArg(args: List[Column]): Column = args.headOption match {
    case Some(c) =>
      F.when(F.startswith(c, F.lit("$")), c).otherwise(F.concat(F.lit("$."), c))
    case None => F.lit("$")
  }

  /** Window-only function names. */
  val windowFunctionNames: Set[String] = Set(
    "row_number", "rank", "dense_rank", "percent_rank", "ntile", "cume_dist",
    "lag", "lead", "nth_value"
  )

  /** Scalar methods available via dot-syntax on any column
    * (reference: wvlet-stdlib string.wv / int.wv / double.wv / date.wv …). */
  val scalarMethods: Map[String, (Column, List[Column]) => Column] = Map(
    // casts
    "to_string" -> ((t, _) => t.cast("string")),
    "to_int" -> ((t, _) => t.cast("int")),
    "to_long" -> ((t, _) => t.cast("bigint")),
    "to_float" -> ((t, _) => t.cast("float")),
    "to_double" -> ((t, _) => t.cast("double")),
    "to_boolean" -> ((t, _) => t.cast("boolean")),
    "to_date" -> ((t, _) => t.cast("date")),
    "to_timestamp" -> ((t, _) => t.cast("timestamp")),
    "to_decimal" -> ((t, args) => t.cast(s"decimal(38,9)")),
    // null handling
    "or_else" -> ((t, args) => F.coalesce(t, args.head)),
    "if_null" -> ((t, args) => F.coalesce(t, args.head)),
    "null_if" -> ((t, args) => F.nullif(t, args.head)),
    "is_null" -> ((t, _) => t.isNull),
    "is_not_null" -> ((t, _) => t.isNotNull),
    // numeric
    "round" -> ((t, args) =>
      if (args.isEmpty) F.round(t) else F.call_function("round", t :: args: _*)),
    "floor" -> ((t, _) => F.floor(t)),
    "ceil" -> ((t, _) => F.ceil(t)),
    "abs" -> ((t, _) => F.abs(t)),
    "sqrt" -> ((t, _) => F.sqrt(t)),
    "exp" -> ((t, _) => F.exp(t)),
    "ln" -> ((t, _) => F.log(t)),
    "log10" -> ((t, _) => F.log10(t)),
    "log2" -> ((t, _) => F.log2(t)),
    "pow" -> ((t, args) => F.pow(t, args.head)),
    "sign" -> ((t, _) => F.signum(t)),
    // string
    "length" -> ((t, _) => F.length(t)),
    "strlen" -> ((t, _) => F.length(t)),
    "lower" -> ((t, _) => F.lower(t)),
    "upper" -> ((t, _) => F.upper(t)),
    "trim" -> ((t, _) => F.trim(t)),
    "ltrim" -> ((t, _) => F.ltrim(t)),
    "rtrim" -> ((t, _) => F.rtrim(t)),
    "reverse" -> ((t, _) => F.reverse(t)),
    "substring" -> ((t, args) =>
      if (args.length >= 2) t.substr(args.head, args(1))
      else t.substr(args.head, F.lit(Int.MaxValue))),
    "substr" -> ((t, args) =>
      if (args.length >= 2) t.substr(args.head, args(1))
      else t.substr(args.head, F.lit(Int.MaxValue))),
    "replace" -> ((t, args) => F.replace(t, args.head, args(1))),
    "contains" -> ((t, args) => t.contains(args.head)),
    "starts_with" -> ((t, args) => F.startswith(t, args.head)),
    "ends_with" -> ((t, args) => F.endswith(t, args.head)),
    "split" -> ((t, args) => F.call_function("split", t :: args: _*)),
    "lpad" -> ((t, args) => F.call_function("lpad", t :: args: _*)),
    "rpad" -> ((t, args) => F.call_function("rpad", t :: args: _*)),
    "regexp_like" -> ((t, args) => F.regexp_like(t, args.head)),
    "regexp_matches" -> ((t, args) => F.regexp_like(t, args.head)),
    "regexp_replace" -> ((t, args) => F.regexp_replace(t, args.head, args(1))),
    "regexp_extract" -> ((t, args) => F.call_function("regexp_extract", t :: args: _*)),
    "like" -> ((t, args) => F.call_function("like", t, args.head)),
    "strftime" -> ((t, args) => F.call_function("date_format", t, args.head)),
    "date_format" -> ((t, args) => F.call_function("date_format", t, args.head)),
    "md5" -> ((t, _) => F.md5(t.cast("binary"))),
    "sha256" -> ((t, _) => F.sha2(t.cast("binary"), 256)),
    "hash" -> ((t, _) => F.xxhash64(t)),
    "to_json" -> ((t, _) => F.to_json(t)),
    // json (the reference's `json` type is engine-delegated — DataType.scala:562;
    // here json columns are strings + SQL json path functions)
    "json_extract_string" -> ((t, args) =>
      F.call_function("get_json_object", t, pathArg(args))),
    "json_value" -> ((t, args) =>
      F.call_function("get_json_object", t, pathArg(args))),
    "json_array_length" -> ((t, args) =>
      F.json_array_length(if (args.isEmpty) t
      else F.call_function("get_json_object", t, pathArg(args)))),
    // date/time
    "year" -> ((t, _) => F.year(t)),
    "month" -> ((t, _) => F.month(t)),
    "day" -> ((t, _) => F.dayofmonth(t)),
    "hour" -> ((t, _) => F.hour(t)),
    "minute" -> ((t, _) => F.minute(t)),
    "second" -> ((t, _) => F.second(t)),
    "date_trunc" -> ((t, args) => F.call_function("date_trunc", args.head, t)),
    "last_day" -> ((t, _) => F.last_day(t)),
    "extract" -> ((t, args) => F.date_part(args.head, t)),
    // array
    "size" -> ((t, _) => F.size(t)),
    "array_size" -> ((t, _) => F.size(t)),
    "array_distinct" -> ((t, _) => F.array_distinct(t)),
    "array_contains" -> ((t, args) => F.call_function("array_contains", t, args.head)),
    // reference stdlib array `exclude` (wvlet-stdlib/module/standard/
    // array.wv:27-28 — per-dialect: array_filter for duckdb, array_except
    // for trino); Spark's array_except IS the trino spelling. NOTE:
    // array_except also dedups the left side (set semantics), same as
    // Trino's — the duckdb filter spelling keeps duplicates, a documented
    // reference inconsistency the WvToSql duckdb target mirrors faithfully
    // only for deduped inputs.
    "exclude" -> ((t, args) => F.array_except(t, args.head)),
    "array_except" -> ((t, args) => F.array_except(t, args.head)),
    "array_join" -> ((t, args) => F.call_function("array_join", t, args.head)),
    "array_sort" -> ((t, _) => F.sort_array(t)),
    "flatten" -> ((t, _) => F.flatten(t)),
    // text-pipeline methods (graft.functions.TextFunctions — the LLM-data
    // operators exposed as first-class language methods, e.g.
    // `from documents where text.quality_score > 0.5`)
    "token_count" -> ((t, _) => graft.functions.TextFunctions.tokenCount(t)),
    "subword_count" -> ((t, _) => graft.functions.TextFunctions.subwordCountEstimate(t)),
    "quality_score" -> ((t, _) => graft.functions.TextFunctions.qualityScore(t)),
    "lang_id" -> ((t, _) => graft.functions.TextFunctions.langId(t)),
    "fingerprint" -> ((t, _) => graft.functions.TextFunctions.fingerprint(t)),
    "redact_pii" -> ((t, _) => graft.functions.TextFunctions.redactPii(t)),
    "strip_html" -> ((t, _) => graft.functions.TextFunctions.stripHtml(t)),
    "stopword_ratio" -> ((t, _) => graft.functions.TextFunctions.stopwordRatio(t)),
    "alpha_ratio" -> ((t, _) => graft.functions.TextFunctions.alphaRatio(t)),
    "dup_line_fraction" -> ((t, _) => graft.functions.TextFunctions.duplicateLineFraction(t)),
    "dup_char_fraction" -> ((t, _) => graft.functions.TextFunctions.duplicateLineCharFraction(t)),
    "top_token_fraction" -> ((t, _) => graft.functions.TextFunctions.topTokenFraction(t)),
    "sentence_count" -> ((t, _) => graft.functions.TextFunctions.sentenceCount(t)),
    "terminal_punct_line_fraction" ->
      ((t, _) => graft.functions.TextFunctions.terminalPunctLineFraction(t)),
    "c4_clean" -> ((t, _) => graft.functions.TextFunctions.c4CleanLines(t)),
    "c4_keep" -> ((t, _) => graft.functions.TextFunctions.c4PageKeep(t)),
    "simhash64" -> ((t, _) => graft.operators.Dedup.simhash(t)),
    // vector methods over Array[Float]/Array[Double] embedding columns
    "cosine_similarity" -> ((t, args) =>
      graft.functions.VectorExpressions.cosineSimilarity(t, args.head)),
    "dot_product" -> ((t, args) =>
      graft.functions.VectorExpressions.dotProduct(t, args.head)),
    // per-vector symmetric int8 quantization (operators/Similarity): struct
    // of the scale (max|v|) and the quantized array<tinyint> — persist the
    // struct once (CTAS) for a 4×-smaller similarity index
    "quantize_int8" -> ((t, _) => {
      // let-bind the scale via a 1-element transform lambda: the scale
      // subtree is evaluated ONCE and referenced as a lambda variable in
      // both struct fields — passing the int8Scale expression inline would
      // copy the array_max subtree into every element's quantize lambda
      import org.apache.spark.sql.{functions => F}
      F.element_at(
        F.transform(F.array(graft.operators.Similarity.int8Scale(t)), s =>
          F.struct(
            s.as("scale"),
            graft.operators.Similarity.quantizeInt8(t, s).as("q"))),
        1)
    })
  )
}
