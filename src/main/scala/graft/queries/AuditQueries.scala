package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.{Drift, Expectations, Graph}

/** Dataset-audit operators a production training-data pipeline runs as
  * standing gates (beyond the reference, which has no audit surface at
  * all — cmd/parquetgo-record-processor/handler.go:104-252 transforms
  * records with zero validation): a one-pass declarative expectation suite
  * ([[graft.operators.Expectations]], the deequ posture), distribution
  * drift between dataset slices ([[graft.operators.Drift]], PSI + JSD),
  * and exact triangle counting over the user co-activity graph
  * ([[graft.operators.Graph.triangles]], the clustering-structure audit
  * for interaction data).
  */
object AuditQueries {

  type Q = (SparkSession, String) => DataFrame

  private def round6(c: Column): Column =
    graft.operators.Fixed.round6(c)

  /** The documents-table expectation suite: completeness, key uniqueness,
    * bounds, domain conformance. Shared by the query and the spec so both
    * certify the same contract.
    */
  def documentChecks: Seq[Expectations.Check] = Seq(
    Expectations.Check("completeness_text",
      Expectations.completeness("text"), 1.0, 1.0),
    Expectations.Check("completeness_lang",
      Expectations.completeness("lang"), 1.0, 1.0),
    Expectations.Check("uniqueness_doc_id",
      Expectations.uniqueness("doc_id"), 1.0, 1.0),
    Expectations.Check("min_n_chars",
      min(col("n_chars")).cast("double"), 1.0, 1e6),
    Expectations.Check("max_n_chars",
      max(col("n_chars")).cast("double"), 1.0, 1e4),
    Expectations.Check("mean_n_chars",
      avg(col("n_chars")), 50.0, 1000.0),
    Expectations.Check("lang_in_domain",
      Expectations.conformance(
        col("lang").isin("de", "en", "es", "fr", "zh")), 1.0, 1.0),
    Expectations.Check("source_format",
      Expectations.conformance(col("source").rlike("^src[0-9]+$")),
      1.0, 1.0),
    Expectations.Check("text_nonempty",
      Expectations.conformance(length(col("text")) > 0), 1.0, 1.0))

  /** The co-activity edge set (users adjacent in time on the same
    * (event_type, day) timeline) — the identical LINEAR derivation
    * `graph_label_prop` uses (one lag window; a shared-key co-occurrence
    * self-join would be a fixture quadratic).
    */
  private[queries] def coActivityEdges(s: SparkSession,
      dir: String): DataFrame = {
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts"),
        expr("datediff(to_date(ts), DATE '1970-01-01')").as("day"))
      .withColumn("prev", lag(col("user_id"), 1).over(wd))
      .filter(col("prev").isNotNull && col("prev") =!= col("user_id"))
      .select(least(col("prev"), col("user_id")).as("src"),
        greatest(col("prev"), col("user_id")).as("dst"))
      .distinct()
  }

  val queries: Map[String, Q] = Map(
    // One-pass data-quality gate over the documents table: 9 expectations
    // (completeness, key uniqueness, bounds, domain conformance) costed as
    // ONE table scan — the plan is scan → aggregate → stack, so the suite
    // scales to any check count without rescanning. The oracle replays
    // every metric AND the verdict in SQL.
    "quality_expectations" -> ((s, dir) =>
      Expectations.run(t(s, dir, "documents"), documentChecks)
        .orderBy(col("check_name"))),

    // The same gate PER LANGUAGE in one grouped pass: a global verdict
    // hides a broken source inside healthy aggregate numbers (one
    // language's empty texts vanish into a 99.8% global completeness) —
    // the grouped suite pins every slice to its own band. Still one
    // aggregation; 5 groups × 4 checks = 20 verdict rows.
    "quality_expectations_grouped" -> ((s, dir) =>
      Expectations.runGrouped(t(s, dir, "documents"), "lang", Seq(
        Expectations.Check("completeness_text",
          Expectations.completeness("text"), 1.0, 1.0),
        Expectations.Check("uniqueness_doc_id",
          Expectations.uniqueness("doc_id"), 1.0, 1.0),
        Expectations.Check("mean_n_chars",
          avg(col("n_chars")), 50.0, 1000.0),
        Expectations.Check("min_rows",
          count(lit(1)).cast("double"), 10.0, 1e12)))
        .orderBy(col("lang"), col("check_name"))),

    // Distribution drift between dataset slices, one row per monitored
    // feature: PSI + JSD for the numeric `value` (bucketed at the FULL
    // table's decile edges — the reference-quantile recipe) of purchase
    // events vs all events, and for the categorical event_type mix of the
    // lower vs upper user-id population. Each histogram is one
    // partial-aggregated groupBy; metrics touch ≤ nBuckets rows.
    "distribution_drift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val num = Drift.numericDrift(ev,
          ev.filter(col("event_type") === "purchase"), "value",
          nBuckets = 10)
        .select(lit("value:purchase_vs_all").as("feature"),
          round6(col("psi")).as("psi"), round6(col("jsd")).as("jsd"))
      val cat = Drift.categoricalDrift(ev.filter(col("user_id") < 75),
          ev.filter(col("user_id") >= 75), "event_type")
        .select(lit("event_type:users_lo_vs_hi").as("feature"),
          round6(col("psi")).as("psi"), round6(col("jsd")).as("jsd"))
      num.unionByName(cat).orderBy(col("feature"))
    }),

    // Spearman rank correlation (chars vs tokens per doc, by language):
    // Pearson over AVERAGE fractional ranks (the tie-correct form —
    // rank() + (ties−1)/2, a pure window derivation both engines define
    // identically), so the statistic is robust to the metric scale where
    // the existing corr_covar is not. Two windows + one corr aggregate
    // per group.
    "spearman_corr" -> ((s, dir) => {
      // rank over non-NULL pairs only: Spark windows order nulls FIRST,
      // DuckDB's rank() orders them LAST — a NULL text/n_chars row would
      // shift every non-null rank on exactly one engine
      val d = t(s, dir, "documents")
        .filter(col("n_chars").isNotNull && col("text").isNotNull)
        .select(col("lang"), col("n_chars").cast("double").as("x"),
          size(split(trim(col("text")), "\\s+")).cast("double").as("y"))
      def avgRank(c: String) = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col(c))
        val tw = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"), col(c))
        rank().over(w).cast("double") +
          (count(lit(1)).over(tw).cast("double") - 1.0) / 2.0
      }
      d.withColumn("rx", avgRank("x")).withColumn("ry", avgRank("y"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          (floor(corr(col("rx"), col("ry")) * 1e6 + 0.5) / 1e6)
            .as("spearman"))
        .orderBy(col("lang"))
    }),

    // Source-mix entropy per language (and the normalized form H/ln(k)):
    // the one-number diversity dial a mix recipe monitors — a source
    // collapse drives normalized entropy toward 0 while per-source counts
    // still look plausible individually.
    "mix_entropy" -> ((s, dir) => {
      val counts = t(s, dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"))
      val tot = counts.groupBy(col("lang"))
        .agg(sum(col("n")).as("t"), count(lit(1)).as("k"))
      counts.join(tot, "lang")
        .select(col("lang"), col("k"),
          (col("n").cast("double") / col("t").cast("double")).as("p"))
        .groupBy(col("lang"), col("k"))
        .agg((-sum(col("p") * log(col("p")))).as("h"))
        .select(col("lang"), col("k").as("n_sources"),
          (floor(col("h") * 1e6 + 0.5) / 1e6).as("entropy"),
          // a single-source language has H = 0 and ln(k) = 0; 0/0 is NaN
          // in Spark and the collapse this audit exists to flag — pin it
          // to 0 identically on both engines
          when(col("k") > 1,
            floor(col("h") / log(col("k").cast("double")) * 1e6 + 0.5)
              / 1e6).otherwise(lit(0.0)).as("norm_entropy"))
        .orderBy(col("lang"))
    }),

    // Volume anomaly detection over the event stream: hourly counts per
    // type, each hour scored against its own trailing 24 h history
    // (RANGE frame ending 1 h before — the current hour never smooths its
    // own spike), |z| > 3 flagged. One group-key aggregation + one window
    // on the same key; the monitoring gate that catches an upstream
    // double-fire or outage before it poisons a training mix.
    "event_anomaly" -> ((s, dir) => {
      val h = t(s, dir, "events")
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
      val tw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(unix_timestamp(col("hr")))
        .rangeBetween(-86400L, -3600L)
      h.withColumn("mu", avg(col("n")).over(tw))
        .withColumn("sd", stddev_samp(col("n")).over(tw))
        .withColumn("n_hist", count(lit(1)).over(tw))
        .filter(col("n_hist") >= 6 && col("sd") > 0)
        .withColumn("z",
          floor((col("n") - col("mu")) / col("sd") * 1e6 + 0.5) / 1e6)
        .filter(abs(col("z")) > 3)
        .select(col("event_type"), col("hr"), col("n"), col("z"))
        .orderBy(col("event_type"), col("hr"))
    }),

    // Last-touch revenue attribution over the event stream: each purchase
    // credits its user's most recent view/click within a 7-day window
    // (else 'none'). ONE window pass on the user key — the same shuffle
    // shape as sessionization/funnels; the ignore-nulls last_value carry
    // is the standard attribution recurrence, and both engines define the
    // identical ROWS frame.
    "attribution_last_touch" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      val touches = Seq("view", "click")
      t(s, dir, "events")
        .withColumn("touch", last(
          when(col("event_type").isin(touches: _*), col("event_type")),
          ignoreNulls = true).over(w))
        .withColumn("touch_ts", last(
          when(col("event_type").isin(touches: _*), col("ts")),
          ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(
          when(col("touch").isNotNull &&
              unix_micros(col("ts")) - unix_micros(col("touch_ts")) <=
                604800000000L, col("touch"))
            .otherwise(lit("none")).as("touch"),
          col("value"))
        .groupBy(col("touch"))
        .agg(count(lit(1)).as("n_purchases"),
          (floor(sum(col("value")) * 100 + 0.5) / 100).as("revenue"))
        .orderBy(col("touch"))
    }),

    // Multi-touch revenue attribution (linear + U-shaped credit splits
    // beside last-touch): each purchase enumerates ALL its user's
    // view/click touches in the prior 7 days — one user-key equi-join
    // (fan-out bounded by per-user activity, the funnel shape) + one
    // purchase-key window for position/count. Credit is ALL-INTEGER ppm
    // arithmetic (linear: 1e6 div n with the remainder to the last touch;
    // U-shaped: 40/20/40 with the middle remainder to the last touch) on
    // cent-quantized values, so DuckDB replays every credited cent
    // exactly. Touchless purchases credit 'none' in full under both
    // models.
    "attribution_multi_touch" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"),
          floor(col("value") * 100 + 0.5).cast("long").as("val_cents"))
      val touches = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id").as("t_user"), col("event_id").as("t_id"),
          col("ts").as("t_ts"), col("event_type").as("ch"))
      val matched = purchases.join(touches,
        col("p_user") === col("t_user") &&
          (col("t_ts") < col("p_ts") ||
            (col("t_ts") === col("p_ts") && col("t_id") < col("p_id"))) &&
          unix_micros(col("p_ts")) - unix_micros(col("t_ts")) <=
            604800000000L)
      val wCnt = org.apache.spark.sql.expressions.Window
        .partitionBy(col("p_id"))
      val wPos = org.apache.spark.sql.expressions.Window
        .partitionBy(col("p_id")).orderBy(col("t_ts"), col("t_id"))
      val creditable = matched
        .withColumn("n", count(lit(1)).over(wCnt))
        .withColumn("pos", row_number().over(wPos))
      // Spark `/` on longs is TRUE division — every div here goes through
      // floor() (exact for these magnitudes, and identical to DuckDB's
      // integer `//`), so the ppm splits stay all-integer on both engines
      val linDiv = floor(lit(1000000.0) / col("n")).cast("long")
      val linPpm = when(col("pos") < col("n"), linDiv)
        .otherwise(lit(1000000L) - (col("n") - 1) * linDiv)
      // greatest() keeps the divisor nonzero on rows the when-chain never
      // routes here (n <= 2) — ANSI division must not see a 0 even in a
      // dead branch of an interpreted fallback
      val midPpm = floor(lit(200000.0) /
        greatest(col("n") - 2, lit(1L))).cast("long")
      val uPpm = when(col("n") === 1, lit(1000000L))
        .when(col("n") === 2, lit(500000L))
        .when(col("pos") === 1, lit(400000L))
        .when(col("pos") === col("n"),
          lit(400000L) + lit(200000L) - (col("n") - 2) * midPpm)
        .otherwise(midPpm)
      val both = creditable.select(col("p_id"), col("val_cents"),
        col("ch"), linPpm.cast("long").as("lin"), uPpm.cast("long").as("u"))
      val credited = both.select(col("p_id"), col("val_cents"), col("ch"),
          lit("linear").as("model"), col("lin").as("ppm"))
        .unionByName(both.select(col("p_id"), col("val_cents"), col("ch"),
          lit("ushaped").as("model"), col("u").as("ppm")))
      val none = purchases
        .join(both.select(col("p_id")).distinct(), Seq("p_id"), "left_anti")
        .select(col("p_id"), col("val_cents"), lit("none").as("ch"),
          explode(array(lit("linear"), lit("ushaped"))).as("model"),
          lit(1000000L).as("ppm"))
      credited.unionByName(
          none.select(col("p_id"), col("val_cents"), col("ch"),
            col("model"), col("ppm")))
        .groupBy(col("model"), col("ch"))
        .agg(count_distinct(col("p_id")).as("n_purchases"),
          sum(col("val_cents") * col("ppm")).as("credit_sum"))
        // `div` is exact LONG division at any magnitude — a double-floor
        // route would round once the group sum passes 2^53 (~3x the sf0.1
        // headroom), silently diverging from DuckDB's exact `//`
        .select(col("model"), col("ch").as("touch"), col("n_purchases"),
          expr("credit_sum div 1000000").as("credit_cents"))
        .orderBy(col("model"), col("touch"))
    }),

    // Time-decay revenue attribution (exponential half-life credit beside
    // linear/U-shaped): each touch in the 7-day window weighs 2^-age_days
    // (integer halving per whole day — 1e6 div 2^d stays exact through
    // d=6), credit ppm = w·1e6 div W with the rounding remainder to the
    // MOST RECENT touch. Same user-key join + purchase-key window shape
    // as attribution_multi_touch; every credited cent replays in DuckDB.
    "attribution_time_decay" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"),
          floor(col("value") * 100 + 0.5).cast("long").as("val_cents"))
      val touches = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id").as("t_user"), col("event_id").as("t_id"),
          col("ts").as("t_ts"), col("event_type").as("ch"))
      val matched = purchases.join(touches,
        col("p_user") === col("t_user") &&
          (col("t_ts") < col("p_ts") ||
            (col("t_ts") === col("p_ts") && col("t_id") < col("p_id"))) &&
          unix_micros(col("p_ts")) - unix_micros(col("t_ts")) <=
            604800000000L)
        .withColumn("age_days",
          floor((unix_micros(col("p_ts")) - unix_micros(col("t_ts"))) /
            lit(86400000000.0)).cast("long"))
        .withColumn("w",
          expr("1000000 div shiftleft(1L, cast(age_days as int))"))
      val wSum = org.apache.spark.sql.expressions.Window
        .partitionBy(col("p_id"))
      val wPos = org.apache.spark.sql.expressions.Window
        .partitionBy(col("p_id")).orderBy(col("t_ts"), col("t_id"))
      val credited = matched
        .withColumn("bigw", sum(col("w")).over(wSum))
        .withColumn("n", count(lit(1)).over(wSum))
        .withColumn("pos", row_number().over(wPos))
        .withColumn("base", expr("(w * 1000000) div bigw"))
        .withColumn("base_sum", sum(col("base")).over(wSum))
        .withColumn("ppm",
          when(col("pos") === col("n"),
            col("base") + lit(1000000L) - col("base_sum"))
            .otherwise(col("base")))
        .select(col("p_id"), col("val_cents"), col("ch"), col("ppm"))
      val none = purchases
        .join(credited.select(col("p_id")).distinct(), Seq("p_id"),
          "left_anti")
        .select(col("p_id"), col("val_cents"), lit("none").as("ch"),
          lit(1000000L).as("ppm"))
      credited.unionByName(none)
        .groupBy(col("ch"))
        .agg(count_distinct(col("p_id")).as("n_purchases"),
          sum(col("val_cents") * col("ppm")).as("credit_sum"))
        .select(col("ch").as("touch"), col("n_purchases"),
          expr("credit_sum div 1000000").as("credit_cents"))
        .orderBy(col("touch"))
    }),

    // Corpus diversity audit: distinct-n (type/token ratio at n=1,2) per
    // language — the standard repetitiveness metric a pre-training mix
    // tracks (a collapsing generator or a boilerplate-heavy source shows
    // up as a falling bigram TTR long before loss does). Exact
    // count_distinct over one explode per n; the 100 TB drop-in for the
    // distinct count is approx_count_distinct/theta (the
    // `approx_overlap_theta` tolerance posture). Fixed-point ppm output —
    // integer math, engine-exact.
    "corpus_distinct_ngrams" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("lang"),
          split(trim(lower(col("text"))), "\\s+").as("toks"))
      val uni = d.select(col("lang"), explode(col("toks")).as("g"))
        .withColumn("n", lit(1))
      val bi = d.filter(size(col("toks")) >= 2)
        .select(col("lang"), explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> concat(element_at(toks, i), ' ', " +
            "element_at(toks, i + 1)))")).as("g"))
        .withColumn("n", lit(2))
      uni.unionByName(bi)
        .groupBy(col("lang"), col("n"))
        .agg(count_distinct(col("g")).as("n_distinct"),
          count(lit(1)).as("n_total"))
        .select(col("lang"), col("n"), col("n_distinct"), col("n_total"),
          expr("n_distinct * 1000000 div n_total").as("ttr_ppm"))
        .orderBy(col("lang"), col("n"))
    }),

    // Exact per-node triangle counts over the co-activity graph by
    // degree-ordered orientation (compact-forward): the apex join's
    // fan-out is arboricity-bounded, so the plan survives skewed degree
    // distributions that explode a naive wedge join. The oracle replays
    // orientation, wedge, closure, and corner attribution in SQL and
    // compares EVERY node's count. (The fixture's 150-user graph densifies
    // with sf — the count grows with the data's co-occurrence, bounded by
    // the user population, not the plan.)
    "graph_triangles" -> ((s, dir) =>
      Graph.triangles(coActivityEdges(s, dir))
        .orderBy(col("node"))))

  val oracles: Map[String, String] = Map(
    "quality_expectations" ->
      """WITH m AS (SELECT
        |  avg(CASE WHEN text IS NULL THEN 0 ELSE 1 END)::DOUBLE AS c_text,
        |  avg(CASE WHEN lang IS NULL THEN 0 ELSE 1 END)::DOUBLE AS c_lang,
        |  count(DISTINCT doc_id)::DOUBLE / count(*)::DOUBLE AS u_id,
        |  min(n_chars)::DOUBLE AS min_c,
        |  max(n_chars)::DOUBLE AS max_c,
        |  avg(n_chars)::DOUBLE AS mean_c,
        |  avg(CASE WHEN lang IN ('de','en','es','fr','zh')
        |      THEN 1 ELSE 0 END)::DOUBLE AS l_dom,
        |  avg(CASE WHEN coalesce(regexp_matches(source, '^src[0-9]+$'),
        |      FALSE) THEN 1 ELSE 0 END)::DOUBLE AS s_fmt,
        |  avg(CASE WHEN coalesce(length(text) > 0, FALSE)
        |      THEN 1 ELSE 0 END)::DOUBLE AS t_ne
        |  FROM documents),
        |rows_ AS (
        |  SELECT 'completeness_text' AS check_name,
        |    floor(c_text*1e6+0.5)/1e6 AS metric, 1.0 AS lo, 1.0 AS hi
        |    FROM m
        |  UNION ALL SELECT 'completeness_lang',
        |    floor(c_lang*1e6+0.5)/1e6, 1.0, 1.0 FROM m
        |  UNION ALL SELECT 'uniqueness_doc_id',
        |    floor(u_id*1e6+0.5)/1e6, 1.0, 1.0 FROM m
        |  UNION ALL SELECT 'min_n_chars',
        |    floor(min_c*1e6+0.5)/1e6, 1.0, 1e6 FROM m
        |  UNION ALL SELECT 'max_n_chars',
        |    floor(max_c*1e6+0.5)/1e6, 1.0, 1e4 FROM m
        |  UNION ALL SELECT 'mean_n_chars',
        |    floor(mean_c*1e6+0.5)/1e6, 50.0, 1000.0 FROM m
        |  UNION ALL SELECT 'lang_in_domain',
        |    floor(l_dom*1e6+0.5)/1e6, 1.0, 1.0 FROM m
        |  UNION ALL SELECT 'source_format',
        |    floor(s_fmt*1e6+0.5)/1e6, 1.0, 1.0 FROM m
        |  UNION ALL SELECT 'text_nonempty',
        |    floor(t_ne*1e6+0.5)/1e6, 1.0, 1.0 FROM m)
        |SELECT check_name, metric, lo, hi,
        |  coalesce(metric >= lo AND metric <= hi, FALSE) AS passed
        |FROM rows_ ORDER BY check_name""".stripMargin,

    "quality_expectations_grouped" ->
      """WITH m AS (SELECT lang,
        |  avg(CASE WHEN text IS NULL THEN 0 ELSE 1 END)::DOUBLE AS c_text,
        |  count(DISTINCT doc_id)::DOUBLE / count(*)::DOUBLE AS u_id,
        |  avg(n_chars)::DOUBLE AS mean_c,
        |  count(*)::DOUBLE AS n_rows
        |  FROM documents GROUP BY lang),
        |rows_ AS (
        |  SELECT lang, 'completeness_text' AS check_name,
        |    floor(c_text*1e6+0.5)/1e6 AS metric, 1.0 AS lo, 1.0 AS hi
        |    FROM m
        |  UNION ALL SELECT lang, 'uniqueness_doc_id',
        |    floor(u_id*1e6+0.5)/1e6, 1.0, 1.0 FROM m
        |  UNION ALL SELECT lang, 'mean_n_chars',
        |    floor(mean_c*1e6+0.5)/1e6, 50.0, 1000.0 FROM m
        |  UNION ALL SELECT lang, 'min_rows',
        |    floor(n_rows*1e6+0.5)/1e6, 10.0, 1e12 FROM m)
        |SELECT lang, check_name, metric, lo, hi,
        |  coalesce(metric >= lo AND metric <= hi, FALSE) AS passed
        |FROM rows_ ORDER BY lang, check_name""".stripMargin,

    "distribution_drift" ->
      """WITH refv AS (SELECT value FROM events WHERE value IS NOT NULL),
        |curv AS (SELECT value FROM events
        |         WHERE value IS NOT NULL AND event_type = 'purchase'),
        |e AS (SELECT
        |  floor(quantile_cont(value, 0.1)*1e6+0.5)/1e6 AS e1,
        |  floor(quantile_cont(value, 0.2)*1e6+0.5)/1e6 AS e2,
        |  floor(quantile_cont(value, 0.3)*1e6+0.5)/1e6 AS e3,
        |  floor(quantile_cont(value, 0.4)*1e6+0.5)/1e6 AS e4,
        |  floor(quantile_cont(value, 0.5)*1e6+0.5)/1e6 AS e5,
        |  floor(quantile_cont(value, 0.6)*1e6+0.5)/1e6 AS e6,
        |  floor(quantile_cont(value, 0.7)*1e6+0.5)/1e6 AS e7,
        |  floor(quantile_cont(value, 0.8)*1e6+0.5)/1e6 AS e8,
        |  floor(quantile_cont(value, 0.9)*1e6+0.5)/1e6 AS e9
        |  FROM refv),
        |rb AS (SELECT ((value > e1)::INT + (value > e2)::INT
        |  + (value > e3)::INT + (value > e4)::INT + (value > e5)::INT
        |  + (value > e6)::INT + (value > e7)::INT + (value > e8)::INT
        |  + (value > e9)::INT) AS bucket FROM refv, e),
        |cb AS (SELECT ((value > e1)::INT + (value > e2)::INT
        |  + (value > e3)::INT + (value > e4)::INT + (value > e5)::INT
        |  + (value > e6)::INT + (value > e7)::INT + (value > e8)::INT
        |  + (value > e9)::INT) AS bucket FROM curv, e),
        |rp AS (SELECT bucket, count(*) AS n FROM rb GROUP BY bucket),
        |cp AS (SELECT bucket, count(*) AS n FROM cb GROUP BY bucket),
        |rt AS (SELECT sum(n)::DOUBLE AS t FROM rp),
        |ct AS (SELECT sum(n)::DOUBLE AS t FROM cp),
        |jn AS (SELECT greatest(coalesce(rp.n / rt.t, 0), 1e-6) AS p,
        |              greatest(coalesce(cp.n / ct.t, 0), 1e-6) AS q
        |       FROM rp FULL JOIN cp USING (bucket), rt, ct),
        |r2 AS (SELECT event_type AS bucket, count(*) AS n FROM events
        |       WHERE user_id < 75 AND event_type IS NOT NULL GROUP BY 1),
        |c2 AS (SELECT event_type AS bucket, count(*) AS n FROM events
        |       WHERE user_id >= 75 AND event_type IS NOT NULL GROUP BY 1),
        |rt2 AS (SELECT sum(n)::DOUBLE AS t FROM r2),
        |ct2 AS (SELECT sum(n)::DOUBLE AS t FROM c2),
        |jn2 AS (SELECT greatest(coalesce(r2.n / rt2.t, 0), 1e-6) AS p,
        |               greatest(coalesce(c2.n / ct2.t, 0), 1e-6) AS q
        |        FROM r2 FULL JOIN c2 USING (bucket), rt2, ct2)
        |SELECT 'value:purchase_vs_all' AS feature,
        |  floor(sum((q-p)*ln(q/p))*1e6+0.5)/1e6 AS psi,
        |  floor((0.5*sum(p*ln(p*2/(p+q)))
        |    + 0.5*sum(q*ln(q*2/(p+q))))*1e6+0.5)/1e6 AS jsd
        |FROM jn
        |UNION ALL
        |SELECT 'event_type:users_lo_vs_hi' AS feature,
        |  floor(sum((q-p)*ln(q/p))*1e6+0.5)/1e6 AS psi,
        |  floor((0.5*sum(p*ln(p*2/(p+q)))
        |    + 0.5*sum(q*ln(q*2/(p+q))))*1e6+0.5)/1e6 AS jsd
        |FROM jn2
        |ORDER BY feature""".stripMargin,

    "spearman_corr" ->
      """WITH d AS (SELECT lang, n_chars::DOUBLE AS x,
        |    len(string_split_regex(trim(text), '\s+'))::DOUBLE AS y
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND text IS NOT NULL),
        |r AS (SELECT lang,
        |  rank() OVER (PARTITION BY lang ORDER BY x)::DOUBLE
        |    + (count(*) OVER (PARTITION BY lang, x)::DOUBLE - 1) / 2
        |    AS rx,
        |  rank() OVER (PARTITION BY lang ORDER BY y)::DOUBLE
        |    + (count(*) OVER (PARTITION BY lang, y)::DOUBLE - 1) / 2
        |    AS ry
        |  FROM d)
        |SELECT lang, count(*) AS n_docs,
        |  floor(corr(rx, ry) * 1e6 + 0.5) / 1e6 AS spearman
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,

    "mix_entropy" ->
      """WITH c AS (SELECT lang, source, count(*) AS n
        |  FROM documents GROUP BY 1, 2),
        |t AS (SELECT lang, sum(n) AS t, count(*) AS k FROM c
        |  GROUP BY lang),
        |p AS (SELECT c.lang, t.k, c.n::DOUBLE / t.t::DOUBLE AS p
        |  FROM c JOIN t USING (lang)),
        |h AS (SELECT lang, k, -sum(p * ln(p)) AS h FROM p GROUP BY 1, 2)
        |SELECT lang, k AS n_sources,
        |  floor(h * 1e6 + 0.5) / 1e6 AS entropy,
        |  CASE WHEN k > 1
        |    THEN floor(h / ln(k::DOUBLE) * 1e6 + 0.5) / 1e6
        |    ELSE 0.0 END AS norm_entropy
        |FROM h ORDER BY lang""".stripMargin,

    "event_anomaly" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, hr, n,
        |  avg(n) OVER tw AS mu, stddev_samp(n) OVER tw AS sd,
        |  count(*) OVER tw AS n_hist
        |  FROM h
        |  WINDOW tw AS (PARTITION BY event_type
        |    ORDER BY CAST(floor(epoch(hr)) AS BIGINT)
        |    RANGE BETWEEN 86400 PRECEDING AND 3600 PRECEDING))
        |SELECT event_type, hr, n,
        |  floor((n - mu) / sd * 1e6 + 0.5) / 1e6 AS z
        |FROM w
        |WHERE n_hist >= 6 AND sd > 0
        |  AND abs(floor((n - mu) / sd * 1e6 + 0.5) / 1e6) > 3
        |ORDER BY event_type, hr""".stripMargin,

    "attribution_last_touch" ->
      """WITH w AS (SELECT *,
        |  last_value(CASE WHEN event_type IN ('view','click')
        |      THEN event_type END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch,
        |  last_value(CASE WHEN event_type IN ('view','click')
        |      THEN ts END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS touch_ts
        |  FROM events)
        |SELECT CASE WHEN touch IS NOT NULL
        |    AND epoch_us(ts) - epoch_us(touch_ts) <= 604800000000
        |    THEN touch ELSE 'none' END AS touch,
        |  count(*) AS n_purchases,
        |  floor(sum(value)*100+0.5)/100 AS revenue
        |FROM w WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "attribution_time_decay" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS val_cents
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_id AS t_id, ts AS t_ts,
        |    event_type AS ch
        |  FROM events WHERE event_type IN ('view','click')),
        |m AS (SELECT p.p_id, p.val_cents, t.ch, t.t_ts, t.t_id,
        |    1000000 // (1 << CAST(floor(
        |      (epoch_us(p.p_ts) - epoch_us(t.t_ts)) / 86400000000.0)
        |      AS BIGINT)) AS w
        |  FROM p JOIN t ON p.user_id = t.user_id
        |    AND (t.t_ts < p.p_ts
        |      OR (t.t_ts = p.p_ts AND t.t_id < p.p_id))
        |    AND epoch_us(p.p_ts) - epoch_us(t.t_ts) <= 604800000000),
        |c0 AS (SELECT p_id, val_cents, ch,
        |    (w * 1000000) // sum(w) OVER (PARTITION BY p_id) AS base,
        |    row_number() OVER (PARTITION BY p_id
        |      ORDER BY t_ts, t_id) AS pos,
        |    count(*) OVER (PARTITION BY p_id) AS n
        |  FROM m),
        |c AS (SELECT p_id, val_cents, ch,
        |    CASE WHEN pos = n THEN base + 1000000
        |      - sum(base) OVER (PARTITION BY p_id) ELSE base END AS ppm
        |  FROM c0
        |  UNION ALL
        |  SELECT p.p_id, p.val_cents, 'none', 1000000
        |  FROM p
        |  WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.p_id = p.p_id))
        |SELECT ch AS touch, count(DISTINCT p_id) AS n_purchases,
        |  CAST(sum(val_cents * ppm) // 1000000 AS BIGINT) AS credit_cents
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "attribution_multi_touch" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS val_cents
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_id AS t_id, ts AS t_ts,
        |    event_type AS ch
        |  FROM events WHERE event_type IN ('view','click')),
        |m AS (SELECT p.p_id, p.val_cents, t.ch,
        |    count(*) OVER (PARTITION BY p.p_id) AS n,
        |    row_number() OVER (PARTITION BY p.p_id
        |      ORDER BY t.t_ts, t.t_id) AS pos
        |  FROM p JOIN t ON p.user_id = t.user_id
        |    AND (t.t_ts < p.p_ts
        |      OR (t.t_ts = p.p_ts AND t.t_id < p.p_id))
        |    AND epoch_us(p.p_ts) - epoch_us(t.t_ts) <= 604800000000),
        |c AS (
        |  SELECT p_id, val_cents, ch, 'linear' AS model,
        |    CASE WHEN pos < n THEN 1000000 // n
        |         ELSE 1000000 - (n - 1) * (1000000 // n) END AS ppm
        |  FROM m
        |  UNION ALL
        |  SELECT p_id, val_cents, ch, 'ushaped',
        |    CASE WHEN n = 1 THEN 1000000
        |         WHEN n = 2 THEN 500000
        |         WHEN pos = 1 THEN 400000
        |         WHEN pos = n
        |           THEN 400000 + 200000 - (n - 2) * (200000 // (n - 2))
        |         ELSE 200000 // (n - 2) END
        |  FROM m
        |  UNION ALL
        |  SELECT p.p_id, p.val_cents, 'none', mdl.model, 1000000
        |  FROM p, (SELECT 'linear' AS model
        |           UNION ALL SELECT 'ushaped') mdl
        |  WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.p_id = p.p_id))
        |SELECT model, ch AS touch, count(DISTINCT p_id) AS n_purchases,
        |  CAST(sum(val_cents * ppm) // 1000000 AS BIGINT) AS credit_cents
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "corpus_distinct_ngrams" ->
      """WITH d AS (SELECT lang,
        |    string_split_regex(trim(lower(text)), '\s+') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |uni AS (SELECT lang, unnest(toks) AS g FROM d),
        |bi AS (SELECT lang, toks[g] || ' ' || toks[g+1] AS g
        |  FROM d, unnest(range(1, len(toks))) AS u(g)
        |  WHERE len(toks) >= 2),
        |m AS (
        |  SELECT lang, 1 AS n, count(DISTINCT g) AS n_distinct,
        |    count(*) AS n_total FROM uni GROUP BY lang
        |  UNION ALL
        |  SELECT lang, 2, count(DISTINCT g), count(*) FROM bi
        |  GROUP BY lang)
        |SELECT lang, n, n_distinct, n_total,
        |  n_distinct * 1000000 // n_total AS ttr_ppm
        |FROM m ORDER BY lang, n""".stripMargin,

    "graph_triangles" ->
      """WITH adj AS (
        |  SELECT user_id,
        |    lag(user_id) OVER (PARTITION BY event_type,
        |      (ts::DATE - DATE '1970-01-01')::BIGINT
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |edges AS (
        |  SELECT DISTINCT least(prev, user_id) AS a,
        |    greatest(prev, user_id) AS b
        |  FROM adj WHERE prev IS NOT NULL AND prev <> user_id),
        |deg AS (SELECT node, count(*) AS deg FROM (
        |    SELECT a AS node FROM edges
        |    UNION ALL SELECT b FROM edges) GROUP BY node),
        |o AS (SELECT
        |    CASE WHEN (da.deg, e.a) < (db.deg, e.b)
        |      THEN e.a ELSE e.b END AS u,
        |    CASE WHEN (da.deg, e.a) < (db.deg, e.b)
        |      THEN e.b ELSE e.a END AS v,
        |    CASE WHEN (da.deg, e.a) < (db.deg, e.b)
        |      THEN db.deg ELSE da.deg END AS degv
        |  FROM edges e JOIN deg da ON da.node = e.a
        |  JOIN deg db ON db.node = e.b),
        |tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
        |  FROM o e1 JOIN o e2 ON e1.u = e2.u
        |    AND (e1.degv, e1.v) < (e2.degv, e2.v)
        |  JOIN o e3 ON e3.u = e1.v AND e3.v = e2.v),
        |corners AS (SELECT x AS node FROM tri
        |  UNION ALL SELECT y FROM tri
        |  UNION ALL SELECT z FROM tri)
        |SELECT node, count(*) AS n_tri FROM corners
        |GROUP BY node ORDER BY node""".stripMargin)
}
