package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (north star,
  * SURVEY.md §2.8 — additive; the reference has no sampling surface).
  *
  * Why not `df.sample()`: at 100 TB a sample must be REPRODUCIBLE — stable
  * across retries, re-partitioning, and re-runs on a grown corpus (a doc's
  * membership must not flip because an unrelated doc arrived). Hashing a
  * stable key gives all of that: membership is a pure per-row function, so
  * the "sample" is a codegen'd filter with no shuffle, no RNG state, and
  * the same rows selected on any cluster. md5 (not a seeded JVM hash) so
  * any engine — including the DuckDB oracle — reproduces the selection
  * bit-for-bit.
  */
object SamplingOps {

  /** The project's ONE cross-engine string hash: md5's first 15 hex
    * digits as a 60-bit long. Shared by sampling, winnowing's HOF twin,
    * and the multimodal embed stub — a single definition so the
    * oracle-critical hash cannot drift between call sites (every DuckDB
    * oracle reproduces exactly this expression).
    */
  def md5Prefix60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 60-bit integer hash of (salt ‖ key) — [[md5Prefix60]] of the salted
    * key. Changing `salt` draws an independent sample.
    */
  def hashOf(key: Column, salt: String): Column =
    md5Prefix60(concat(lit(salt), key.cast("string")))

  /** True for rows in a deterministic `keep`/`modulus` sample of `key`
    * (e.g. keep=1, modulus=10 ⇒ a reproducible ~10% sample).
    */
  def hashSampleFlag(key: Column, modulus: Int, keep: Int,
      salt: String = "s"): Column = {
    require(modulus > 0 && keep >= 0 && keep <= modulus)
    pmod(hashOf(key, salt), lit(modulus.toLong)) < keep
  }

  /** Deterministic named-split assignment (train/val/test — the one
    * split every training pipeline makes): with integer `splits`
    * weights summing to W, each row's split is the label whose
    * cumulative weight range contains `pmod(hash(key), W)` — so the
    * split is an exact-integer, engine-reproducible function of the key
    * alone. Membership is stable across partitioning, retries, and
    * corpus growth (new keys land in splits at the weight proportions;
    * existing keys never move). Disjoint and exhaustive by
    * construction: every row gets exactly one label. Pure map — no
    * shuffle, no state. A NULL key would null the hash and leave the
    * row unlabeled — the opposite of the disjoint-and-exhaustive
    * contract — so it fails loudly at execution instead (same loud-
    * failure stance as [[mixtureSample]]'s unweighted-group check).
    */
  /** Deterministic GLOBAL-SHUFFLE key: ordering rows by
    * `(outCol, key)` is a reproducible pseudo-random permutation of the
    * corpus — the "shuffle before you shard" step that makes training
    * shards IID instead of corpus-ordered (adjacent docs from one crawl
    * batch would otherwise land in the same shard). Pure per-row hash:
    * no RNG state, stable across retries/partitioning, and any engine
    * reproduces the order (it is the project's one cross-engine hash).
    * Change `salt` to draw an independent permutation.
    */
  def withShuffleKey(df: DataFrame, key: Column, salt: String = "shuffle",
      outCol: String = "shuffle_key"): DataFrame =
    df.withColumn(outCol, hashOf(key, salt))

  def withHashSplit(df: DataFrame, splits: Seq[(String, Int)], key: Column,
      salt: String = "split", outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "withHashSplit: splits must be non-empty")
    require(splits.forall(_._2 > 0),
      s"withHashSplit: weights must be positive, got $splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"withHashSplit: duplicate split label in $splits")
    val total = splits.map(_._2.toLong).sum
    val h = pmod(hashOf(key, salt), lit(total))
    val cum = splits.scanLeft(0L) { case (acc, (_, w)) => acc + w }.tail
    val assigned = splits.zip(cum).foldLeft(Option.empty[Column]) {
      case (acc, ((label, _), bound)) =>
        Some(acc.fold(when(h < bound, label))(_.when(h < bound, label)))
    }.get
    // The when-chain is exhaustive for any non-null h (the last bound is
    // the full weight sum), so this otherwise() only fires on a null key.
    df.withColumn(outCol, assigned.otherwise(raise_error(lit(
      s"withHashSplit: null split key — every row must carry a non-null " +
        s"key so it lands in exactly one of ${splits.map(_._1).mkString("/")}"))
      .cast("string")))
  }

  /** Mixture (re-)sampling: downsample each group so the output's
    * composition matches integer target `weights` (e.g.
    * `en→5, fr→2, de→2, ja→1` ⇒ a ~50/20/20/10 mix), keeping ALL of the
    * scarcest group — the data-mixing step that turns raw per-source/
    * per-language counts into a training mixture. Groups absent from
    * `weights` fail loudly unless `dropUnweightedGroups` opts into
    * dropping them (param doc below).
    *
    * Math (all integer, so any engine reproduces the selection exactly):
    * with `W = Σ weights` and per-group count `n_g`, the largest total
    * honoring the mix is `T = min_g floor(n_g·W / w_g)` (the binding
    * group is kept whole). Each group then keeps rows at rate
    * `w_g·T / (W·n_g) ≤ 1`, decided per row by the pure-hash predicate
    * `pmod(hash, W·n_g) < w_g·T` — membership is a codegen'd filter, so
    * kept counts are Binomial around the target (exact proportions in
    * expectation) rather than exactly capped. That trade is deliberate:
    *
    * Shape at 100 TB: the only corpus-scale work is one count per group
    * (map-side partial agg) and one broadcast-joined filter pass. An
    * exactly-capped variant needs a per-group global rank
    * ([[stratifiedCap]] provides it, via the bounded-heap TopKPerKey
    * plan rather than the one-task-per-language window).
    * Modulo bias is ≤ (W·n_g)/2^60 — vanishing while `W·n_g` stays
    * below ~2^50 (a quadrillion-row group would revisit this).
    *
    * Determinism contract: membership depends only on (key, salt,
    * weights, per-group counts) — stable across partitioning and retries;
    * adding rows to one group changes thresholds (counts moved), which is
    * inherent to proportion targets.
    */
  /** @param dropUnweightedGroups groups absent from `weights` (and
    *        null-group rows) are a CONTRACT QUESTION, not a default:
    *        `true` drops them silently (the caller is declaring "my
    *        weights are the keep-list"); the default `false` fails loudly
    *        at execution on the first unweighted row — a typo'd language
    *        code silently discarding a corpus slice is exactly the bug a
    *        curation pipeline can't afford.
    */
  def mixtureSample(df: DataFrame, groupCol: String,
      weights: Seq[(String, Long)], key: Column,
      salt: String = "mix", dropUnweightedGroups: Boolean = false): DataFrame = {
    require(weights.nonEmpty, "mixtureSample: weights must be non-empty")
    require(weights.forall(_._2 > 0),
      s"mixtureSample: weights must be positive, got $weights")
    require(weights.map(_._1).distinct.size == weights.size,
      s"mixtureSample: duplicate group in weights: $weights")
    val bigW = weights.map(_._2).sum
    val group = ColNames.quotedCol(groupCol)
    val sp = df.sparkSession
    import sp.implicits._
    val wDf = weights.toDF(groupCol, "_wt")
    // Tiny aggregate: one row per weighted group; no corpus data reaches
    // the driver.
    val grpCounts = df.groupBy(group).agg(count(lit(1)).as("_n"))
    // Strict default: validate on the GROUP-cardinality counts frame, not
    // the corpus join — a corpus-side left join + null-filtering predicate
    // gets optimized back into an inner join (EliminateOuterJoin), which
    // would silently swallow the raise_error. Here the coalesce sits in a
    // plain projection between the tiny left join and the window — no
    // filter above it for the optimizer to exploit — and fires while the
    // broadcast rates are materialized. Null-group rows also land here
    // (no weight can match null) and fail loudly.
    val counts =
      if (dropUnweightedGroups) grpCounts.join(wDf, groupCol)
      else grpCounts.join(wDf, Seq(groupCol), "left")
        // Inner coalesce: concat of a NULL group value would null the
        // whole message — the null-group failure must still NAME itself.
        .withColumn("_wt", coalesce(col("_wt"), raise_error(concat(
          lit("mixtureSample: group '"),
          coalesce(group.cast("string"), lit("NULL")),
          lit("' has no weight — list every group or pass " +
            "dropUnweightedGroups = true"))).cast("long")))
    // T folds in by aggregating the tiny counts frame and cross-joining
    // the one-row result back — NOT via a partition-less window, which is
    // value-identical but makes Spark print "No Partition Defined for
    // Window operation! Moving all data to a single partition" into every
    // run's log (the frame IS weights.size rows, so the warning is noise —
    // but noise a reader re-adjudicates every round). counts is persisted
    // (Caching.withCached) so the agg + select pair reads the corpus-fed
    // groupBy once, and the checkpointed rates frame (weights.size rows)
    // is self-contained before the corpus-wide filter consumes it. The
    // strict-default raise_error above now fires here, when withCached
    // materializes rates — same loud failure, one action earlier.
    val rates = Caching.withCached(counts) {
      counts
        .crossJoin(broadcast(counts.agg(min(expr(s"_n * $bigW div _wt")).as("_t"))))
        .select(group,
          (col("_n") * bigW).as("_den"),
          (col("_wt") * col("_t")).as("_num"))
    }
    // Inner join: with the strict default, the validation above has
    // already guaranteed every group is weighted, so nothing drops here;
    // with the opt-in, dropping IS the declared contract.
    df.join(broadcast(rates), Seq(groupCol))
      .filter(pmod(hashOf(key, salt), col("_den")) < col("_num"))
      .drop("_den", "_num")
  }

  /** Temperature-balanced mixture at α = 0.5: resample so group
    * proportions follow √n instead of n — the classic multilingual
    * rebalance (Gopher / mBERT exponent-smoothing with the standard
    * α = 0.5): head groups are downsampled toward the tail, the
    * scarcest-per-weight group is kept whole, and every group's keep
    * decision is the same pure-hash integer-threshold filter as
    * [[mixtureSample]] — deterministic, order/partition-independent,
    * membership reproducible bit-exactly by an external engine.
    *
    * Weights are DERIVED from the data (w = max(1, floor(√n)) per
    * group) rather than passed in; everything after the √ is exact
    * integer arithmetic. α is pinned to 0.5 because IEEE-754 `sqrt` is
    * correctly rounded — Spark and any oracle engine compute the SAME
    * double, so floor(√n) can never disagree across engines; a
    * general `pow(n, α)` floats on libm and could flip a threshold by
    * one ulp. (Other dyadic α compose from √ if ever needed.)
    *
    * Shape at 100 TB: one group-cardinality count aggregate, two 1-row
    * broadcasts (Σw and the whole-kept group's scale), then a
    * broadcast-rates hash filter on the corpus — no window, no
    * per-group shuffle, no driver read. Thresholds use n·Σw in long
    * arithmetic: with floor-√ weights that overflows only past ~10^10
    * rows per group times ~10^8 Σw — beyond any per-group corpus this
    * library targets; the guard fails loudly rather than wrapping.
    */
  def temperatureSample(df: DataFrame, groupCol: String, key: Column,
      salt: String = "temp"): DataFrame = {
    val group = ColNames.quotedCol(groupCol)
    val weighted = df.groupBy(group).agg(count(lit(1)).as("_n"))
      .withColumn("_w", greatest(floor(sqrt(col("_n"))).cast("long"), lit(1L)))
    val rates = Caching.withCached(weighted) {
      val withSw = weighted
        .crossJoin(broadcast(weighted.agg(sum(col("_w")).as("_sw"))))
        // n·Σw is the filter's modulus; a silent long wrap would turn
        // the threshold into garbage membership, so refuse loudly.
        .withColumn("_den", when(
          col("_n") <= expr(s"${Long.MaxValue}L div _sw"),
          col("_n") * col("_sw")).otherwise(raise_error(concat(
            lit("temperatureSample: n*Σw overflows long for group '"),
            group.cast("string"), lit("'")))))
      withSw
        .crossJoin(broadcast(withSw.agg(min(expr("_den div _w")).as("_t"))))
        .select(group, col("_den"), (col("_w") * col("_t")).as("_num"))
    }
    df.join(broadcast(rates), Seq(groupCol))
      .filter(pmod(hashOf(key, salt), col("_den")) < col("_num"))
      .drop("_den", "_num")
  }

  /** Stratified cap: at most `cap` rows per group, chosen by hash order of
    * `key` (deterministic; independent of input order) — the balance step
    * that keeps a dominant stratum (e.g. one language) from swamping a
    * training mix.
    *
    * Routed through the [[graft.plans.GraftPlans.topKPerKey]] whole-plan
    * operator rather than a `row_number` window: strata are FEW HUGE
    * groups (languages, sources), and a window partitioned that way
    * sorts every member of a group in one task at any cluster size. The
    * plan's partial stage instead keeps a cap-bounded heap per group on
    * the map side (flush-at-cap), so only ≤ cap·groups rows per task
    * reach the shuffle — the group's corpus never sorts anywhere.
    * Semantics are identical to the window form (RowNumberMode is
    * row_number ≤ cap under the same (hash, key) order); membership is
    * deterministic whenever (hash, key) is unique per group — i.e.
    * whenever `key` is.
    */
  def stratifiedCap(df: DataFrame, groupCols: Seq[String], cap: Int,
      key: Column, salt: String = "c"): DataFrame = {
    require(cap > 0)
    // Collision-safe temp names (ADVICE r15): withColumn REPLACES a
    // same-named caller column, so an input that already carries `_h` or
    // `_tk` would silently lose it through the add-then-drop. Suffix
    // deterministically until fresh.
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(n => !df.columns.contains(n)).get
    val hCol = fresh("_h")
    val tkCol = fresh("_tk")
    graft.plans.GraftPlans.topKPerKey(
        df.withColumn(hCol, hashOf(key, salt)).withColumn(tkCol, key),
        groupCols, orderBy = Seq((hCol, true), (tkCol, true)), k = cap)
      .drop(hCol, tkCol)
  }
}
