package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling for training-data
  * pipelines: train/val/test assignment and per-stratum subsampling as
  * pure narrow expressions of a key column.
  *
  * Why not `df.sample` / `df.randomSplit`: those draw from a
  * partition-seeded RNG, so results change under repartitioning, retries,
  * and backfills — at 100 TB a re-run would silently move documents
  * between train and test. Here the assignment is a function of the KEY
  * alone (first 8 hex digits of md5, a public, engine-portable hash):
  *  - stable under any partitioning, cluster size, or re-ingestion;
  *  - zero shuffle, zero RNG state, fully codegen'd;
  *  - reproducible by any other engine (the DuckDB oracles recompute the
  *    exact assignment), unlike seed-dependent xxhash64 families;
  *  - salt-able: different salts give independent draws, so a holdout
  *    resample doesn't correlate with the previous one.
  *
  * The reference engine has no sampling surface (its own scope list,
  * /root/reference/README.md:127-138); north-star extension.
  */
object Splits {

  /** Portable uniform draw in [0,1): `md5(key || salt)` first 32 bits over
    * 2^32. Exactly representable in double (k / 2^32, both powers of two),
    * so threshold comparisons agree bit-for-bit across engines.
    */
  def portableUniform(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)

  /** Assign each row a split label by key hash. `weights` are taken as
    * given (not normalized): thresholds are the left-to-right prefix sums
    * — the same IEEE additions an oracle engine performs — and the last
    * label absorbs any remainder, so a weight list summing under 1.0
    * still labels every row.
    */
  def hashSplit(
      df: DataFrame, keyCol: String, weights: Seq[(String, Double)],
      outCol: String = "split", salt: String = ""): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "hashSplit needs at least one positive-weight label")
    val u = portableUniform(col(keyCol), salt)
    val thresholds = weights.map(_._2).scanLeft(0.0)(_ + _).tail
    val label = weights.zip(thresholds).init.foldRight(
      lit(weights.last._1): Column) { case (((name, _), bound), els) =>
      when(u < bound, name).otherwise(els)
    }
    df.withColumn(outCol, label)
  }

  /** Balance strata toward the smallest one with temperature-0.5
    * downsampling: stratum `s` keeps a `sqrt(min_count / count_s)` share
    * of its rows (the alpha=0.5 point of the standard `p ~ count^alpha`
    * multilingual/multi-source mixing rule — large strata shrink, small
    * ones are kept whole-ish, ratios compress by the square root).
    *
    * Per-row keep/drop is the same portable md5 draw as
    * [[stratifiedSample]], so the selection is reproducible across
    * engines, partitionings and re-runs. alpha is fixed at 0.5 because
    * sqrt is IEEE-correctly-rounded in every engine (pow is not), which
    * keeps the rate — and therefore the exact selected row set —
    * bit-identical cross-engine and oracle-checkable.
    *
    * Cost: one map-side-combined count per stratum (tiny result,
    * broadcast back), then a narrow filter. No other shuffle.
    */
  def temperatureBalance(
      df: DataFrame, keyCol: String, strataCol: String,
      salt: String = ""): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val minc = counts.agg(min(col("__n")).as("__minn"))
    val rates = counts.crossJoin(broadcast(minc))
      .select(col(strataCol),
        sqrt(col("__minn").cast("double") / col("__n")).as("__rate"))
    df.join(broadcast(rates), strataCol)
      .filter(portableUniform(col(keyCol), salt) < col("__rate"))
      .drop("__rate")
  }

  /** Keep a deterministic `fractions(stratum)` share of each stratum
    * (`defaultFraction` for strata not listed) — the standard corpus
    * re-balancing primitive (downsample boilerplate-heavy sources, keep
    * all of the rare ones). One narrow filter; no shuffle, no count pass.
    */
  def stratifiedSample(
      df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      salt: String = ""): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0,1]")
    val u = portableUniform(col(keyCol), salt)
    val frac = fractions.foldLeft(lit(defaultFraction): Column) {
      case (els, (k, f)) => when(col(strataCol) === k, f).otherwise(els)
    }
    df.filter(u < frac)
  }

  /** Deterministic uniform k-sample PER STRATUM (bottom-k by the portable
    * uniform): every stratum keeps exactly min(k, |stratum|) rows —
    * the fixed-size-per-source subset builder (eval slices, per-language
    * probes) where [[stratifiedSample]]'s fractional keep can't promise a
    * count. Being hash-ranked, the selection is stable under
    * partitioning/retries AND under corpus growth: a stratum's sample
    * only changes where new keys hash below its current k-th rank.
    *
    * One exchange on the stratum key + per-stratum sort. A degenerate
    * mega-stratum makes that sort wide; at that point take
    * [[weightedSample]] with equal weights per stratum instead (bounded
    * heap, no full sort) — for the many-strata/small-k shape here, the
    * window is the simpler plan and AQE splits skewed strata.
    */
  def stratumSample(
      df: DataFrame, keyCol: String, strataCol: String, k: Int,
      salt: String = ""): DataFrame = {
    require(k > 0, "stratumSample needs k > 0")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(portableUniform(col(keyCol), salt), col(keyCol))
    df.withColumn("_ss_rk", row_number().over(w))
      .filter(col("_ss_rk") <= k)
      .drop("_ss_rk")
  }

  /** Fill per-stratum TOKEN budgets deterministically — the training-
    * mixture assembly step: an LLM data mix is specified as tokens per
    * source ("300B web, 50B code, 20B books"), not doc counts or keep
    * fractions, so the sampler must cut each stratum when its RUNNING
    * TOKEN SUM reaches the quota. Docs are consumed in portable-hash
    * order ([[portableUniform]] of the key — an unbiased uniform draw,
    * stable under partitioning/retries/backfills and recomputable by
    * any engine), and a doc is kept while the tokens BEFORE it are
    * still under budget — so the budget is met with an overshoot of at
    * most one document, the standard fill rule (a strictly-under rule
    * could undershoot by an arbitrarily large doc). Strata without a
    * budget keep nothing; a stratum smaller than its budget is kept
    * whole. Under corpus growth a stratum's selection changes only
    * where new keys hash below its current cut — the same stability
    * contract as [[stratumSample]].
    *
    * Cost: one exchange on the stratum key + a per-stratum window sort
    * (parallel across sources). A single mega-stratum makes that sort
    * wide; at that scale pre-filter with [[stratifiedSample]] at a
    * generous fraction (estimate: budget / stratum tokens, padded) to
    * shrink the sort input, then budget-cut the survivors — the cut
    * itself must see an ordered prefix, so some per-stratum order is
    * irreducible.
    */
  def tokenBudgetMix(
      df: DataFrame, keyCol: String, strataCol: String, sizeCol: String,
      budgets: Map[String, Long], salt: String = ""): DataFrame = {
    require(budgets.values.forall(_ >= 0), "token budgets must be >= 0")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(portableUniform(col(keyCol), salt), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val before = coalesce(sum(col(sizeCol).cast("long")).over(w), lit(0L))
    val budget = budgets.foldLeft(lit(0L): Column) {
      case (els, (k, b)) => when(col(strataCol) === k, b).otherwise(els)
    }
    df.withColumn("_tb_before", before)
      .filter(col("_tb_before") < budget)
      .drop("_tb_before")
  }

  /** Deterministic per-epoch training order: position `1..n` within
    * each shard, ordered by the portable hash of (key, epoch) — the
    * data-ordering step between packing and the trainer. Each epoch is
    * a DIFFERENT permutation (the epoch is salted into the draw, so
    * consecutive epochs decorrelate like independent shuffles) yet every
    * epoch is reproducible from the key alone: restarts, backfills and
    * re-partitioning cannot move a sample's position, and any engine
    * can recompute the exact order (the md5 contract of every sampler
    * here — seed-dependent engine RNGs cannot promise either property).
    *
    * Shard-local by design: a global shuffle order would need a global
    * sort, and trainers read shards independently anyway — hash-ordering
    * WITHIN shards while shard assignment is itself hash-based gives the
    * same statistical mix with one bounded window per shard, parallel
    * across shards, at any corpus size.
    */
  def epochOrder(
      df: DataFrame, keyCol: String, shardCol: String, epoch: Long,
      outCol: String = "pos", salt: String = ""): DataFrame =
    df.withColumn(outCol, row_number().over(
      Window.partitionBy(col(shardCol))
        .orderBy(portableUniform(col(keyCol), s"$salt:epoch=$epoch"),
          col(keyCol))).cast("long"))

  /** Deterministic weighted sampling without replacement
    * (Efraimidis-Spirakis): each row draws `u = portableUniform(key)`,
    * scores `u^(1/w)`, and the k largest scores win — exactly a weighted
    * draw without replacement, with the same determinism contract as
    * every other sampler here (a function of the key alone, stable under
    * partitioning/retries/backfills, recomputable by any engine).
    *
    * Plans as TakeOrderedAndProject: each partition forwards at most k
    * rows, no global sort — the quality-weighted corpus subset selection
    * at 100 TB costs one scan plus a k-row-per-partition gather.
    * Non-positive weights are excluded (a zero-weight row can never win).
    */
  def weightedSample(
      df: DataFrame, keyCol: String, weightCol: String, k: Int,
      salt: String = ""): DataFrame = {
    require(k > 0, "weightedSample needs k > 0")
    val score = pow(portableUniform(col(keyCol), salt),
      lit(1.0) / col(weightCol).cast("double"))
    df.filter(col(weightCol).cast("double") > 0)
      .withColumn("_ws_score", score)
      .orderBy(col("_ws_score").desc, col(keyCol))
      .limit(k)
      .drop("_ws_score")
  }
}
