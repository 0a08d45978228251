package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling and dataset splitting.
  *
  * Training-data pipelines need samples and holdout splits that are
  * (a) reproducible across runs and engines, (b) stable under
  * repartitioning, and (c) derivable per-row with no global state —
  * `DataFrame.sample`'s partition-seeded RNG gives none of these (the
  * sample changes with the partition layout). Hashing a stable key and
  * thresholding the hash gives all three: membership is a pure function
  * of the row key.
  *
  * The hash is the first 4 hex chars of md5 (16 bits), compared as a
  * string — lowercase hex compares identically in every engine, so the
  * DuckDB oracle reproduces the exact sample. Rates are expressed in
  * 1/65536 units. Codegen'd expressions end to end; at 100 TB the
  * sample predicate rides inside the scan stage.
  */
object Sampling {

  private def prefix(key: Column): Column =
    substring(md5(key.cast("string")), 1, 4)

  private def hex4(n: Int): String = f"$n%04x"

  /** Membership predicate `hash(key) < num/65536`. num==65536 must be
    * special-cased: hex4(65536)="10000" (5 chars) and a lexicographic
    * compare of 4-char prefixes against it would keep only prefixes
    * starting with '0'. */
  private def below(key: Column, num: Int): Column =
    if (num >= 65536) lit(true) else prefix(key) < lit(hex4(num))

  /** Keep rows whose key hashes below `num`/65536 (deterministic,
    * engine-portable Bernoulli-style sample); num=65536 keeps all rows. */
  def hashSample(df: DataFrame, key: Column, num: Int): DataFrame = {
    require(num >= 0 && num <= 65536, "rate numerator out of range")
    df.filter(below(key, num))
  }

  /** Assign each row a deterministic split label by hash range:
    * `cuts` are cumulative 1/65536 thresholds, e.g.
    * Seq(("test", 6554), ("val", 13108)) → ~10% test, ~10% val,
    * remainder `defaultLabel`. */
  def splitColumn(key: Column, cuts: Seq[(String, Int)],
                  defaultLabel: String = "train"): Column = {
    require(cuts.map(_._2) == cuts.map(_._2).sorted, "cuts must ascend")
    require(cuts.forall(c => c._2 >= 0 && c._2 <= 65536), "cut out of range")
    cuts.foldRight(lit(defaultLabel): Column) { case ((label, cut), rest) =>
      when(below(key, cut), lit(label)).otherwise(rest)
    }
  }

  /** Per-stratum deterministic sampling — the corpus-mixing primitive:
    * each stratum (source, language, quality band …) keeps rows at its
    * own `rates` numerator (1/65536 units); strata absent from `rates`
    * keep at `defaultNum` (0 = drop). Still a pure per-row codegen'd
    * predicate in the scan stage — the rate table is a literal
    * when-chain, not a join — so mixing 100 TB costs one scan. */
  def stratifiedSample(df: DataFrame, key: Column, strata: Column,
                       rates: Seq[(String, Int)],
                       defaultNum: Int = 0): DataFrame = {
    require(rates.forall(r => r._2 >= 0 && r._2 <= 65536),
      "rate numerator out of range")
    val pred = rates.foldRight(below(key, defaultNum)) {
      case ((s, num), rest) =>
        when(strata === lit(s), below(key, num)).otherwise(rest)
    }
    df.filter(pred)
  }

  /** Exactly-k-per-stratum deterministic sample — the quota-sampling
    * complement to [[stratifiedSample]]'s rate sampling: each group
    * keeps the k rows with the SMALLEST md5 priority of the key (a
    * content-hash "reservoir": reproducible across runs, engines and
    * partitionings, and a uniform draw to the extent md5 is uniform).
    *
    * Runs on the native bounded-heap top-k aggregate, not a window
    * sort: map-side partial heaps bound state at k entries per group
    * per task and the shuffle at partitions·k rows per group — a
    * per-group window sort would instead sort the whole corpus at
    * 100 TB. The priority is the first 12 hex chars of md5 (48 bits —
    * exact in a double), negated because the heap keeps highest-score
    * first; ties break toward the lower id in both engines.
    * Returns (grp, pick). */
  def reservoirPerGroup(df: DataFrame, group: Column, id: Column,
                        k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val pri = conv(substring(md5(id.cast("string")), 1, 12), 16, 10)
      .cast("long").cast("double")
    df.groupBy(group.as("grp"))
      .agg(graft.functions.TopKFunctions.topK(id, -pri, k).as("__picks"))
      .select(col("grp"), explode(col("__picks.id")).as("pick"))
  }

  /** SQL fragment mirroring [[prefix]] for DuckDB oracles. */
  def prefixSql(keyExpr: String): String =
    s"substring(md5(CAST($keyExpr AS VARCHAR)), 1, 4)"
}
