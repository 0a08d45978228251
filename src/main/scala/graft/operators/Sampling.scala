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

  /** Keep rows whose key hashes below `num`/65536 (deterministic,
    * engine-portable Bernoulli-style sample). */
  def hashSample(df: DataFrame, key: Column, num: Int): DataFrame = {
    require(num >= 0 && num <= 65536, "rate numerator out of range")
    df.filter(prefix(key) < lit(hex4(num)))
  }

  /** Assign each row a deterministic split label by hash range:
    * `cuts` are cumulative 1/65536 thresholds, e.g.
    * Seq(("test", 6554), ("val", 13108)) → ~10% test, ~10% val,
    * remainder `defaultLabel`. */
  def splitColumn(key: Column, cuts: Seq[(String, Int)],
                  defaultLabel: String = "train"): Column = {
    require(cuts.map(_._2) == cuts.map(_._2).sorted, "cuts must ascend")
    val p = prefix(key)
    cuts.foldRight(lit(defaultLabel): Column) { case ((label, cut), rest) =>
      when(p < lit(hex4(cut)), lit(label)).otherwise(rest)
    }
  }

  /** SQL fragment mirroring [[prefix]] for DuckDB oracles. */
  def prefixSql(keyExpr: String): String =
    s"substring(md5(CAST($keyExpr AS VARCHAR)), 1, 4)"
}
