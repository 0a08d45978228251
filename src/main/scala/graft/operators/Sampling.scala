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

  /** DSIR importance weights (Xie et al., "Data Selection via
    * Importance Resampling", arXiv:2302.03169): score every corpus
    * document by how much more likely its hashed-bigram bag is under
    * the TARGET distribution (a small high-quality sample) than under
    * the RAW corpus distribution. Selecting top-weight / resampling by
    * weight shifts the corpus mixture toward the target domain.
    *
    * Features are token bigrams hashed into 256 buckets (first 2 hex
    * chars of md5 — engine-portable like every hash in this file);
    * both distributions are add-one-smoothed bucket histograms, so
    *
    *   logw(doc) = Σ_g [ln(t(b(g))+1) − ln(r(b(g))+1)]
    *             + n_grams · [ln(rTot+256) − ln(tTot+256)]
    *
    * Per-term lns are summed as DECIMAL(27,18) (order-free) and the
    * result rounded to 6 dp — the same portability discipline as
    * [[Lm.bigramSurprisal]]. Returns (id, n_grams, logw); docs with
    * fewer than 2 tokens have no bigrams and are absent.
    *
    * Scale: gram strings never leave the scan stage (bucket ints are
    * computed row-locally); the model is a 256-row broadcast; the
    * target corpus is small by construction (a curated sample), so its
    * histogram pass is negligible; the raw histogram and the per-doc
    * weight are each ONE partial-aggregated hash aggregate over the
    * corpus. */
  def dsirWeights(corpus: DataFrame, target: DataFrame, id: String,
                  text: String): DataFrame = {
    import graft.functions.Text
    val B = 256
    def bucket(g: Column): Column =
      conv(substring(md5(g), 1, 2), 16, 10).cast("int")
    def grams(df: DataFrame, keep: Seq[Column]): DataFrame = df
      .select(keep :+ Text.tokens(col(text)).as("__t"): _*)
      .select(keep :+ explode(Text.shinglesOfTokens(col("__t"), 2))
        .as("__g"): _*)
      .select(keep :+ bucket(col("__g")).as("b"): _*)
    val tg = grams(target, Seq.empty)
    val cg = grams(corpus, Seq(col(id)))
    val spark = corpus.sparkSession
    val base = spark.range(B).select(col("id").cast("int").as("b"))
    val lrTable = base
      .join(tg.groupBy("b").agg(count(lit(1)).as("ct")), Seq("b"), "left")
      .join(cg.groupBy("b").agg(count(lit(1)).as("cr")), Seq("b"), "left")
      .select(col("b"),
        (log(coalesce(col("ct"), lit(0L)).cast("double") + 1.0)
          - log(coalesce(col("cr"), lit(0L)).cast("double") + 1.0)).as("lr"))
    val const = tg.agg(count(lit(1)).as("t_tot"))
      .crossJoin(cg.agg(count(lit(1)).as("r_tot")))
      .select((log(col("r_tot").cast("double") + B.toDouble)
        - log(col("t_tot").cast("double") + B.toDouble)).as("c0"))
    cg.join(broadcast(lrTable), "b")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_grams"),
        sum(col("lr").cast("decimal(27,18)")).as("__s"))
      .crossJoin(broadcast(const))
      .select(col(id), col("n_grams"),
        round(col("__s").cast("double")
          + col("n_grams").cast("double") * col("c0"), 6).as("logw"))
  }
}
