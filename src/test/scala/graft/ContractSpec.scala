package graft

/** Driver-contract invariants for SparkEntry: the registry the
  * correctness gate and bench iterate must stay internally consistent. */
class ContractSpec extends SparkSpec {

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query names are unique across modules (no silent map overwrite)") {
    val all = Seq(
      graft.queries.RelationalQueries.queries, graft.queries.SeriesQueries.queries,
      graft.queries.TextQueries.queries, graft.queries.DedupQueries.queries,
      graft.queries.SimilarityQueries.queries, graft.queries.MLQueries.queries,
      graft.queries.StreamTextQueries.queries, graft.queries.SourceQueries.queries,
      graft.queries.SampleQueries.queries, graft.queries.BasketQueries.queries,
      graft.queries.LinalgQueries.queries, graft.queries.SearchQueries.queries,
      graft.queries.CorpusQueries.queries, graft.queries.SketchQueries.queries,
      graft.queries.LayoutQueries.queries, graft.queries.GraphQueries.queries,
      graft.queries.ProfileQueries.queries, graft.queries.EncodeQueries.queries)
    val names = all.flatMap(_.keys)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(names.toSet == SparkEntry.queries.keySet)
  }

  test("entry (driver smoke) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registry query is run-to-run deterministic") {
    // Two executions must agree as multisets — catches partition-order
    // dependence, RNG leakage, and nondeterministic cuts anywhere in
    // the registry (the property every oracle comparison relies on).
    val sf = "/root/testdata/sf0.001"
    val flaky = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        def fingerprint(): Map[String, Long] = {
          spark.catalog.clearCache()
          fn(spark, sf).collect()
            .map(_.toString).groupBy(identity).map { case (k, v) =>
              k -> v.length.toLong }
        }
        if (fingerprint() != fingerprint()) Some(name) else None
    }
    assert(flaky.isEmpty, s"nondeterministic queries: $flaky")
  }

  test("oracle SQL never references Spark-only functions") {
    // guard against xxhash64/spark-isms leaking into DuckDB SQL
    val bad = SparkEntry.oracleSql.filter { case (_, sql) =>
      sql.contains("xxhash64") || sql.contains("monotonically_increasing")
    }
    assert(bad.isEmpty, s"non-portable oracle SQL in: ${bad.keys}")
  }
}
