package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Agg, Dedup, Series, Stats, Table}

/** Algebraic property tests over randomized small tables — the class of
  * checks the reference lacks entirely (SURVEY §5). Generators are
  * driven with fixed seeds (the scalatest/scalacheck bridge artifact is
  * not in the offline cache). */
class PropertySpec extends SparkSpec {

  private def forAll[T](g: Gen[T], n: Int = 5)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      body(g.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"generator failed at seed $i")))
    }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 5)
                           (body: (A, B) => Unit): Unit =
    (1 to n).foreach { i =>
      val a = ga.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"generator failed at seed $i"))
      val b = gb.apply(Gen.Parameters.default, Seed((i + 100).toLong))
        .getOrElse(fail(s"generator failed at seed $i"))
      body(a, b)
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val rowsGen: Gen[List[(Long, Long, Double)]] =
    Gen.listOfN(60, for {
      k <- Gen.choose(0L, 9L)
      v <- Gen.choose(-50L, 50L)
      d <- Gen.choose(0, 10000).map(_ / 100.0)
    } yield (k, v, d))

  test("filter∘join ≡ join∘filter when the predicate hits one side") {
    import spark.implicits._
    forAll2(rowsGen, rowsGen) { (l, r) =>
      val lt = Table(l.toDF("k", "v", "d"))
      val rt = Table(r.map(t => (t._1, t._2)).toDF("k2", "w"))
      val pred = col("v") > 0
      val a = lt.join(rt, "k", "k2", "k").filter(pred).df
        .orderBy("k", "v", "d", "w").collect().toSeq
      val b = lt.filter(pred).join(rt, "k", "k2", "k").df
        .orderBy("k", "v", "d", "w").collect().toSeq
      assert(a == b)
    }
  }

  test("aggregate totals are partition-count invariant") {
    import spark.implicits._
    forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "v", "d")
      def agg(t: Table) = t.aggregate("k",
        "s" -> Agg.sum(col("v")), "c" -> Agg.length(),
        "m" -> Agg.maximum(col("d")), "u" -> Agg.lengthUnique(col("v")))
        .df.orderBy("k").collect().toSeq
      assert(agg(Table(df.repartition(1))) == agg(Table(df.repartition(7))))
    }
  }

  test("vcat row count adds; join with self-keys yields dup cross-products") {
    import spark.implicits._
    forAll(rowsGen) { rows =>
      val t = Table(rows.toDF("k", "v", "d"))
      assert(t.vcat(t).df.count() == 2 * rows.size)
      // |t ⋈ t on k| = Σ_k cnt(k)^2 (reference dup-key semantics,
      // test/join_test1.jl:35-36)
      val expect = rows.groupBy(_._1).map(g => g._2.size.toLong * g._2.size).sum
      val self = Table(rows.map(x => (x._1, x._2)).toDF("k2", "w"))
      assert(t.join(self, "k", "k2", "k").df.count() == expect)
    }
  }

  test("cumsum final value equals total sum; output is monotone for positives") {
    import spark.implicits._
    forAll(Gen.listOfN(40, Gen.choose(1, 100))) { vals =>
      whenever(vals.nonEmpty) {
        val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v.toDouble) }
          .toDF("ord", "v")
        val out = Series.cumsum(df, col("ord"), col("v").cast("decimal(18,2)"),
          "run", numPartitions = 4)
          .orderBy("ord").select("run").collect().map(_.getDecimal(0))
        assert(out.last.doubleValue() == vals.map(_.toDouble).sum)
        assert(out.zip(out.tail).forall { case (a, b) => a.compareTo(b) < 0 })
      }
    }
  }

  test("rangeJoin equals naive equi-join + range filter") {
    import spark.implicits._
    val evGen = Gen.listOfN(40, for {
      k <- Gen.choose(0L, 4L)
      t <- Gen.choose(0L, 200L)
    } yield (k, t))
    forAll2(evGen, evGen) { (l, r) =>
      val left = l.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = r.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("rid", "k", "t")
      val got = Series.rangeJoin(left, right, "k", "t", 17L, Seq("rid"))
        .select("lid", "r_rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      val want = (for {
        ((lk, lt), li) <- l.zipWithIndex
        ((rk, rt), ri) <- r.zipWithIndex
        if lk == rk && math.abs(lt - rt) <= 17L
      } yield (li.toLong, ri.toLong)).sorted
      assert(got == want)
    }
  }

  test("asofJoin matches the brute-force latest-at-or-before reference") {
    import spark.implicits._
    val evGen = Gen.listOfN(30, for {
      k <- Gen.choose(0L, 3L)
      t <- Gen.choose(0L, 50L) // small range → frequent timestamp ties
    } yield (k, t))
    forAll2(evGen, evGen) { (l, r) =>
      val left = l.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = r.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("rid", "k", "t")
      val got = Series.asofJoin(left, right, "k", "t", Seq("rid"))
        .select("lid", "asof_rid").collect()
        .map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Long]))
        .toMap
      l.zipWithIndex.foreach { case ((lk, lt), li) =>
        val cands = r.zipWithIndex
          .filter { case ((rk, rt), _) => rk == lk && rt <= lt }
        // ties on time resolve to the max (t, rid) — struct order
        val want = if (cands.isEmpty) None
          else Some(cands.maxBy { case ((_, rt), ri) => (rt, ri.toLong) }._2.toLong)
        assert(got(li.toLong) == want, s"left $li")
      }
    }
  }

  test("medianByGroup equals the sorted-multiset median") {
    import spark.implicits._
    val gen = Gen.listOfN(50, for {
      k <- Gen.choose(0L, 3L)
      v <- Gen.choose(0, 200)
    } yield (k, v))
    forAll(gen) { rows =>
      whenever(rows.nonEmpty) {
        val got = Stats.medianByGroup(rows.toDF("k", "v"), "k",
          col("v").cast("decimal(18,2)"))
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        rows.groupBy(_._1).foreach { case (k, g) =>
          val s = g.map(_._2).sorted
          val n = s.size
          val want = (s((n - 1) / 2) + s(n / 2)) / 2.0
          assert(got(k) == want, s"group $k: ${s.mkString(",")}")
        }
      }
    }
  }

  test("quantileByGroup equals the sorted-multiset rank value") {
    import spark.implicits._
    val gen = Gen.listOfN(50, for {
      k <- Gen.choose(0L, 3L)
      v <- Gen.choose(0, 200)
    } yield (k, v))
    forAll(gen) { rows =>
      whenever(rows.nonEmpty) {
        for (pm <- Seq(100, 500, 900, 1000)) {
          val got = Stats.quantileByGroup(rows.toDF("k", "v"), "k",
            col("v").cast("decimal(18,2)"), pm)
            .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
          rows.groupBy(_._1).foreach { case (k, g) =>
            val s = g.map(_._2).sorted
            val rank = (pm * s.size + 999) / 1000 // ceil(p·n) in ints
            assert(got(k) == s(rank - 1).toDouble, s"group $k p=$pm")
          }
        }
      }
    }
  }

  test("native as-of plan equals the window as-of on random data") {
    import spark.implicits._
    val evGen = Gen.listOfN(25, for {
      k <- Gen.choose(0L, 3L)
      t <- Gen.choose(0L, 40L) // frequent ties
    } yield (k, t))
    forAll2(evGen, evGen, n = 3) { (l, r) =>
      val left = l.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = r.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("rid", "k", "t")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("lid", "asof_t", "asof_rid").collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      val viaWindow = canon(
        Series.asofJoin(left, right, "k", "t", Seq("rid")))
      val viaPlan = canon(
        graft.plans.AsOfJoinPlan.asofJoin(left, right, "k", "t", Seq("rid")))
      assert(viaPlan == viaWindow)
    }
  }

  test("bounded-heap top-k aggregate equals the windowed top-k") {
    import spark.implicits._
    val gen = Gen.listOfN(40, for {
      g <- Gen.choose(0L, 2L)
      s <- Gen.choose(0, 15) // small range → score ties
    } yield (g, s))
    forAll(gen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((g, s), i) => (g, i.toLong, s.toDouble) }
        .toDF("g", "id", "score")
      val viaAgg = df.groupBy(col("g"))
        .agg(graft.functions.TopKFunctions
          .topK(col("id"), col("score"), 3).as("topk"))
        .select(col("g"), posexplode(col("topk")).as(Seq("r0", "e")))
        .select(col("g"), col("e.id"), (col("r0") + 1).as("rn"))
        .collect().map(_.toSeq).toSet
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
        .orderBy(col("score").desc, col("id").asc)
      val viaWindow = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).select(col("g"), col("id"), col("rn").cast("int"))
        .collect().map(_.toSeq).toSet
      assert(viaAgg == viaWindow)
    }
  }

  test("jaccard is symmetric and bounded; minhash candidates verify exactly") {
    import spark.implicits._
    forAll(Gen.listOfN(8, Gen.listOfN(12,
      Gen.oneOf("a", "b", "c", "d", "e", "f")))) { docs =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val pairs = Dedup.minhashDedup(df, "doc_id", "text",
        k = 2, threshold = 0.0, numHashes = 16, bands = 8)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      pairs.foreach { case ((a, b), j) =>
        assert(a < b); assert(j >= 0.0 && j <= 1.0)
      }
    }
  }

  test("asofJoinTolerance equals brute force latest-within-tolerance") {
    import spark.implicits._
    val evGen = Gen.listOfN(30, for {
      k <- Gen.choose(0L, 3L)
      t <- Gen.choose(0L, 50L)
    } yield (k, t))
    val tol = 7L
    forAll2(evGen, evGen) { (l, r) =>
      val left = l.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = r.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("rid", "k", "t")
      val got = Series.asofJoinTolerance(left, right, "k", "t",
        Seq("rid"), tolerance = tol)
        .select("lid", "asof_rid").collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      val want = l.zipWithIndex.flatMap { case ((lk, lt), li) =>
        val cands = r.zipWithIndex.filter { case ((rk, rt), _) =>
          rk == lk && rt <= lt && lt - rt <= tol }
        if (cands.isEmpty) None
        else Some(li.toLong ->
          cands.maxBy { case ((_, rt), ri) => (rt, ri.toLong) }._2.toLong)
      }.toMap
      assert(got == want)
    }
  }

  test("zorder interleave is a bijection (deinterleave recovers both dims)") {
    def deinterleave(z: Long): (Long, Long) = {
      def compact(v: Long): Long = {
        var x = v & 0x5555555555555555L
        x = (x | (x >> 1)) & 0x3333333333333333L
        x = (x | (x >> 2)) & 0x0f0f0f0f0f0f0f0fL
        x = (x | (x >> 4)) & 0x00ff00ff00ff00ffL
        x = (x | (x >> 8)) & 0x0000ffff0000ffffL
        x = (x | (x >> 16)) & 0x00000000ffffffffL
        x
      }
      (compact(z), compact(z >> 1))
    }
    forAll2(Gen.choose(0L, (1L << 31) - 1), Gen.choose(0L, (1L << 31) - 1),
      n = 50) { (x, y) =>
      val z = graft.functions.ZOrderKey.spread(x) |
        (graft.functions.ZOrderKey.spread(y) << 1)
      assert(deinterleave(z) == ((x, y)))
    }
  }

  test("chunking with stride == size concatenates back to the tokens") {
    import spark.implicits._
    val textGen = Gen.listOfN(30,
      Gen.oneOf("alpha", "beta", "gamma", "delta")).map(_.mkString(" "))
    forAll2(textGen, Gen.choose(1, 12)) { (text, size) =>
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val rebuilt = graft.operators.Chunking
        .chunkByTokens(df, "doc_id", "text", size, size)
        .orderBy("chunk_idx")
        .collect().map(_.getString(4)).mkString(" ")
      assert(rebuilt == text.toLowerCase.trim)
    }
  }

  test("packing conserves tokens and bins are contiguous for any ctx") {
    import spark.implicits._
    forAll2(Gen.listOfN(25, Gen.choose(1, 40)), Gen.choose(4, 64)) {
      (lens, ctx) =>
        val docs = lens.zipWithIndex.map { case (n, i) =>
          (i.toLong, Seq.fill(n)("w").mkString(" "))
        }.toDF("doc_id", "text")
        val rows = graft.operators.Chunking
          .packAssignments(docs, "doc_id", "text", ctx)
          .orderBy("doc_id").collect()
          .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        // spans tile [0, total): each doc starts where the previous ended
        assert(rows.head._2 == 0L)
        rows.sliding(2).foreach {
          case Array(a, b) => assert(a._3 == b._2)
          case _           =>
        }
        assert(rows.last._3 == lens.map(_.toLong).sum)
    }
  }
}
