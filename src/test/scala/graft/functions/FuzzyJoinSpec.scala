package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def pairsOf(strs: Seq[String], minLen: Int = 4,
      maxKeyFreq: Option[Long] = None): Set[(String, String)] =
    FuzzyJoin.editDistance1Pairs(strs.toDF("s"), "s", minLen, maxKeyFreq)
      .as[(String, String)].collect().toSet

  // reference levenshtein for the completeness check — textbook DP
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def bruteEd1(strs: Seq[String], minLen: Int): Set[(String, String)] = {
    val v = strs.distinct.filter(_.length >= minLen).sorted
    (for {
      i <- v.indices; j <- (i + 1) until v.length
      if lev(v(i), v(j)) <= 1
    } yield (v(i), v(j))).toSet
  }

  test("substitution, insertion, deletion neighbors found; distance-2 rejected") {
    val got = pairsOf(Seq("abcd", "abxd", "abcde", "zzzz", "abd", "ab"))
    // "abd"/"ab" are under minLen=4; abxd↔abcde is distance 2
    assert(got === Set(("abcd", "abcde"), ("abcd", "abxd")))
  }

  test("deletion-neighborhood candidates are recall-complete vs brute force (FastSS k=1)") {
    // deterministic pseudo-random pool with dense ed-1 neighborhoods:
    // key-like strings over a tiny alphabet, several lengths
    val rnd = new scala.util.Random(42)
    val pool = (0 until 300).map { _ =>
      val len = 4 + rnd.nextInt(4)
      (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    assert(pairsOf(pool) === bruteEd1(pool, minLen = 4))
  }

  private def bruteEdK(strs: Seq[String], k: Int, minLen: Int): Set[(String, String)] = {
    val v = strs.distinct.filter(_.length >= minLen).sorted
    (for {
      i <- v.indices; j <- (i + 1) until v.length
      if lev(v(i), v(j)) <= k
    } yield (v(i), v(j))).toSet
  }

  test("radius-2 neighborhoods are recall-complete vs brute force (FastSS k=2)") {
    val rnd = new scala.util.Random(11)
    val pool = (0 until 200).map { _ =>
      val len = 4 + rnd.nextInt(4)
      (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    val got = FuzzyJoin.editDistancePairs(pool.toDF("s"), "s", maxDist = 2)
      .as[(String, String)].collect().toSet
    assert(got === bruteEdK(pool, k = 2, minLen = 4))
  }

  test("radius-2 on serial keys: two-digit variants link, three do not; radius-1 is a subset") {
    val names = (1 to 40).map(i => f"Cust#$i%04d")
    val ed2 = FuzzyJoin.editDistancePairs(names.toDF("s"), "s", maxDist = 2)
      .as[(String, String)].collect().toSet
    assert(ed2 === bruteEdK(names, k = 2, minLen = 4))
    assert(pairsOf(names).subsetOf(ed2))
    assert(ed2.contains(("Cust#0009", "Cust#0010"))) // two digits move
    assert(ed2.size > pairsOf(names).size)
  }

  test("length-guard edge: 1-char and 2-char strings produce no degenerate radius-2 keys") {
    // sequence(1, 0) descends in Spark; the guard must keep short
    // strings from generating garbage keys (minLen=1 admits them)
    val got = FuzzyJoin.editDistancePairs(
      Seq("a", "b", "ab", "ba", "xyz").toDF("s"), "s", maxDist = 2, minLen = 1)
      .as[(String, String)].collect().toSet
    assert(got === bruteEdK(Seq("a", "b", "ab", "ba", "xyz"), k = 2, minLen = 1))
  }

  test("payload variant: pair set identical to the plain form, both sides' attributes carried") {
    val rows = Seq(
      ("abcd", 1, "AUTO"), ("abce", 2, "BIKE"), ("abcf", 1, "AUTO"),
      ("wxyz", 3, "SHIP"), ("abcd", 1, "AUTO")) // duplicate row collapses
    val df = rows.toDF("s", "nat", "seg")
    val got = FuzzyJoin.editDistancePairsWithPayload(
        df, "s", Seq("nat", "seg"), maxDist = 1)
      .as[(String, String, Int, String, Int, String)].collect().toSet
    // (left, right) set matches the payload-less operator exactly
    assert(got.map(r => (r._1, r._2)) === pairsOf(rows.map(_._1)))
    // each side carries ITS OWN record's attributes
    assert(got === Set(
      ("abcd", "abce", 1, "AUTO", 2, "BIKE"),
      ("abcd", "abcf", 1, "AUTO", 1, "AUTO"),
      ("abce", "abcf", 2, "BIKE", 1, "AUTO")))
    // column naming contract: l_<p>.. then r_<p>..
    assert(FuzzyJoin.editDistancePairsWithPayload(df, "s", Seq("nat", "seg"),
        maxDist = 1).columns.toSeq ===
      Seq("left_str", "right_str", "l_nat", "l_seg", "r_nat", "r_seg"))
    // gating on the carried attributes == gating through a names join
    // (the d20 equivalence the memo redesign relies on)
    val viaFilter = FuzzyJoin.editDistancePairsWithPayload(
        df, "s", Seq("nat", "seg"), maxDist = 1)
      .filter(col("l_nat") === col("r_nat") && col("l_seg") === col("r_seg"))
      .select(col("left_str"), col("right_str"))
      .as[(String, String)].collect().toSet
    assert(viaFilter === Set(("abcd", "abcf")))
  }

  test("duplicate input rows collapse; result invariant to partitioning") {
    val strs = Seq("abcd", "abcd", "abcd", "abce", "abce")
    for (parts <- Seq(1, 7)) {
      val df = strs.toDF("s").repartition(parts)
      val got = FuzzyJoin.editDistance1Pairs(df, "s")
        .as[(String, String)].collect().toSet
      assert(got === Set(("abcd", "abce")), s"parts=$parts")
    }
  }

  test("zero-padded serial keys: only one-digit variants link") {
    val names = (1 to 30).map(i => f"Cust#$i%04d")
    val got = pairsOf(names)
    // every pair here differs only in digits; verify against brute force
    assert(got === bruteEd1(names, minLen = 4))
    assert(got.contains(("Cust#0001", "Cust#0002")))
    assert(!got.contains(("Cust#0009", "Cust#0010"))) // two digits move
  }

  test("maxKeyFreq drops hub keys — recall cap is observable and bounded") {
    // 12 strings all within ed 1 of "aaaa" through its hub keys
    val hub = (0 until 12).map(i => s"aaa${('a' + i).toChar}")
    val exact = pairsOf(hub)
    val capped = pairsOf(hub, maxKeyFreq = Some(4L))
    assert(capped.subsetOf(exact))
    assert(capped.size < exact.size)
  }

  private def bruteSnm(strs: Seq[String], w: Int, minLen: Int): Set[(String, String)] = {
    val v = strs.distinct.filter(_.length >= minLen).sorted
    (for {
      i <- v.indices; j <- (i + 1) to math.min(i + w, v.length - 1)
      if lev(v(i), v(j)) <= 1
    } yield (v(i), v(j))).toSet
  }

  test("sorted-neighborhood pairs match the brute-force definition") {
    val rnd = new scala.util.Random(7)
    val pool = (0 until 200).map { _ =>
      (0 until (4 + rnd.nextInt(3))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    for (w <- Seq(1, 3, 5)) {
      val got = FuzzyJoin.sortedNeighborhoodPairs(pool.toDF("s"), "s", window = w)
        .as[(String, String)].collect().toSet
      assert(got === bruteSnm(pool, w, minLen = 4), s"w=$w")
    }
  }

  test("offset sweep: one w=10 pass filtered to off<=w equals a direct w pass, per key") {
    val rnd = new scala.util.Random(11)
    val pool = (0 until 150).map { _ =>
      (0 until (4 + rnd.nextInt(3))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }.toDF("s")
    for ((nm, key) <- FuzzyJoin.defaultSnmPasses) {
      val sweep = FuzzyJoin.sortedNeighborhoodPairsWithOffsetBy(
        pool, "s", key, window = 10)
      for (w <- Seq(1, 3, 5, 10)) {
        val viaFilter = sweep.filter(col("off") <= w)
          .select(col("left_str"), col("right_str"))
          .as[(String, String)].collect().toSet
        val direct = FuzzyJoin.sortedNeighborhoodPairsBy(pool, "s", key, window = w)
          .as[(String, String)].collect().toSet
        assert(viaFilter === direct, s"pass=$nm w=$w")
      }
    }
    // off is the rank distance: bounded by the window, strictly positive
    val offs = FuzzyJoin.sortedNeighborhoodPairsWithOffsetBy(
      pool, "s", identity, window = 10)
      .select(col("off")).as[Int].collect()
    assert(offs.nonEmpty && offs.forall(o => o >= 1 && o <= 10))
  }

  test("SNM recall is a subset of the FastSS truth (found ⊆ truth)") {
    val names = (1 to 60).map(i => f"Cust#$i%04d")
    val truth = pairsOf(names)
    val snm = FuzzyJoin.sortedNeighborhoodPairs(names.toDF("s"), "s", window = 3)
      .as[(String, String)].collect().toSet
    assert(snm.subsetOf(truth))
    assert(snm.nonEmpty && snm.size < truth.size) // single-pass SNM misses edits
  }

  test("multi-pass SNM: each pass ⊆ truth, union ⊇ every pass, reverse key sees prefix edits") {
    // serial keys with the edit in the FIRST character — the shape a
    // lexicographic sort scatters (the strings land in distant sort
    // positions) but the reversed key brings adjacent
    val names = (1 to 40).flatMap(i => Seq(f"A-$i%04d-X", f"B-$i%04d-X"))
    val truth = pairsOf(names)
    val byPass = FuzzyJoin.defaultSnmPasses.map { case (nm, p) =>
      nm -> FuzzyJoin.sortedNeighborhoodPairsBy(names.toDF("s"), "s", p, window = 3)
        .as[(String, String)].collect().toSet
    }.toMap
    val union = FuzzyJoin.multiPassSnmPairs(names.toDF("s"), "s", window = 3)
      .as[(String, String)].collect().toSet
    byPass.foreach { case (nm, s) =>
      assert(s.subsetOf(truth), s"pass $nm emitted a non-edit pair")
      assert(s.subsetOf(union), s"union must cover pass $nm")
    }
    assert(union === byPass.values.reduce(_ ++ _))
    // every (A-k, B-k) pair is a first-char edit: invisible to the
    // identity pass at this window, found by the reversed pass
    val prefixEdits = (1 to 40).map(i => (f"A-$i%04d-X", f"B-$i%04d-X")).toSet
    assert(prefixEdits.subsetOf(truth))
    assert((byPass("identity") & prefixEdits).isEmpty,
      "identity pass should scatter first-char edits at window 3")
    assert(prefixEdits.subsetOf(byPass("reverse")),
      "reversed key must bring first-char-edit pairs adjacent")
    assert(prefixEdits.subsetOf(union))
  }

  test("multi-pass union recall strictly improves on single-pass for mid-string edits") {
    // edits in the middle: identity scatters them; the half-rotation
    // key moves the differing character into the sort prefix's
    // complement — union recall must be >= identity recall, strictly
    // greater when rotation finds pairs identity missed
    val names = (1 to 50).flatMap(i => Seq(f"XX-$i%03d-AA", f"XY-$i%03d-AA"))
    val truth = pairsOf(names)
    val id = FuzzyJoin.sortedNeighborhoodPairsBy(names.toDF("s"), "s", identity, window = 3)
      .as[(String, String)].collect().toSet
    val union = FuzzyJoin.multiPassSnmPairs(names.toDF("s"), "s", window = 3)
      .as[(String, String)].collect().toSet
    assert(id.subsetOf(union))
    assert(union.subsetOf(truth))
    assert(union.size > id.size,
      s"rotated passes found nothing beyond identity (id=${id.size}, union=${union.size}, truth=${truth.size})")
  }

  test("plan: SNM uses the two-pass global rank — no single-partition Window") {
    val df = (1 to 100).map(i => f"key$i%05d").toDF("s")
    val p = FuzzyJoin.sortedNeighborhoodPairs(df, "s")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    graft.functions.GlobalRank.releaseStaged()
  }

  test("plan: candidates come from an equi-join, never a cartesian") {
    val df = (1 to 100).map(i => f"key$i%05d").toDF("s")
    val plan = FuzzyJoin.editDistance1Pairs(df, "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
