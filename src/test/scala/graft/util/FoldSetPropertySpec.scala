package graft.util

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Property-style fuzz (seeded loops, the AttributionPropertySpec
  * pattern) for [[ManifestLog.foldSetsOf]] — the pure
  * sweep/seed/closure/merge core of the range-sharded keyed fold. The
  * example-based drills in ByUserLogSpec/ManifestLogSpec pin the
  * layout-level behavior; this spec locks the interval algebra itself
  * against brute-force references on dense random stacks (small key
  * domain on purpose: point files, shared endpoints, nested ranges,
  * whale straddlers, and multi-interval bursts all occur constantly).
  *
  * The invariants are exactly the scaladoc's correctness argument:
  *  1. no over-depth point ⇒ no fold (the steady tick commits nothing);
  *  2. fold-set hulls are pairwise disjoint (their compactRange grains
  *     cannot collide) and each hull is its files' tight min/max;
  *  3. every over-depth point lies in exactly one hull and its ENTIRE
  *     stack is in that fold set (so the point drops to depth 1);
  *  4. post-fold depth ≤ maxDepth EVERYWHERE, simulating each set's
  *     replacement as one hull-covering range-disjoint generation —
  *     including at points the fold set does not cover (the seeds'
  *     union is connected, so no point of a hull gains a file);
  *  5. sharding/by-reference: a fold set contains only files that
  *     cover an over-depth point or sit inside the final hull —
  *     settled files outside pass untouched;
  *  6. the reported worst pre-fold stack matches brute force over the
  *     set's own files.
  */
class FoldSetPropertySpec extends AnyFunSuite {

  private def entry(i: Int, mn: Long, mx: Long): (Long, Long, ManifestLog.Entry) =
    (mn, mx, ManifestLog.Entry(s"f$i.parquet", Seq(("k", mn, mx))))

  /** Brute-force stack depth at key c. */
  private def depthAt(ranges: Seq[(Long, Long)], c: Long): Int =
    ranges.count { case (mn, mx) => mn <= c && c <= mx }

  test("fuzz: fold sets restore the depth bound minimally (300 seeded cases)") {
    val rng = new Random(20260816L)
    for (caseId <- 0 until 300) {
      val domain = 1 + rng.nextInt(24)
      val nFiles = 1 + rng.nextInt(40)
      val maxDepth = 1 + rng.nextInt(4)
      val foldable = (0 until nFiles).map { i =>
        // Mostly narrow files, occasionally a domain-wide whale — the
        // straddler class the containment closure must leave out.
        val width =
          if (rng.nextInt(8) == 0) domain else rng.nextInt(1 + domain / 3)
        val mn = rng.nextInt(domain).toLong
        val mx = math.min(domain.toLong, mn + width)
        entry(i, mn, mx)
      }
      val ranges = foldable.map { case (mn, mx, _) => (mn, mx) }
      val coords = (0L to domain.toLong).toSeq
      val overPts = coords.filter(c => depthAt(ranges, c) > maxDepth)

      val sets = ManifestLog.foldSetsOf(foldable, maxDepth)
      val clue = s"case $caseId (domain=$domain files=$nFiles maxDepth=$maxDepth)"

      if (overPts.isEmpty) {
        assert(sets.isEmpty, s"$clue: folded a layout already within depth")
      } else {
        assert(sets.nonEmpty, s"$clue: over-depth points but no fold set")
        // 2. Tight, pairwise-disjoint hulls.
        sets.foreach { case (files, lo, hi, _) =>
          assert(lo == files.map(_._1).min && hi == files.map(_._2).max,
            s"$clue: hull [$lo,$hi] is not its files' tight min/max")
        }
        val hulls = sets.map { case (_, lo, hi, _) => (lo, hi) }.sortBy(_._1)
        hulls.sliding(2).foreach {
          case Seq((_, h1), (l2, _)) =>
            assert(h1 < l2, s"$clue: hulls $hulls intersect")
          case _ => ()
        }
        // 3. An over-depth point's whole stack folds, in one set.
        overPts.foreach { c =>
          val holding = sets.filter { case (_, lo, hi, _) => lo <= c && c <= hi }
          assert(holding.size == 1,
            s"$clue: over-depth key $c in ${holding.size} hulls")
          val inSet = holding.head._1.map(_._3.path).toSet
          foldable.foreach { case (mn, mx, e) =>
            if (mn <= c && c <= mx)
              assert(inSet(e.path),
                s"$clue: ${e.path} covers over-depth key $c but stays out")
          }
        }
        // 4. Post-fold depth bound everywhere.
        val folded = sets.flatMap(_._1.map(_._3.path)).toSet
        val post = foldable.collect {
          case (mn, mx, e) if !folded(e.path) => (mn, mx)
        } ++ hulls
        coords.foreach { c =>
          assert(depthAt(post, c) <= maxDepth,
            s"$clue: post-fold depth ${depthAt(post, c)} > $maxDepth at $c " +
              s"(pre ${depthAt(ranges, c)})")
        }
        // 5. Fold sets hold only over-depth stacks or hull-contained files.
        sets.foreach { case (files, lo, hi, _) =>
          files.foreach { case (mn, mx, e) =>
            val relief = overPts.exists(c => mn <= c && c <= mx)
            assert(relief || (mn >= lo && mx <= hi),
              s"$clue: ${e.path} [$mn,$mx] folded without covering an " +
                s"over-depth key or sitting inside [$lo,$hi]")
          }
        }
        // 6. Worst pre-fold stack telemetry, brute-forced per set.
        sets.foreach { case (files, lo, hi, worst) =>
          val own = files.map { case (mn, mx, _) => (mn, mx) }
          val bf = (lo to hi).map(depthAt(own, _)).max
          assert(worst == bf, s"$clue: worst=$worst, brute force $bf")
        }
      }
    }
  }

  test("empty and all-settled layouts fold nothing") {
    assert(ManifestLog.foldSetsOf(Nil, 1).isEmpty)
    val settled = Seq(entry(0, 0L, 9L), entry(1, 10L, 19L), entry(2, 20L, 29L))
    assert(ManifestLog.foldSetsOf(settled, 1).isEmpty)
  }

  test("a narrow burst folds alone; the settled far range passes by reference") {
    // Two settled neighborhoods; a 3-deep burst over [10, 12] only.
    val files = Seq(
      entry(0, 0L, 9L), entry(1, 10L, 12L), entry(2, 10L, 12L),
      entry(3, 10L, 12L), entry(4, 40L, 49L))
    val sets = ManifestLog.foldSetsOf(files, 2)
    assert(sets.size == 1)
    val (fs, lo, hi, worst) = sets.head
    assert(fs.map(_._3.path).toSet ==
      Set("f1.parquet", "f2.parquet", "f3.parquet"))
    assert((lo, hi) == (10L, 12L) && worst == 3)
  }
}
