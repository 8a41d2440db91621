package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference Levenshtein for the brute-force oracle. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def bruteForce(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    (for {
      (i1, s1) <- rows; (i2, s2) <- rows
      if i1 < i2
      d = lev(s1, s2)
      if d <= k
    } yield (i1, i2, d)).toSet

  private def run(rows: Seq[(Long, String)], k: Int, q: Int = 2): Set[(Long, Long, Int)] =
    FuzzyJoin.editSelfJoin(rows.toDF("id", "s"), "id", "s", k, q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private val names = Seq[(Long, String)](
    1L -> "jonathan smith", 2L -> "jonathon smith", 3L -> "jonathan smyth",
    4L -> "maria garcia", 5L -> "maria garcya", 6L -> "mariah garcia",
    7L -> "completely different", 8L -> "another outlier string",
    9L -> "jn smith", 10L -> "jonathan smith", // exact dup of 1
    11L -> "", 12L -> "a", 13L -> "ab", 14L -> "b", // sub-q-gram shorts
    15L -> "the the the the", 16L -> "the the the tha")

  test("edit-distance self-join matches a brute-force oracle exactly") {
    for (k <- 0 to 3)
      assert(run(names, k) == bruteForce(names, k), s"k=$k")
  }

  test("completeness survives heavy gram skew (shared boilerplate corpus)") {
    // every string shares the same hot grams; the rarest-first prefix must
    // still surface every true pair exactly
    val skewed = (0L until 40L).map { i =>
      val tail = if (i % 4 == 0) "x" else if (i % 4 == 1) "y" else ""
      i -> (("ab" * 6) + tail + (i / 8))
    }
    for (k <- 1 to 2)
      assert(run(skewed, k) == bruteForce(skewed, k), s"k=$k")
  }

  test("q=3 grams and longer strings agree with the oracle") {
    val rows = (0L until 60L).map { i =>
      val base = s"document title number ${i / 3} with shared boilerplate"
      val s = if (i % 3 == 1) base.replace("number", "numbre")
        else if (i % 3 == 2) base + "!"
        else base
      i -> s
    }
    for (k <- Seq(1, 2))
      assert(run(rows, k, q = 3) == bruteForce(rows, k), s"k=$k")
  }

  test("the verify plan never degenerates to a cross join") {
    val df = FuzzyJoin.editSelfJoin(names.toDF("id", "s"), "id", "s", 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
