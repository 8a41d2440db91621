package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench must not let a broken query masquerade as a fast one: a rep
  * that throws records an `"error"` marker in BENCH_DETAIL and is excluded
  * from `total_min` and the stdout `queries` map (VERDICT r6 "what's wrong"
  * item 1). Pure-function coverage of [[Bench.summarize]]. */
class BenchSummarySpec extends AnyFunSuite {

  test("a throwing query becomes an error marker, not a near-zero win") {
    val detail = Seq(
      "q01_ok" -> Seq(Right(1.5), Right(1.25)),
      "q02_broken" -> Seq(Left("java.lang.IllegalStateException: boom"), Right(0.01)),
      "q03_ok" -> Seq(Right(0.5), Right(0.75)))
    val s = Bench.summarize(
      detail.map { case (n, r) => (n, r: Seq[Either[String, Double]]) },
      "/root/testdata/sf0.1", reps = 2)
    // errored query: excluded from results + total, present as "error"
    assert(s.errors == Map("q02_broken" -> "java.lang.IllegalStateException: boom"))
    assert(s.results == Map("q01_ok" -> 1.25, "q03_ok" -> 0.5))
    assert(s.detailJson.contains("\"error_count\":1"))
    assert(s.detailJson.contains("\"total_min\":1.75"))
    assert(s.detailJson.contains(
      "\"q02_broken\":{\"reps\":[0.01],\"error\":\"java.lang.IllegalStateException: boom\"}"))
    assert(s.stdoutJson.contains("\"value\":1.75"))
    assert(!s.stdoutJson.contains("q02_broken"))
    // healthy queries keep the historical schema: reps list + min
    assert(s.detailJson.contains("\"q01_ok\":{\"reps\":[1.5,1.25],\"min\":1.25}"))
  }

  test("all reps failing yields an empty reps list and zero total") {
    val s = Bench.summarize(
      Seq("q_only" -> Seq[Either[String, Double]](Left("e1"), Left("e2"))),
      "sfX", reps = 2)
    assert(s.results.isEmpty)
    assert(s.detailJson.contains("\"q_only\":{\"reps\":[],\"error\":\"e1\"}"))
    assert(s.detailJson.contains("\"total_min\":0.0"))
    assert(s.stdoutJson.contains("\"queries\":{}"))
  }

  test("stdout line stays tail-sized: headline cap keeps the slowest queries") {
    val detail = (1 to 40).map { i =>
      (f"q$i%02d", Seq[Either[String, Double]](Right(i * 0.1)))
    }
    val s = Bench.summarize(detail, "sfY", reps = 1)
    // slowest HeadlineCap queries survive on stdout; the rest live in detail
    assert(s.stdoutJson.contains("\"q40\""))
    assert(s.stdoutJson.contains(s"\"q${41 - Bench.HeadlineCap}\""))
    assert(!s.stdoutJson.contains(s"\"q${40 - Bench.HeadlineCap}\""))
    assert(s.stdoutJson.contains("\"query_count\":40"))
    assert(s.stdoutJson.length < 1200)
    // the detail record still carries every query
    assert((1 to 40).forall(i => s.detailJson.contains(f"q$i%02d")))
  }

  test("error text is JSON-escaped") {
    assert(Bench.jsonEscape("a\"b\\c\nd") == "a\\\"b\\\\c\\u000ad")
    val s = Bench.summarize(
      Seq("q" -> Seq[Either[String, Double]](Left("path \"x\\y\""))), "sf", 1)
    assert(s.detailJson.contains("\"error\":\"path \\\"x\\\\y\\\"\""))
  }
}
