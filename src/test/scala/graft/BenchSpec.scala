package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Bench self-validation plumbing (round-10 verdict #1): priors must be
  * recoverable from the DRIVER's committed wrapper shape — per-query
  * values live inside a head-truncated stdout `tail` string, not a
  * navigable `queries` node — and must be sf-matched so soak runs at
  * other scales don't flag the whole suite as hot. Pure JVM, no Spark. */
class BenchSpec extends AnyFunSuite {

  private def driverWrapper(round: Int, sfDir: String,
      pairs: Seq[(String, Double)], truncateHead: Boolean): String = {
    val qs = pairs.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val full = s"""{"metric":"total","value":1.0,"unit":"sec","queries":{$qs},"sf":"$sfDir"}"""
    // the driver keeps a bounded stdout TAIL: cut the line's head INTO
    // the first pair's name (mid-token), like BENCH_r10.json's real tail
    val tail =
      if (truncateHead) full.substring(full.indexOf(pairs.head._1) + 3)
      else full
    s"""{"n": $round, "rc": 0, "cpus": 32, "sf": 0.1, "tail": ${quote(tail)},
       | "parsed": {"metric":"total","value":1.0,"sf":"$sfDir"}}""".stripMargin
  }

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  test("priors parse from the driver wrapper, head-truncated tail included") {
    val dir = Files.createTempDirectory("benchprior")
    val sf = "/root/testdata/sf0.1"
    Files.writeString(dir.resolve("BENCH_r9.json"),
      driverWrapper(9, sf, Seq("q1_agg" -> 0.30, "q4_topk" -> 0.12),
        truncateHead = false))
    Files.writeString(dir.resolve("BENCH_r10.json"),
      driverWrapper(10, sf, Seq("q1_agg" -> 0.25, "q4_topk" -> 0.40),
        truncateHead = true))
    val priors = Bench.priorMins(sf, Some(dir.toString))
    // min across rounds, per query; r10's first pair lost its name
    // prefix to the truncation ("agg":0.25), so it contributes nothing
    // and q1_agg's prior is r9's value
    assert(priors.get("q4_topk") === Some(0.12))
    assert(priors.get("q1_agg") === Some(0.30))
    // no invented names from non-query numeric pairs ("value", "n", ...)
    assert(priors.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("priors are sf-matched: another scale's bench contributes nothing") {
    val dir = Files.createTempDirectory("benchprior2")
    Files.writeString(dir.resolve("BENCH_r10.json"),
      driverWrapper(10, "/root/testdata/sf0.1",
        Seq("q1_agg" -> 0.25), truncateHead = false))
    assert(Bench.priorMins("tmp/sf10", Some(dir.toString)) === Map.empty)
    assert(Bench.priorMins("/root/testdata/sf0.1",
      Some(dir.toString)).nonEmpty)
  }

  test("committed bench_out.json is a prior source for round-new queries") {
    // a query added this round has no BENCH_r* row yet — without the
    // self-produced artifact as a prior the record run cannot flag
    // contention on exactly the newest gates
    val dir = Files.createTempDirectory("benchprior3")
    val sf = "/root/testdata/sf0.1"
    Files.writeString(dir.resolve("BENCH_r10.json"),
      driverWrapper(10, sf, Seq("q1_agg" -> 0.25), truncateHead = false))
    Files.writeString(dir.resolve("bench_out.json"),
      s"""{"metric":"total","value":2.0,"unit":"sec",""" +
        s""""queries":{"doc_jaccard_pairs":2.2,"q1_agg":0.5},"sf":"$sf"}""")
    val priors = Bench.priorMins(sf, Some(dir.toString))
    assert(priors.get("doc_jaccard_pairs") === Some(2.2))
    assert(priors.get("q1_agg") === Some(0.25)) // min across sources
  }

  test("absent or unreadable prior dir means no priors, no throw") {
    assert(Bench.priorMins("/root/testdata/sf0.1",
      Some("/nonexistent/nowhere")) === Map.empty)
  }

  test("prior ledger wins over text-scanned tails; append trims to 3") {
    val dir = Files.createTempDirectory("benchledger")
    val sf = "/root/testdata/sf0.1"
    // a tampered/mid-round bench_out claims q1_agg was 0.01 — the ledger
    // row (validated history) must take precedence, NOT min with it
    Files.writeString(dir.resolve("bench_out.json"),
      s"""{"metric":"total","value":2.0,"unit":"sec",""" +
        s""""queries":{"q1_agg":0.01,"doc_jaccard_pairs":2.2},"sf":"$sf"}""")
    Bench.updatePriors(sf, Map("q1_agg" -> 0.5), Some(dir.toString))
    val priors = Bench.priorMins(sf, Some(dir.toString))
    assert(priors.get("q1_agg") === Some(0.5),
      "ledger prior must override the same-round bench_out value")
    // no ledger row -> the text scan is still the (only) fallback
    assert(priors.get("doc_jaccard_pairs") === Some(2.2))
    // history appends newest-last and trims to 3
    Seq(0.4, 0.6, 0.7).foreach(v =>
      Bench.updatePriors(sf, Map("q1_agg" -> v), Some(dir.toString)))
    val ledger = Bench.readPriorsLedger(dir)
    assert(ledger((sf, "q1_agg")) === Seq(0.4, 0.6, 0.7))
    // prior = min of the retained history (0.5 aged out)
    assert(Bench.priorMins(sf, Some(dir.toString))
      .get("q1_agg") === Some(0.4))
    // other-sf ledger rows contribute nothing
    assert(!Bench.priorMins("tmp/sf10", Some(dir.toString))
      .contains("q1_agg"))
  }

  test("seeded regression: an artificially slowed query reads hot") {
    // the round-12 hole in vivo: geo_knn shipped at 1.16 s against a
    // 0.52 s true prior without flagging, because the refreshed
    // bench_out was its only prior. With the ledger carrying the real
    // prior, the same slowdown trips the predicate.
    assert(Bench.isHot(0.52, 1.16))
    assert(Bench.isHot(0.5, 2.0))
    assert(!Bench.isHot(0.52, 0.9)) // < 2x: fine
    assert(!Bench.isHot(0.05, 0.2)) // 4x but under the 0.25 s floor
    val dir = Files.createTempDirectory("benchseed")
    val sf = "/root/testdata/sf0.1"
    Bench.updatePriors(sf, Map("geo_knn" -> 0.52), Some(dir.toString))
    val p = Bench.priorMins(sf, Some(dir.toString))("geo_knn")
    assert(Bench.isHot(p, 1.16), "ledger-sourced prior must flag the 2.2x run")
  }

  test("ledger survives a malformed entry; refuses rewrite when unreadable") {
    val dir = Files.createTempDirectory("benchcorrupt")
    val sf = "/root/testdata/sf0.1"
    Bench.updatePriors(sf, Map("q1_agg" -> 0.5, "q4_topk" -> 0.2),
      Some(dir.toString))
    // corrupt ONE entry's vals in place — the other must survive a read
    val f = dir.resolve("BENCH_PRIORS.json")
    Files.writeString(f, Files.readString(f)
      .replace("\"q\":\"q1_agg\",\"vals\":[0.5]",
        "\"q\":\"q1_agg\",\"vals\":[0.5,<<<<]"))
    val ledger = Bench.readPriorsLedger(dir)
    assert(ledger((sf, "q4_topk")) === Seq(0.2), "good entry must survive")
    assert(!ledger.contains((sf, "q1_agg")), "bad entry dropped, not fatal")
    // a ledger that exists with content but parses to NOTHING must not
    // be rewritten from scratch by the next update
    Files.writeString(f, "<" * 400)
    Bench.updatePriors(sf, Map("q1_agg" -> 0.9), Some(dir.toString))
    assert(Files.readString(f) === "<" * 400,
      "corrupt non-trivial ledger must be left untouched")
  }

  test("drift tripwire: monotone >=1.25x ledger windows flag; noise does not") {
    // the round-14 live case: doc_jaccard_clusters_star crept
    // 3.19 -> 3.84 -> 4.44 s across three VALIDATED records, each step
    // under the pairwise 2x+0.25 s bar — compounding drift the hot
    // predicate cannot see
    assert(Bench.isDrifting(Seq(3.19, 3.84, 4.44)))
    assert(Bench.isDrifting(Seq(2.44, 2.44, 3.15))) // neardup star: +29%
    assert(!Bench.isDrifting(Seq(3.19, 3.84)))      // window too short
    assert(!Bench.isDrifting(Seq(3.19, 3.05, 4.44))) // non-monotone: noise
    assert(!Bench.isDrifting(Seq(3.19, 3.25, 3.40))) // < 1.25x total
    assert(!Bench.isDrifting(Seq(0.05, 0.06, 0.08))) // under the 0.25 s floor
    // end-to-end through a synthetic committed ledger
    val dir = Files.createTempDirectory("benchdrift")
    val sf = "/root/testdata/sf0.1"
    Seq(3.19, 3.84, 4.44).foreach(v =>
      Bench.updatePriors(sf, Map("doc_jaccard_clusters_star" -> v),
        Some(dir.toString)))
    Seq(0.40, 0.41, 0.42).foreach(v =>
      Bench.updatePriors(sf, Map("q1_agg" -> v), Some(dir.toString)))
    val known = Set("doc_jaccard_clusters_star", "q1_agg")
    assert(Bench.driftingQueries(sf, known, Some(dir.toString)) ===
      Seq("doc_jaccard_clusters_star"))
    // other-sf windows and unknown queries contribute nothing
    assert(Bench.driftingQueries("tmp/sf10", known,
      Some(dir.toString)).isEmpty)
    assert(Bench.driftingQueries(sf, Set("q1_agg"),
      Some(dir.toString)).isEmpty)
    // a re-baselining isolated measure (lower value appended by the
    // next validated run) breaks the monotone window and clears the flag
    Bench.updatePriors(sf, Map("doc_jaccard_clusters_star" -> 3.3),
      Some(dir.toString))
    assert(Bench.driftingQueries(sf, known, Some(dir.toString)).isEmpty)
  }

  test("committed ledger covers every query for the bench sf") {
    // round-13 contract: every shared query's prior provably comes from
    // round-<=12 validated data — i.e. the committed ledger has a row
    // for each query at the driver's bench scale (new gates excepted:
    // they get their first row when their first validated run lands)
    val f = new java.io.File("BENCH_PRIORS.json")
    assume(f.isFile, "no committed ledger in cwd")
    val ledger = Bench.readPriorsLedger(java.nio.file.Paths.get("."))
    val sfQ = ledger.keySet.collect {
      case (sf, q) if sf == "/root/testdata/sf0.1" => q }
    // a brand-new gate fails here until its first validated Bench run
    // lands a ledger row — that is the designed workflow: bench a new
    // gate (even SPARK_GRAFT_BENCH_ONLY=<gate>) before committing it
    val missing = SparkEntry.queries.keySet -- sfQ
    assert(missing.isEmpty, s"queries with no ledger prior: $missing")
    ledger.values.foreach(vals =>
      assert(vals.nonEmpty && vals.forall(v => v > 0 && v < 600)))
  }

  test("priors recover from the REAL committed driver benches") {
    // the repo root always carries the driver's BENCH_r*.json wrappers;
    // the validation path is only real if it can read them (the first
    // implementation navigated a `queries` node that does not exist in
    // the wrapper shape and silently recovered zero priors)
    val real = new java.io.File(".").listFiles()
      .exists(_.getName.matches("BENCH_r\\d+\\.json"))
    assume(real, "no committed driver benches in cwd")
    val priors = Bench.priorMins("/root/testdata/sf0.1", None)
    assert(priors.nonEmpty)
    assert(priors.contains("q1_agg"))
    assert(priors.values.forall(v => v > 0 && v < 60))
  }
}
