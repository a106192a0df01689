package graft

import org.scalatest.funsuite.AnyFunSuite

/** The round-stamp write-once MECHANISM (VERDICT r17 #3): the r14
  * write-once rule was a convention that permitted delete-and-re-stamp
  * (NOTES_r17 §1 had to use it); now overwriting an existing
  * `bench_rNN.json` requires `SPARK_GRAFT_RESTAMP=<reason>` and the
  * reason is recorded in the artifact's env block. These tests pin all
  * policy cells without running the suite. */
class BenchSpec extends AnyFunSuite {

  test("fresh stamp writes regardless of the restamp env") {
    assert(Bench.stampPolicy(exists = false, None, "bench_r18.json")._1)
    assert(Bench.stampPolicy(exists = false, Some("why"), "bench_r18.json")._1)
  }

  test("existing stamp without the override is refused and says how") {
    val (write, msg) = Bench.stampPolicy(exists = true, None, "bench_r18.json")
    assert(!write)
    assert(msg.contains("write-once"))
    assert(msg.contains("SPARK_GRAFT_RESTAMP"))
  }

  test("existing stamp with the override overwrites and logs the reason") {
    val (write, msg) =
      Bench.stampPolicy(exists = true, Some("pre-probe tree superseded"), "bench_r18.json")
    assert(write)
    assert(msg.contains("RE-STAMPED"))
    assert(msg.contains("pre-probe tree superseded"))
  }
}
