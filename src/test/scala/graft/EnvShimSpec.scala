package graft

import org.apache.spark.graftshim.EnvShim
import org.scalatest.funsuite.AnyFunSuite

/** [[EnvShim.drainPoll]] under scripted cleaner behaviors — the poll that
  * keeps the long-board disk drain honest. ContextCleaner deletes in
  * RPC-paced bursts, so the loop must ride out multi-tick pauses (spending
  * its second gc) rather than reading a mid-burst plateau as "done". */
class EnvShimSpec extends AnyFunSuite {

  /** Scripted byte-size sequence; repeats its last value once exhausted. */
  private class Script(vals: Long*) {
    var calls = 0
    def measure(): Long = {
      val v = if (calls < vals.length) vals(calls) else vals.last
      calls += 1
      v
    }
  }

  test("slow cleaner: a multi-tick mid-drain stall does not break the poll early") {
    // cleaner stalls 4 ticks at 1000 (the second gc buys the reset), then
    // resumes in bursts down to 600 — the poll must return the FLOOR, not
    // the stalled plateau
    val s = new Script(1000, 1000, 1000, 1000, 1000, 800, 800, 600, 600, 600, 600)
    var gcs = 0
    val out = EnvShim.drainPoll(() => s.measure(), () => gcs += 1,
      waitMs = 10000, tickMs = 2)
    assert(out == 600, s"poll broke early at $out (script floor is 600)")
    assert(gcs == 2, s"expected the second gc to fire mid-stall, got $gcs")
  }

  test("nothing reclaimable: exits via the stale counter inside the deadline") {
    val s = new Script(500)
    var gcs = 0
    val t0 = System.currentTimeMillis()
    val out = EnvShim.drainPoll(() => s.measure(), () => gcs += 1,
      waitMs = 5000, tickMs = 2)
    assert(out == 500)
    assert(gcs == 2, "the no-shrink path must spend the retry gc")
    // stale-counter exit, not the 5 s deadline: 2 ms ticks, a handful of
    // iterations — anything near the deadline means the counter is broken
    assert(System.currentTimeMillis() - t0 < 2500)
  }

  test("prompt cleaner: immediate shrink converges to zero") {
    val s = new Script(1000, 400, 0, 0, 0, 0)
    val out = EnvShim.drainPoll(() => s.measure(), () => (),
      waitMs = 10000, tickMs = 2)
    assert(out == 0)
  }

  test("deadline bounds a cleaner that shrinks forever") {
    // monotone trickle: shrinks every tick, never goes stale — only the
    // deadline stops it
    var v = 1000000L
    val t0 = System.currentTimeMillis()
    EnvShim.drainPoll(() => { v -= 1; v }, () => (), waitMs = 60, tickMs = 2)
    val took = System.currentTimeMillis() - t0
    assert(took < 5000, s"deadline did not bound the poll (took $took ms)")
  }
}
