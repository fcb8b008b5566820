package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench load gate (round-15 verdict item 7): a loaded box must
  * refuse to record medians unless explicitly forced — the r15
  * artifact run (load1 2.775) cost a round of comparability.
  */
class BenchGateSpec extends AnyFunSuite {

  test("gate refuses a loaded box, admits a quiet one, and always " +
      "admits --force and load-unsupported platforms") {
    // quiet box: proceed
    assert(Bench.loadGateOk(0.31, Bench.LoadGateDefault, force = false))
    // exactly at the gate: still proceed (inclusive threshold)
    assert(Bench.loadGateOk(1.0, 1.0, force = false))
    // loaded box: refuse — this is the r15 artifact-run shape
    assert(!Bench.loadGateOk(2.775, Bench.LoadGateDefault,
      force = false))
    // --force overrides (deliberate loaded runs stay possible; the
    // load1_start stamp still records the conditions)
    assert(Bench.loadGateOk(2.775, Bench.LoadGateDefault,
      force = true))
    // getSystemLoadAverage returns a negative value on platforms
    // without load reporting — never refuse there
    assert(Bench.loadGateOk(-1.0, Bench.LoadGateDefault,
      force = false))
    // a raised gate admits what the default refuses
    assert(Bench.loadGateOk(2.775, 4.0, force = false))
  }
}
