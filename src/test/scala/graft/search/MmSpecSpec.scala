package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** SolrPluginUtils.calculateMinShouldMatch parity — the documented mm-spec
  * examples (simple ints, negatives, percentages with float truncation,
  * conditional chains, clamping). */
class MmSpecSpec extends AnyFunSuite {
  private def mm(n: Int, spec: String) = Query.calculateMinShouldMatch(n, spec)

  test("simple integer and clamp") {
    assert(mm(4, "3") == 3)
    assert(mm(2, "3") == 2)  // clamps to optional count
    assert(mm(4, "0") == 0)
  }

  test("negative = all but N") {
    assert(mm(4, "-1") == 3)
    assert(mm(2, "-5") == 0) // floor at 0
  }

  test("percentage truncates through the float product") {
    assert(mm(4, "25%") == 1)
    assert(mm(4, "75%") == 3)
    assert(mm(3, "50%") == 1) // 1.5f -> 1
    assert(mm(4, "-25%") == 3) // 4 + (-1)
  }

  test("conditional chain picks the last applicable segment") {
    assert(mm(2, "2<75%") == 2)  // count <= 2 -> all required
    assert(mm(4, "2<75%") == 3)
    assert(mm(4, "2<25% 9<3") == 1) // second segment not reached (4 <= 9)
    assert(mm(12, "2<25% 9<3") == 3)
  }
}
