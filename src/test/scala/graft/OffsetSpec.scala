package graft

import graft.model.Offset
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the offset total order vs the reference comparator semantics
  * (segment-wise numeric compare of `fileIdx_pos_rowIdx`,
  * reference: base/ServerConstants.java:111-149). Property tests run via
  * raw ScalaCheck with a fixed seed (deterministic in CI). */
class OffsetSpec extends AnyFunSuite {

  private val genOff: Gen[Offset] = for {
    f <- Gen.chooseNum(0L, 1000L)
    p <- Gen.chooseNum(0L, 100000L)
    r <- Gen.chooseNum(0L, 5L)
  } yield Offset(f, p, r)

  def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** reference-style compare: split the rendered seqId on '_', compare
    * numeric segments left to right (ServerConstants.java:111-149). */
  private def refCompare(a: String, b: String): Int = {
    val (as, bs) = (a.split('_').map(_.toLong), b.split('_').map(_.toLong))
    as.zip(bs).iterator.map { case (x, y) => java.lang.Long.compare(x, y) }
      .find(_ != 0).getOrElse(0)
  }

  test("ordering equals the reference's segment-wise numeric comparator") {
    check(Prop.forAll(genOff, genOff) { (a, b) =>
      math.signum(Offset.ordering.compare(a, b)) ==
        math.signum(refCompare(a.render, b.render))
    })
  }

  test("numeric, not lexicographic: file 10 > file 9, pos 100 > pos 99") {
    assert(Offset.ordering.gt(Offset(10, 0, 0), Offset(9, 99999, 2)))
    assert(Offset.ordering.gt(Offset(1, 100, 0), Offset(1, 99, 2)))
    assert(Offset.ordering.gt(Offset(1, 1, 2), Offset(1, 1, 1)))
    // the reference zero-pads binlog file suffixes and compares the numeric
    // part (BinlogProducer.java:200-203) — "000012" parses numerically
    assert(Offset.parse("12_4_0") == Offset(12, 4, 0))
  }

  test("parse/render round-trip; malformed offsets rejected") {
    check(Prop.forAll(genOff)(o => Offset.parse(o.render) == o))
    intercept[IllegalArgumentException](Offset.parse("1_2"))
    intercept[IllegalArgumentException](Offset.parse("1_2_3_4"))
  }
}
