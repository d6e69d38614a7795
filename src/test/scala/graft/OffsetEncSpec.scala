package graft

import graft.model.Offset
import org.apache.spark.sql.functions._

/** The DECIMAL(38,0) offset encoding used by every winner aggregate: order
  * preservation, encode/decode round-trip, and the round-2-advice range
  * guard — a segment past 2^42 would COLLIDE (e.g. (0, 2^42, 0) encodes
  * like (1, 0, 0)) and silently pick wrong LWW winners, so it must be a
  * hard error in both the Catalyst expression and the driver-side twin. */
class OffsetEncSpec extends SparkSuite {

  import spark.implicits._

  private def encOne(o: Offset): java.math.BigDecimal =
    Seq(Tuple1(o)).toDF("o").select(Offset.encExpr(col("o")).as("e"))
      .collect()(0).getDecimal(0)

  test("encExpr round-trips through decode and preserves the total order") {
    val offs = Seq(Offset(0, 0, 0), Offset(1, 4, 2), Offset(1, 177, 0),
      Offset(63, 0, 0), Offset(Offset.SegMax, Offset.SegMax, Offset.SegMax))
    offs.foreach(o => assert(Offset.decode(encOne(o)) == o))
    offs.foreach(o => assert(encOne(o).compareTo(Offset.encode(o)) == 0,
      s"driver-side encode disagrees with encExpr for $o"))
    val encs = offs.map(encOne)
    assert(encs == encs.sorted, "encoding must preserve segment-wise order")
  }

  test("null offsets pass through as null (DDL rows must not error)") {
    val r = Seq(Tuple1(Option.empty[Offset])).toDF("o")
      .select(Offset.encExpr(col("o")).as("e")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("out-of-range segments are a hard error, not a colliding encoding") {
    val bads = Seq(Offset(0, Offset.SegMax + 1, 0), Offset(-1, 0, 0),
      Offset(0, 0, Offset.SegMax + 1), Offset(Long.MaxValue, 0, 0))
    bads.foreach { o =>
      val e = intercept[Exception](encOne(o))
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("encodable range")),
        s"expected range error for $o, got: ${e.getMessage}")
      intercept[IllegalArgumentException](Offset.encode(o))
    }
  }
}
