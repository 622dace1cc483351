package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Format5

/** OP-05/OP-06 decode vectors (SURVEY §5 item 1).
  *
  * The "valid data" vector is the published RuuviTag data-format-5 test
  * vector (raw 0x0512FC5394C37C0004FFFC040CAC364200CDCBB8334C884F →
  * 24.3 °C, 53.49 %, 1000.44 hPa, (0.004, −0.004, 1.036) g, movement 66);
  * the max/min vectors exercise sign extension (`/root/reference/src/
  * bluetooth/scanner.rs:50`), the humidity clamp (`:53`) and the pressure
  * offset (`:56`); the invalid vectors exercise both rejection branches
  * (`:36-45` — dropped, never nulled).
  */
class Format5Spec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def decodeHex(hexes: String*): Seq[Row] =
    hexes.toDF("h")
      .select(unhex(col("h")).as("payload"))
      .filter(Format5.isValid(col("payload")))
      .select(Format5.decodeAll(col("payload")): _*)
      .collect()
      .toSeq

  test("published format-5 test vector decodes exactly") {
    val rows = decodeHex("0512FC5394C37C0004FFFC040CAC364200CDCBB8334C884F")
    assert(rows.size == 1)
    val r = rows.head
    assert(r.getDouble(0) == 24.3)      // temperature
    assert(r.getDouble(1) == 53.49)     // humidity
    assert(r.getDouble(2) == 1000.44)   // pressure
    assert(r.getDouble(3) == 0.004)     // accel x
    assert(r.getDouble(4) == -0.004)    // accel y (sign extension)
    assert(r.getDouble(5) == 1.036)     // accel z
    assert(r.getLong(6) == 66L)         // movement counter
  }

  test("negative temperature sign-extends (0x8001 = -32767)") {
    val r = decodeHex("058001" + "0000" + "0000" + "000000000000" + "FFFF" + "07" + "0000" + "000000000000").head
    assert(r.getDouble(0) == -163.84) // -32767*0.005 = -163.835 → 2dp away-from-zero
    assert(r.getLong(6) == 7L)
  }

  test("humidity clamps to 100.0 before rounding") {
    // humRaw 0xFFFE = 65534 → 163.835 → clamped to 100.0
    val r = decodeHex("050000" + "FFFE" + "0000" + "000000000000" + "FFFF" + "00" + "0000" + "000000000000").head
    assert(r.getDouble(1) == 100.0)
  }

  test("pressure applies +50000 Pa offset") {
    // pressRaw 0xC37C = 50044 → 100044 Pa → 1000.44 hPa
    val r = decodeHex("050000" + "0000" + "C37C" + "000000000000" + "FFFF" + "00" + "0000" + "000000000000").head
    assert(r.getDouble(2) == 1000.44)
  }

  test("wrong format tag is dropped, not nulled") {
    assert(decodeHex("0412FC5394C37C0004FFFC040CAC364200CDCBB8334C884F").isEmpty)
  }

  test("wrong length is dropped, not nulled") {
    assert(decodeHex("0512FC5394C37C0004FFFC040CAC364200CDCBB8334C88").isEmpty) // 23 bytes
  }

  test("encode∘decode round-trips raw fields (property over 200 cases)") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.tabulate(200) { i =>
      (i.toLong,
        (rnd.nextInt(65536) - 32768).toLong, // tempRaw as signed 16
        rnd.nextInt(40001).toLong,           // humRaw (≤ 40000: clamp-free zone)
        rnd.nextInt(65536).toLong,           // pressRaw
        (rnd.nextInt(65536) - 32768).toLong,
        (rnd.nextInt(65536) - 32768).toLong,
        (rnd.nextInt(65536) - 32768).toLong,
        rnd.nextInt(256).toLong)
    }
    val df = cases.toDF("id", "t", "h", "p", "ax", "ay", "az", "m")
      .select(
        col("id"), col("t"), col("h"), col("p"), col("ax"), col("ay"), col("az"), col("m"),
        unhex(Format5.encodeHex(
          col("t"), col("h"), col("p"), col("ax"), col("ay"), col("az"), col("m"))).as("payload"))
    val decoded = df
      .filter(Format5.isValid(col("payload")))
      .select(
        col("id"),
        Format5.beInt16(col("payload"), 2).as("t2"),
        Format5.beUint(col("payload"), 4, 2).as("h2"),
        Format5.beUint(col("payload"), 6, 2).as("p2"),
        Format5.beInt16(col("payload"), 8).as("ax2"),
        Format5.beInt16(col("payload"), 10).as("ay2"),
        Format5.beInt16(col("payload"), 12).as("az2"),
        Format5.movement(col("payload")).as("m2"))
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    assert(decoded.size == 200) // every payload valid: decode is total on encoder output
    cases.foreach { case (id, t, h, p, ax, ay, az, m) =>
      val r = decoded(id)
      assert(r.getLong(1) == t, s"tempRaw case $id")
      assert(r.getLong(2) == h)
      assert(r.getLong(3) == p)
      assert(r.getLong(4) == ax)
      assert(r.getLong(5) == ay)
      assert(r.getLong(6) == az)
      assert(r.getLong(7) == m)
    }
  }
}
