package graft

import graft.media.Gif
import org.scalatest.funsuite.AnyFunSuite

/** The encode-side hardening twin of the decoder's forged-dimension
  * rejects: dimension products are checked in Long BEFORE any Int
  * arithmetic, so hostile dims reject cleanly instead of overflowing into
  * a wrong length check and a multi-GB allocation.
  */
class GifEncodeBoundSpec extends AnyFunSuite {
  test("Gif.encode rejects dimension products that overflow Int, before allocating") {
    // 43691*32768*3 = 4,295,589,888 overflows Int to 622,592 — a forged
    // rgb of exactly that length would previously pass the length check
    val ex = intercept[IllegalArgumentException](
      Gif.encode(43691, 32768, new Array[Byte](622592)))
    assert(ex.getMessage.contains("unreasonable GIF dimensions"),
      s"overflowing dims must hit the Long-math bound, got: ${ex.getMessage}")
    // per-axis bound still enforced
    intercept[IllegalArgumentException](Gif.encode(70000, 1, new Array[Byte](3)))
    ()
  }
}
