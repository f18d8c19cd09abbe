package graft

import graft.functions.BqDateFormat
import org.scalatest.funsuite.AnyFunSuite

class BqDateFormatSpec extends AnyFunSuite {
  test("the five reference formats translate to the verified Spark patterns") {
    assert(BqDateFormat.toSpark("%Y/%m/%d %H:%M:%S") == "yyyy/MM/dd HH:mm:ss")
    assert(BqDateFormat.toSpark("%Y/%m/%d") == "yyyy/MM/dd")
    assert(BqDateFormat.toSpark("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss")
    assert(BqDateFormat.toSpark("%Y-%m-%d") == "yyyy-MM-dd")
    assert(
      BqDateFormat.toSpark("%Y-%m-%dT%H:%M:%E*SZ") == "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]'Z'"
    )
  }
  test("literal letters are quoted, %% escapes") {
    assert(BqDateFormat.toSpark("%H h %M") == "HH 'h' mm")
    assert(BqDateFormat.toSpark("%d%%") == "dd%")
  }
  test("duckdb variants expand %E*S") {
    assert(
      BqDateFormat.toDuckDbVariants("%Y-%m-%dT%H:%M:%E*SZ") ==
        Seq("%Y-%m-%dT%H:%M:%S.%fZ", "%Y-%m-%dT%H:%M:%SZ")
    )
    assert(BqDateFormat.toDuckDbVariants("%Y/%m/%d") == Seq("%Y/%m/%d"))
  }
}
