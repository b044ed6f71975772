package graft.parse

import org.scalatest.funsuite.AnyFunSuite

class MomentFormatSpec extends AnyFunSuite {
  test("default reference format translates") {
    assert(MomentFormat.toJavaTime("YYYY-MM-DD HH:mm:ss.SSSSSSZZ")
      == "yyyy-MM-dd HH:mm:ss.SSSSSSXXX")
  }
  test("literals and misc tokens") {
    assert(MomentFormat.toJavaTime("YYYY[T]HH") == "yyyy'T'HH")
    assert(MomentFormat.toJavaTime("DD/MM/YY") == "dd/MM/yy")
  }
}
