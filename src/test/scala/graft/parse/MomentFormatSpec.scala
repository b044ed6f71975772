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
  test("Z/ZZ formats get a compact-offset fallback variant") {
    assert(MomentFormat.toJavaTimeVariants("YYYY-MM-DD HH:mm:ss.SSSSSSZZ")
      == Seq("yyyy-MM-dd HH:mm:ss.SSSSSSXXX", "yyyy-MM-dd HH:mm:ss.SSSSSSXX"))
    assert(MomentFormat.toJavaTimeVariants("DD/MM/YY") == Seq("dd/MM/yy"))
  }
  test("offset-final detection gates the single-parse normalization path") {
    assert(MomentFormat.offsetIsFormatFinal("YYYY-MM-DD HH:mm:ss.SSSSSSZZ"))
    assert(MomentFormat.offsetIsFormatFinal("YYYY-MM-DD HH:mm:ssZ"))
    assert(!MomentFormat.offsetIsFormatFinal("Z YYYY-MM-DD HH:mm:ss"))
    assert(!MomentFormat.offsetIsFormatFinal("YYYY-MM-DDZHH:mm:ss"))
    assert(!MomentFormat.offsetIsFormatFinal("DD/MM/YY")) // no offset at all
  }
}
