package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class EnvResolverSpec extends AnyFunSuite {

  test("substitutes ${var} tokens from the env map") {
    assert(EnvResolver.substitute("s3://${BUCKET}/x/${ENV}", Map("BUCKET" -> "b", "ENV" -> "prod"))
      === "s3://b/x/prod")
  }

  test("values may be SQL fragments (reference %env current_timestamp())") {
    assert(EnvResolver.substitute("SELECT ${TS} AS t", Map("TS" -> "current_timestamp()"))
      === "SELECT current_timestamp() AS t")
  }

  test("unresolved variable fails fast") {
    assertThrows[IllegalArgumentException](EnvResolver.substitute("${MISSING}", Map.empty))
  }

  test("replacement values containing $ and \\ are inserted literally") {
    assert(EnvResolver.substitute("${V}", Map("V" -> "a$b\\c")) === "a$b\\c")
  }

  test("parseSqlParams splits on first '=' only") {
    assert(EnvResolver.parseSqlParams("a=1,b=x=y, c = z ")
      === Map("a" -> "1", "b" -> "x=y", "c" -> "z"))
  }
}
