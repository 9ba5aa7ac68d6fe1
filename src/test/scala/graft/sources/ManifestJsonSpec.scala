package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class ManifestJsonSpec extends AnyFunSuite {

  test("parses a rendered manifest regardless of field order and whitespace") {
    val a = ManifestJson.parseObject(
      """{"version":3,"mode":"append","dataDirs":["u1","u2"],"txn":"app:1"}""")
    val b = ManifestJson.parseObject(
      """ { "txn" : "app:1" ,
            "dataDirs" : [ "u1" , "u2" ] ,
            "mode" : "append" , "version" : 3 } """)
    assert(a == b)
    assert(a("version") == 3L)
    assert(a("dataDirs") == List("u1", "u2"))
  }

  test("string escapes round-trip through quote/parse") {
    val nasty = "say \"hi\"\\ tab\t nl\n ctl unié"
    val parsed = ManifestJson.parseObject(
      s"""{"v":${ManifestJson.quote(nasty)}}""")
    assert(parsed("v") == nasty)
  }

  test("unknown future fields are ignored, not fatal (forward compat)") {
    val m = ManifestJson.parseObject(
      """{"version":1,"mode":"append","dataDirs":[],
         "futureNested":{"a":[1,2,{"b":null}],"ok":true},
         "futureNum":-1.5e3}""")
    assert(m("version") == 1L)
    assert(m("futureNum") == -1500.0)
    assert(m("futureNested").asInstanceOf[Map[String, Any]]("ok") == true)
  }

  test("malformed input fails loudly with position info") {
    for (bad <- Seq("""{"a":}""", """{"a":1""", """{"a" 1}""",
        """{'a':1}""", """{"a":1}x""", """{"a":"unterminated}""")) {
      val e = intercept[IllegalArgumentException] {
        ManifestJson.parseObject(bad)
      }
      assert(e.getMessage.contains("offset"), bad)
    }
  }

  test("empty object and empty array parse") {
    assert(ManifestJson.parseObject("{}") == Map.empty)
    assert(ManifestJson.parseObject("""{"d":[]}""")("d") == Nil)
  }
}
