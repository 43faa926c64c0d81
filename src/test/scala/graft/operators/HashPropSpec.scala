package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** The byte-level md5 value extraction must equal parsing the hex
  * string (which is what the DuckDB oracle does with strpos digit
  * arithmetic). */
object HashProps extends Properties("Md5Hashes") {

  private def md5HexRef(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  private val strGen = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.listOf(Gen.oneOf('a', 'b', ' ', 'z', 'q', 'é', '中'))
      .map(_.mkString))

  property("md5Hash32 equals first-8-hex-digit parse") =
    Prop.forAll(strGen) { s =>
      Dedup.md5Hash32(s) == java.lang.Long.parseLong(md5HexRef(s).take(8), 16)
    }

  property("md5Hash60 equals first-15-hex-digit parse") =
    Prop.forAll(strGen) { s =>
      Dedup.md5Hash60(s) == java.lang.Long.parseLong(md5HexRef(s).take(15), 16)
    }
}
