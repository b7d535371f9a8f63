package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Crypto

/** Crypto scalars vs published vectors (reference surface:
  * builtins.c:7870/7940/7681; cipher mode crypt.c CBC+PKCS7). */
class CryptoSpec extends AnyFunSuite {
  import SparkTestSession._

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("SM4 block matches the GB/T 32907 standard vector") {
    val key = unhex("0123456789abcdeffedcba9876543210")
    val pt = unhex("0123456789abcdeffedcba9876543210")
    assert(hex(Crypto.sm4EncryptBlock(key, pt)) ==
      "681edf34d206965e86b3e94f536e4246")
  }

  test("SM4 CBC+PKCS7 round-trips arbitrary lengths") {
    val key = "0123456789abcdef".getBytes
    val iv = new Array[Byte](16)
    for (n <- Seq(0, 1, 15, 16, 17, 100)) {
      val msg = Array.tabulate(n)(i => (i * 7 + 3).toByte)
      val ct = Crypto.sm4EncryptBytes(msg, key, iv)
      assert(ct.length % 16 == 0 && ct.length == (n / 16 + 1) * 16)
      assert(Crypto.sm4DecryptBytes(ct, key, iv).toSeq == msg.toSeq)
    }
  }

  test("SM4 short keys are zero-padded like the reference key buffer") {
    val iv = new Array[Byte](16)
    val msg = "hello sm4".getBytes
    val ct = Crypto.sm4EncryptBytes(msg, "key1".getBytes, iv)
    val padded = java.util.Arrays.copyOf("key1".getBytes, 16)
    assert(Crypto.sm4DecryptBytes(ct, padded, iv).toSeq == msg.toSeq)
  }

  test("AES CBC first block matches NIST SP 800-38A F.2.1") {
    val df = spark.range(1).select(
      Crypto.aesEncrypt(
        lit(unhex("6bc1bee22e409f96e93d7e117393172a")),
        lit(unhex("2b7e151628aed2a6abf7158809cf4f3c")),
        lit(unhex("000102030405060708090a0b0c0d0e0f"))).as("ct"))
    val ct = df.collect()(0).getAs[Array[Byte]](0)
    // Spark prepends the 16-byte IV; the next block is the vector's C1
    assert(hex(ct.slice(16, 32)) == "7649abac8119b246cee98e9b12e9197d")
  }

  test("AES encrypt/decrypt round-trips through columns") {
    val df = spark.range(1).select(
      Crypto.aesDecrypt(
        Crypto.aesEncrypt(lit("the quick brown fox".getBytes),
          lit("0123456789abcdef".getBytes), lit(new Array[Byte](16))),
        lit("0123456789abcdef".getBytes)).cast("string").as("rt"))
    assert(df.collect()(0).getString(0) == "the quick brown fox")
  }

  test("TOTP matches RFC 6238 SHA-1 vectors (6-digit)") {
    // secret "12345678901234567890" in base32
    val s = "GEZDGNBVGY3TQOJQGEZDGNBVGY3TQOJQ"
    assert(Crypto.totpAt(s, 59L) == "287082")
    assert(Crypto.totpAt(s, 1111111109L) == "081804")
    assert(Crypto.totpAt(s, 1234567890L) == "005924")
    assert(Crypto.totpAt(s, 2000000000L) == "279037")
  }

  test("base32 decode handles case and padding") {
    assert(new String(Crypto.base32Decode("MZXW6YTBOI======")) == "foobar")
    assert(new String(Crypto.base32Decode("mzxw6ytboi")) == "foobar")
  }

  test("totpCode column form is null-safe") {
    val df = spark.range(1).select(
      Crypto.totpCode(lit("GEZDGNBVGY3TQOJQGEZDGNBVGY3TQOJQ"), lit(59L))
        .as("c"),
      Crypto.totpCode(lit(null).cast("string"), lit(59L)).as("n"))
    val r = df.collect()(0)
    assert(r.getString(0) == "287082" && r.isNullAt(1))
  }
}
