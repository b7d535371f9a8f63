package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Crypto scalar surface (reference builtins.c:7870 aes_encrypt /
  * builtins.c:7940 sm4_encrypt / builtins.c:7681 generate_totp_code;
  * cipher core at libs/crypt/src/crypt.c — CBC + PKCS7).
  *
  * aes_* lowers onto Spark's built-in `aes_encrypt`/`aes_decrypt`
  * (codegen'd) in CBC/PKCS mode with an explicit IV so output is
  * deterministic. SM4 (GB/T 32907-2016) has no JDK/Spark primitive, so
  * the block cipher is implemented here and exposed as a UDF — scalar,
  * map-side, no shuffle; fine off the hot path. TOTP is RFC 6238
  * (base32 secret → HMAC-SHA1 → 31-bit truncation → 6 digits) with an
  * explicit timestamp argument for determinism.
  */
object Crypto {

  // ------------------------------------------------------------------ AES
  /** CBC/PKCS with explicit IV (16 bytes) — deterministic output; the
    * IV is carried as the ciphertext prefix (Spark convention), so
    * decrypt needs no IV argument. */
  def aesEncrypt(data: Column, key: Column, iv: Column): Column =
    call_function("aes_encrypt", data, key, lit("CBC"), lit("PKCS"), iv)

  def aesDecrypt(data: Column, key: Column): Column =
    call_function("aes_decrypt", data, key, lit("CBC"), lit("PKCS"))

  // ------------------------------------------------------------------ SM4
  // GB/T 32907-2016 constants (public standard)
  private val SboxTable: Array[Int] = Array(
    0xd6, 0x90, 0xe9, 0xfe, 0xcc, 0xe1, 0x3d, 0xb7, 0x16, 0xb6, 0x14,
    0xc2, 0x28, 0xfb, 0x2c, 0x05, 0x2b, 0x67, 0x9a, 0x76, 0x2a, 0xbe,
    0x04, 0xc3, 0xaa, 0x44, 0x13, 0x26, 0x49, 0x86, 0x06, 0x99, 0x9c,
    0x42, 0x50, 0xf4, 0x91, 0xef, 0x98, 0x7a, 0x33, 0x54, 0x0b, 0x43,
    0xed, 0xcf, 0xac, 0x62, 0xe4, 0xb3, 0x1c, 0xa9, 0xc9, 0x08, 0xe8,
    0x95, 0x80, 0xdf, 0x94, 0xfa, 0x75, 0x8f, 0x3f, 0xa6, 0x47, 0x07,
    0xa7, 0xfc, 0xf3, 0x73, 0x17, 0xba, 0x83, 0x59, 0x3c, 0x19, 0xe6,
    0x85, 0x4f, 0xa8, 0x68, 0x6b, 0x81, 0xb2, 0x71, 0x64, 0xda, 0x8b,
    0xf8, 0xeb, 0x0f, 0x4b, 0x70, 0x56, 0x9d, 0x35, 0x1e, 0x24, 0x0e,
    0x5e, 0x63, 0x58, 0xd1, 0xa2, 0x25, 0x22, 0x7c, 0x3b, 0x01, 0x21,
    0x78, 0x87, 0xd4, 0x00, 0x46, 0x57, 0x9f, 0xd3, 0x27, 0x52, 0x4c,
    0x36, 0x02, 0xe7, 0xa0, 0xc4, 0xc8, 0x9e, 0xea, 0xbf, 0x8a, 0xd2,
    0x40, 0xc7, 0x38, 0xb5, 0xa3, 0xf7, 0xf2, 0xce, 0xf9, 0x61, 0x15,
    0xa1, 0xe0, 0xae, 0x5d, 0xa4, 0x9b, 0x34, 0x1a, 0x55, 0xad, 0x93,
    0x32, 0x30, 0xf5, 0x8c, 0xb1, 0xe3, 0x1d, 0xf6, 0xe2, 0x2e, 0x82,
    0x66, 0xca, 0x60, 0xc0, 0x29, 0x23, 0xab, 0x0d, 0x53, 0x4e, 0x6f,
    0xd5, 0xdb, 0x37, 0x45, 0xde, 0xfd, 0x8e, 0x2f, 0x03, 0xff, 0x6a,
    0x72, 0x6d, 0x6c, 0x5b, 0x51, 0x8d, 0x1b, 0xaf, 0x92, 0xbb, 0xdd,
    0xbc, 0x7f, 0x11, 0xd9, 0x5c, 0x41, 0x1f, 0x10, 0x5a, 0xd8, 0x0a,
    0xc1, 0x31, 0x88, 0xa5, 0xcd, 0x7b, 0xbd, 0x2d, 0x74, 0xd0, 0x12,
    0xb8, 0xe5, 0xb4, 0xb0, 0x89, 0x69, 0x97, 0x4a, 0x0c, 0x96, 0x77,
    0x7e, 0x65, 0xb9, 0xf1, 0x09, 0xc5, 0x6e, 0xc6, 0x84, 0x18, 0xf0,
    0x7d, 0xec, 0x3a, 0xdc, 0x4d, 0x20, 0x79, 0xee, 0x5f, 0x3e, 0xd7,
    0xcb, 0x39, 0x48)

  private val FK = Array(0xa3b1bac6, 0x56aa3350, 0x677d9197, 0xb27022dc)
  private val CK: Array[Int] = Array.tabulate(32) { i =>
    val b = Array.tabulate(4)(j => (28 * i + 7 * j) % 256)
    (b(0) << 24) | (b(1) << 16) | (b(2) << 8) | b(3)
  }

  @inline private def rotl(x: Int, n: Int): Int = (x << n) | (x >>> (32 - n))
  @inline private def tau(a: Int): Int = {
    (SboxTable((a >>> 24) & 0xff) << 24) |
      (SboxTable((a >>> 16) & 0xff) << 16) |
      (SboxTable((a >>> 8) & 0xff) << 8) | SboxTable(a & 0xff)
  }
  @inline private def tEnc(x: Int): Int = {
    val b = tau(x); b ^ rotl(b, 2) ^ rotl(b, 10) ^ rotl(b, 18) ^ rotl(b, 24)
  }
  @inline private def tKey(x: Int): Int = {
    val b = tau(x); b ^ rotl(b, 13) ^ rotl(b, 23)
  }

  private def roundKeys(key: Array[Byte]): Array[Int] = {
    require(key.length == 16, "SM4 key must be 16 bytes")
    val mk = Array.tabulate(4)(i =>
      ((key(4 * i) & 0xff) << 24) | ((key(4 * i + 1) & 0xff) << 16) |
        ((key(4 * i + 2) & 0xff) << 8) | (key(4 * i + 3) & 0xff))
    val k = new Array[Int](36)
    for (i <- 0 until 4) k(i) = mk(i) ^ FK(i)
    val rk = new Array[Int](32)
    for (i <- 0 until 32) {
      k(i + 4) = k(i) ^ tKey(k(i + 1) ^ k(i + 2) ^ k(i + 3) ^ CK(i))
      rk(i) = k(i + 4)
    }
    rk
  }

  /** One 16-byte block; decrypt = reversed round keys. */
  private def cryptBlock(rk: Array[Int], in: Array[Byte], off: Int,
      out: Array[Byte], outOff: Int): Unit = {
    val x = new Array[Int](36)
    for (i <- 0 until 4)
      x(i) = ((in(off + 4 * i) & 0xff) << 24) |
        ((in(off + 4 * i + 1) & 0xff) << 16) |
        ((in(off + 4 * i + 2) & 0xff) << 8) | (in(off + 4 * i + 3) & 0xff)
    for (i <- 0 until 32)
      x(i + 4) = x(i) ^ tEnc(x(i + 1) ^ x(i + 2) ^ x(i + 3) ^ rk(i))
    for (i <- 0 until 4) {
      val w = x(35 - i)
      out(outOff + 4 * i) = (w >>> 24).toByte
      out(outOff + 4 * i + 1) = (w >>> 16).toByte
      out(outOff + 4 * i + 2) = (w >>> 8).toByte
      out(outOff + 4 * i + 3) = w.toByte
    }
  }

  /** SM4-ECB single block (for vector tests). */
  def sm4EncryptBlock(key: Array[Byte], block: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](16)
    cryptBlock(roundKeys(key), block, 0, out, 0)
    out
  }

  /** SM4-CBC + PKCS7, mirroring the reference cipher mode. Keys shorter
    * than 16 bytes are zero-padded (crypt.c pads the key buffer). */
  def sm4EncryptBytes(data: Array[Byte], key: Array[Byte],
      iv: Array[Byte]): Array[Byte] = {
    val rk = roundKeys(java.util.Arrays.copyOf(key, 16))
    val pad = 16 - data.length % 16
    val in = java.util.Arrays.copyOf(data, data.length + pad)
    java.util.Arrays.fill(in, data.length, in.length, pad.toByte)
    val out = new Array[Byte](in.length)
    val prev = java.util.Arrays.copyOf(iv, 16)
    var o = 0
    while (o < in.length) {
      for (i <- 0 until 16) prev(i) = (prev(i) ^ in(o + i)).toByte
      cryptBlock(rk, prev, 0, out, o)
      System.arraycopy(out, o, prev, 0, 16)
      o += 16
    }
    out
  }

  def sm4DecryptBytes(data: Array[Byte], key: Array[Byte],
      iv: Array[Byte]): Array[Byte] = {
    require(data.length % 16 == 0 && data.length > 0, "bad SM4 ciphertext")
    val rkRev = roundKeys(java.util.Arrays.copyOf(key, 16)).reverse
    val out = new Array[Byte](data.length)
    var prev = java.util.Arrays.copyOf(iv, 16)
    var o = 0
    while (o < data.length) {
      cryptBlock(rkRev, data, o, out, o)
      for (i <- 0 until 16) out(o + i) = (out(o + i) ^ prev(i)).toByte
      prev = java.util.Arrays.copyOfRange(data, o, o + 16)
      o += 16
    }
    val pad = out(out.length - 1) & 0xff
    require(pad >= 1 && pad <= 16, "bad PKCS7 padding")
    java.util.Arrays.copyOf(out, out.length - pad)
  }

  def sm4Encrypt(data: Column, key: Column, iv: Column): Column = {
    val f = udf((d: Array[Byte], k: Array[Byte], v: Array[Byte]) =>
      if (d == null || k == null || v == null) null
      else sm4EncryptBytes(d, k, v))
    f(data, key, iv)
  }

  def sm4Decrypt(data: Column, key: Column, iv: Column): Column = {
    val f = udf((d: Array[Byte], k: Array[Byte], v: Array[Byte]) =>
      if (d == null || k == null || v == null) null
      else sm4DecryptBytes(d, k, v))
    f(data, key, iv)
  }

  // ----------------------------------------------------------------- TOTP
  /** RFC 4648 base32 decode (sclfunc.c:2088 base32Decode). */
  def base32Decode(s: String): Array[Byte] = {
    val out = Array.newBuilder[Byte]
    var buffer = 0L
    var bits = 0
    var i = 0
    var done = false
    while (i < s.length && !done) {
      val c = s(i)
      val v =
        if (c >= 'a' && c <= 'z') c - 'a'
        else if (c >= 'A' && c <= 'Z') c - 'A'
        else if (c >= '2' && c <= '7') c - '2' + 26
        else if (c == '=') { done = true; -1 }
        else throw new IllegalArgumentException(s"bad base32 char: $c")
      if (v >= 0) {
        buffer = (buffer << 5) | v
        bits += 5
        if (bits >= 8) {
          out += ((buffer >> (bits - 8)) & 0xff).toByte
          bits -= 8
        }
      }
      i += 1
    }
    out.result()
  }

  /** RFC 6238 TOTP: 6-digit code for a base32 secret at `epochSec`,
    * 30-second steps, HMAC-SHA1. */
  def totpAt(secretBase32: String, epochSec: Long): String = {
    val key = base32Decode(secretBase32)
    val counter = epochSec / 30
    val msg = java.nio.ByteBuffer.allocate(8).putLong(counter).array()
    val mac = javax.crypto.Mac.getInstance("HmacSHA1")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA1"))
    val h = mac.doFinal(msg)
    val off = h(h.length - 1) & 0x0f
    val bin = ((h(off) & 0x7f) << 24) | ((h(off + 1) & 0xff) << 16) |
      ((h(off + 2) & 0xff) << 8) | (h(off + 3) & 0xff)
    f"${bin % 1000000}%06d"
  }

  /** Column form with an explicit time column (deterministic; the
    * reference's generate_totp_code uses wall-clock now). */
  def totpCode(secretBase32: Column, epochSec: Column): Column = {
    val f = udf((s: String, t: java.lang.Long) =>
      if (s == null || t == null) null else totpAt(s, t))
    f(secretBase32, epochSec)
  }
}
