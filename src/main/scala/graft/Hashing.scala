package graft

import java.security.MessageDigest

/** Driver-side MD5 helpers shared by the ingest CLI, the multimodal
  * decode stub and the fixture-building queries — one definition so a
  * change to the hex width or digest can't drift between call sites.
  * (Distributed hashing stays on `functions.md5` — these are for
  * KB-scale driver metadata: batch tags, scratch-dir names, stub
  * feature derivation.)
  */
object Hashing {

  def md5hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  def md5hex(s: String): String = md5hex(s.getBytes("UTF-8"))
}
