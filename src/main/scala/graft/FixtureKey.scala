package graft

/** Key for staged /tmp fixture directories derived from a dataset path.
  *
  * MD5 of the CANONICAL path (full 128-bit hex), not `String.hashCode`: a
  * 32-bit hash collision between two dataset paths would silently reuse the
  * other dataset's staged fixture (the `_SUCCESS`/`_STAGED` markers are
  * existence checks, not content checks). 128 bits makes an accidental
  * collision impossible in practice, and canonicalization keeps
  * `/root/testdata/sf0.01` and `/root/testdata/../testdata/sf0.01` on the
  * same fixture.
  */
private[graft] object FixtureKey {
  def apply(dir: String): String = {
    val canonical =
      try new java.io.File(dir).getCanonicalPath
      catch { case _: java.io.IOException => dir }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(canonical.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
  }
}
