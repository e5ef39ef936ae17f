package graft.util

/** Shared deterministic hashing + Python-parity character classes. */
object Hashing {

  /** splitmix64 finalizer — stable across JVMs; the single definition used
    * by corpus generation, dedup sketching and LSH seeding.
    * (graft.expressions.SimHashImpl carries a private copy because codegen
    * must call a static method on a stable class name.)
    */
  def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  /** Python-`str.isspace()` / `(?U)\s` character test (Unicode White_Space):
    * Character.isWhitespace alone EXCLUDES U+00A0/U+2007/U+202F and U+0085,
    * which Python's \s and str.split() include — the NBSP parity watchpoint.
    */
  def isPyWhitespace(c: Char): Boolean =
    Character.isWhitespace(c) ||
      Character.getType(c) == Character.SPACE_SEPARATOR || c == 0x85.toChar
}
