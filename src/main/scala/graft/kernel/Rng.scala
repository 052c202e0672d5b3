package graft.kernel

/** SplitMix64 PRNG — deterministic, allocation-free, keyed per doc so any row is
  * reproducible in isolation (FIXTURES.md §4). Public algorithm (Steele et al.,
  * "Fast Splittable Pseudorandom Number Generators", OOPSLA'14).
  */
final class SplitMix64(seed: Long) {
  private var state: Long = seed

  def nextLong(): Long = {
    state += 0x9e3779b97f4a7c15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform in [0, bound). */
  def nextInt(bound: Int): Int = (((nextLong() >>> 1) % bound.toLong)).toInt

  /** Uniform in [0, 1). */
  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
}

object SplitMix64 {
  /** FNV-1a 64-bit over a string, used to key the PRNG by doc_id/media_ref. */
  def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def forKey(seed: Long, key: String): SplitMix64 = new SplitMix64(seed ^ fnv1a(key))
}
