package graft.operators

/** Minimal open-addressing Long hash set: linear probing,
  * power-of-two capacity, load factor 1/2, zero boxing. 0 is held in
  * a sideband flag so the key array can use 0 as the empty sentinel.
  * Built for executor/driver-side exact-distinct merges (q10's
  * one-stage form) where `java.util.HashSet[java.lang.Long]` boxing
  * and node churn dominate the actual hashing. */
final class LongOpenSet(initCap: Int = 16) extends Serializable {
  private[this] var cap =
    math.max(16, Integer.highestOneBit(math.max(1, initCap - 1)) << 1)
  private[this] var mask = cap - 1
  private[this] var keys = new Array[Long](cap)
  private[this] var n = 0
  private[this] var hasZero = false

  @inline private[this] def slot(k: Long): Int = {
    // 64-bit mix (splitmix64 finalizer) so sequential keys spread
    var h = k
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^= h >>> 31
    var i = (h & mask).toInt
    while (keys(i) != 0L && keys(i) != k) i = (i + 1) & mask
    i
  }

  def contains(k: Long): Boolean =
    if (k == 0L) hasZero else keys(slot(k)) == k

  def add(k: Long): Unit =
    if (k == 0L) hasZero = true
    else {
      val i = slot(k)
      if (keys(i) == 0L) {
        keys(i) = k
        n += 1
        if (n * 2 > cap) grow()
      }
    }

  private[this] def grow(): Unit = {
    val old = keys
    cap <<= 1
    mask = cap - 1
    keys = new Array[Long](cap)
    var i = 0
    while (i < old.length) {
      val k = old(i)
      if (k != 0L) keys(slot(k)) = k
      i += 1
    }
  }

  /** Count of distinct keys added (including 0 if seen). */
  def size: Long = n.toLong + (if (hasZero) 1L else 0L)

  /** The distinct keys, packed (order unspecified). */
  def toArray: Array[Long] = {
    val out = new Array[Long](size.toInt)
    var j = 0
    if (hasZero) { out(0) = 0L; j = 1 }
    var i = 0
    while (i < keys.length) {
      if (keys(i) != 0L) { out(j) = keys(i); j += 1 }
      i += 1
    }
    out
  }
}

/** Minimal open-addressing Long → Int hash map: linear probing,
  * power-of-two capacity, load factor 1/2, zero boxing — the map
  * sibling of [[LongOpenSet]] (same splitmix64 probe, same
  * 0-key sideband). Built for aggregate buffers that need id →
  * array-slot indexing (best-wins dedup in the threshold-top-k
  * retention buffer) without `java.util.HashMap[Long, Int]` boxing
  * on the per-candidate-row path. */
final class LongIntOpenMap(initCap: Int = 16) extends Serializable {
  private[this] var cap =
    math.max(16, Integer.highestOneBit(math.max(1, initCap - 1)) << 1)
  private[this] var mask = cap - 1
  private[this] var keys = new Array[Long](cap)
  private[this] var vals = new Array[Int](cap)
  private[this] var n = 0
  private[this] var hasZero = false
  private[this] var zeroVal = 0

  @inline private[this] def slot(k: Long): Int = {
    var h = k
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^= h >>> 31
    var i = (h & mask).toInt
    while (keys(i) != 0L && keys(i) != k) i = (i + 1) & mask
    i
  }

  def contains(k: Long): Boolean =
    if (k == 0L) hasZero else keys(slot(k)) == k

  /** The value for `k`, or -1 if absent (values must be ≥ 0 —
    * they are array indices everywhere this map is used). */
  def getOrNeg(k: Long): Int =
    if (k == 0L) { if (hasZero) zeroVal else -1 }
    else {
      val i = slot(k)
      if (keys(i) == k) vals(i) else -1
    }

  def put(k: Long, v: Int): Unit =
    if (k == 0L) { hasZero = true; zeroVal = v }
    else {
      val i = slot(k)
      if (keys(i) == 0L) {
        keys(i) = k; vals(i) = v
        n += 1
        if (n * 2 > cap) grow()
      } else vals(i) = v
    }

  private[this] def grow(): Unit = {
    val oldK = keys
    val oldV = vals
    cap <<= 1
    mask = cap - 1
    keys = new Array[Long](cap)
    vals = new Array[Int](cap)
    var i = 0
    while (i < oldK.length) {
      val k = oldK(i)
      if (k != 0L) {
        val s = slot(k)
        keys(s) = k; vals(s) = oldV(i)
      }
      i += 1
    }
  }

  def size: Long = n.toLong + (if (hasZero) 1L else 0L)
}
