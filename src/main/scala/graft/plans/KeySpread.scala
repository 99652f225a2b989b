package graft.plans

/** Exactly-balanced shuffle keys for LOW-cardinality group-bys.
  *
  * Spark's hash partitioning sends group g to `murmur3(g) mod P`; with few
  * groups (e.g. 64 index shards into 16 shuffle partitions) the balls-in-
  * bins collisions leave some reducers with 2-3x the mean load — a pure
  * straggler tax on every wave. `preimages(n)` returns n ints x_0..x_{n-1}
  * with `murmur3_32(x_i, seed=42) ≡ i (mod 4096)` (the same hash function
  * and seed Catalyst's HashPartitioning applies to an int key), so keying a
  * groupByKey/repartition by `x_i` instead of `i` spreads the n groups
  * EXACTLY evenly across any power-of-two partition count ≤ 4096 — group i
  * lands in partition `i mod P`. For non-power-of-two P the spread degrades
  * to no worse than random hashing.
  *
  * This keeps the plan in Dataset land (Tungsten shuffle, AQE) — the
  * alternative, an RDD with a custom Partitioner, loses both.
  */
object KeySpread {

  val Mod = 4096

  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Int]]()

  /** The first n murmur3 preimages (deterministic; cached per n). */
  def preimages(n: Int): Array[Int] = {
    require(n >= 1 && n <= Mod, s"n must be in [1, $Mod], got $n")
    cache.computeIfAbsent(n, _ => compute(n))
  }

  private def compute(n: Int): Array[Int] = {
    val out = new Array[Int](n)
    val found = new Array[Boolean](n)
    var remaining = n
    var x = 0
    while (remaining > 0) {
      val h = math.floorMod(
        org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(x, 42), Mod)
      if (h < n && !found(h)) {
        found(h) = true
        out(h) = x
        remaining -= 1
      }
      x += 1
      require(x != 0, "exhausted int space hunting preimages") // unreachable
    }
    out
  }
}
