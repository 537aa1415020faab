package graft.tools

object LogProbe {
  def main(args: Array[String]): Unit = {
    var h = 0L
    var i = 1
    var mismatches = 0L
    while (i <= 200000) {
      val v = i * 0.0012345 + 1e-6
      val bits = java.lang.Double.doubleToLongBits(math.log10(v))
      h = h * 6364136223846793005L + bits
      i += 1
    }
    println(s"PROBE_HASH=$h mism=$mismatches")
    // also pow(10, x/10) parity inputs
    var h2 = 0L
    i = -400
    while (i <= 400) {
      val x = i * 0.137
      h2 = h2 * 6364136223846793005L + java.lang.Double.doubleToLongBits(math.pow(10.0, x / 10.0))
      i += 1
    }
    println(s"PROBE_HASH2=$h2")
  }
}
