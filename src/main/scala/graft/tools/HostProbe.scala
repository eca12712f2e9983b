package graft.tools

/** 3-second host-citability check: runs the bench's three calibration legs
  * (single-thread ALU, memory-streaming, multi-core fan-out) without a
  * SparkSession and prints them with a verdict against the BASELINE.md
  * idle bands. Run BEFORE any bench whose absolute numbers will be cited —
  * the round-5 incident showed the two single-thread legs clean while
  * co-tenant CPU steal slowed every 32-thread row 2.5-4×; the par leg is
  * the one that catches that mode.
  *
  * Usage: runMain graft.tools.HostProbe [threads=32] [reps=3]
  */
object HostProbe {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else 32
    val reps = if (args.length > 1) args(1).toInt else 3
    (1 to reps).foreach { r =>
      val alu = graft.Bench.calibrate()
      val mem = graft.Bench.calibrateMem()
      val par = graft.Bench.calibratePar(threads)
      val verdict =
        if (alu > 0.45 || mem > 0.45) "CONTENDED(single-thread)"
        else if (par > 0.5) "CONTENDED(core-steal)"
        else "idle-band"
      println(f"rep $r: alu $alu%.3f s  mem $mem%.3f s  par[$threads] $par%.3f s  -> $verdict")
    }
  }
}
