package graft

/** Host-contention evidence for the bench artifacts (r11/r12 verdict
  * directive): every published timing window carries the system 1-minute
  * load average and this process's CPU-seconds-per-wall-second over the
  * window, so a contended measurement is identifiable FROM the committed
  * artifact instead of by after-the-fact re-running. Interpretation:
  * `load1` far above `cpu_x` means other processes were competing for
  * the cores during the window (the r12 case: q06 min 0.30 s with
  * σ 0.73 — σ/min 2.4 — inflated its 10× ratio from 2.4× to 10.85×).
  */
object HostEvidence {
  private val osBean = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean match {
    case b: com.sun.management.OperatingSystemMXBean => Some(b)
    case _ => None
  }

  /** System 1-minute load average (first /proc/loadavg field; falls back
    * to the JMX system load average off Linux).
    */
  def load1: Double = try {
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      .split("\\s+")(0).toDouble
  } catch {
    case _: Throwable =>
      osBean.map(_.getSystemLoadAverage).getOrElse(-1.0)
  }

  /** Cumulative CPU time consumed by THIS JVM, nanoseconds. */
  def procCpuNanos: Long = osBean.map(_.getProcessCpuTime).getOrElse(-1L)

  /** Measure a window: returns (wallSec, cpuX, load1max) where cpuX is
    * process CPU seconds per wall second (up to #cores in local mode)
    * and load1max the larger of the start/end load samples.
    */
  def window[A](body: => A): (A, Double, Double, Double) = {
    val l0 = load1
    val c0 = procCpuNanos
    val w0 = System.nanoTime()
    val out = body
    val wall = (System.nanoTime() - w0) / 1e9
    val cpuX =
      if (c0 >= 0 && wall > 0) (procCpuNanos - c0) / 1e9 / wall else -1.0
    (out, wall, cpuX, math.max(l0, load1))
  }
}
