package graft

/** Shared fork-a-pinned-measurement-JVM machinery for Bench and the
  * scale probes: taskset pinning + ActiveProcessorCount so the child's
  * GC/JIT/pool sizing matches a dedicated N-core executor node, heap
  * scaled at 2 GB/core (N vs 4N executors means 4× aggregate memory). */
object BenchFork {

  /** Fork an isolated, core-pinned child JVM running `mainClass args...`
    * and return its merged stdout+stderr. */
  def fork(mainClass: String, cpus: Int, args: Seq[String],
           heapGb: Int = 0, gc: String = "Parallel",
           extraJvm: Seq[String] = Nil): String = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    // pin to the TOP cpus cores: OS interrupt handling and the (mostly
    // pipe-blocked, unpinned) parent JVM concentrate on the low cores, and
    // that noise taxes a 2-core arm 4× harder per core than an 8-core arm
    // — inflating the measured low-arm time and with it the efficiency
    // ratio. Top-pinning removes the shared-core bias from both arms; a
    // full-machine (32-core) child necessarily still includes core 0.
    val total = Runtime.getRuntime.availableProcessors
    val pin =
      if (new java.io.File("/usr/bin/taskset").exists())
        Seq("/usr/bin/taskset", "-c", s"${math.max(0, total - cpus)}-${total - 1}")
      else Seq.empty
    val heap = if (heapGb > 0) heapGb else 2 * cpus
    val cmd = pin ++ Seq(javaBin) ++ addOpens ++ Seq(
      s"-Xmx${heap}g", s"-XX:+Use${gc}GC", s"-XX:ActiveProcessorCount=$cpus") ++
      extraJvm ++ Seq(
      "-cp", System.getProperty("java.class.path"),
      mainClass) ++ args
    // merge stderr into the read pipe: the result-line regexes tolerate
    // the surrounding log noise, and an undrained stderr pipe (>64KB of
    // Spark warnings) would block the child and deadlock the bench
    val out = new StringBuilder
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var line = reader.readLine()
    while (line != null) { out.append(line).append('\n'); line = reader.readLine() }
    proc.waitFor()
    out.toString
  }

  def deleteRecursively(path: String): Unit = {
    import java.nio.file.{Files => F, Paths}
    val p = Paths.get(path)
    if (F.exists(p)) {
      import scala.jdk.CollectionConverters._
      F.walk(p).iterator().asScala.toSeq.reverse.foreach(F.deleteIfExists(_))
    }
  }
}
