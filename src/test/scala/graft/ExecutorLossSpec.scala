package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runs [[ExecutorLossProof]] — the real executor-kill test — in a FRESH
  * forked JVM. A SparkContext is JVM-global and this suite's JVM already
  * holds (or will hold) the shared `local[*]` context; `local-cluster` needs
  * its own. The proof itself: `exactSubstringPairs` in reliable-checkpoint
  * mode on a 2-executor multi-process cluster, one executor SIGKILLed
  * mid-query, result still exactly the planted-fixture count.
  */
class ExecutorLossSpec extends AnyFunSuite {
  test("reliable-mode exact-substring pipeline survives an executor SIGKILL mid-query") {
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx3g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.ExecutorLossProof")).toArray

    val pb = new ProcessBuilder(cmd: _*)
    // the in-JVM Workers launch executor JVMs through SPARK_HOME's command
    // builder, which needs the dist's scala suffix pinned (spark-class
    // normally exports it; nothing does for an embedded Worker — without it
    // every executor dies at launch with "Cannot find any build directories")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val outReader = new Thread {
      var out = new StringBuilder
      override def run(): Unit = {
        val br = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream))
        var line = br.readLine()
        while (line != null) { out.append(line).append('\n'); line = br.readLine() }
      }
    }
    outReader.start()
    val finished = proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) proc.destroyForcibly()
    outReader.join(5000)
    val out = outReader.out.toString
    assert(finished, s"proof JVM hung past 300 s; output tail:\n${out.takeRight(3000)}")
    assert(proc.exitValue() == 0 && out.contains("EXECUTOR_LOSS_PROOF PASS"),
      s"proof failed (exit ${proc.exitValue()}); output tail:\n${out.takeRight(3000)}")
    info(out.linesIterator.filter(_.startsWith("EXECUTOR_LOSS_PROOF")).mkString)
  }
}
