ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "realtimecryptomarketdatapipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver parses Bench's one-line JSON from stdout. With the default
// LoggedOutput strategy sbt prefixes every forked-process line with
// "[info] "/"[error] ", so no line is raw JSON and BENCH_r{N}.json gets
// parsed:null. StdoutOutput inherits the child's stdio directly.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and sbt's trailing "[success] Total time: ..." line would print AFTER
// the JSON, so a last-line parser on the driver side still fails. Suppress
// it so Bench's JSON is the final stdout line of the whole sbt invocation.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] = 32 concurrent tasks in ONE JVM: unified memory is
  // 0.6*heap, so 8g gave each task slot ~150 MB before spilling — the
  // JSON-heavy normalizer queries spilled and GC-thrashed (23-37 s in
  // BENCH_r01 vs ~4 s with room). 48g ≈ 0.9 GB/slot on a 125 GB box.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // 321 queries x (warmup+timed) generate thousands of Janino classes —
  // and r14 raises spark.sql.codegen.cache.maxEntries so they stay live;
  // default 240 MB JIT code cache can fill and silently disable the JIT.
  "-XX:ReservedCodeCacheSize=1g",
  // Long-lived session running many distinct generated plans: repeated
  // deopts at shared Spark methods hit HotSpot's recompilation cutoffs
  // (PerBytecodeRecompilationCutoff=200), after which the method runs
  // INTERPRETED forever - observed as sporadic 10-20x stage slowdowns
  // (a 2s-CPU scan stage re-running at 39s). Disable the give-up cutoffs.
  "-XX:PerMethodRecompilationCutoff=-1",
  "-XX:PerBytecodeRecompilationCutoff=-1",
  // HotSpot never JIT-compiles methods over 8000 bytecodes by default —
  // janino-generated whole-stage-codegen methods can cross that, and an
  // uncompilable hot method runs INTERPRETED FOREVER: the r7/r8 q135
  // investigation measured the same stage at 12s CPU in lucky rounds vs
  // 250-500s in unlucky ones (cpu≈wall, gc≈0 — the interpreter signature).
  // Letting C2 take huge methods cut the worst q135 sample 150s -> 18s.
  "-XX:-DontCompileHugeMethods",
)
// Dev profiling hook: GRAFT_EXTRA_JVM="-Xlog:gc:file=/tmp/gc.log" sbt ...
javaOptions ++= sys.env.get("GRAFT_EXTRA_JVM").toSeq.flatMap(_.split("\\s+"))
