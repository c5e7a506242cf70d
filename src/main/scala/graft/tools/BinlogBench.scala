package graft.tools

import java.nio.file.{Files, Paths}

import graft.engine.{CdcEngine, EngineConf}
import graft.icelite.IceliteTable
import graft.streaming.CdcStream
import graft.streaming.binlog.BinlogServer
import graft.synth.Synth

/** Network-ingest twin of [[ScalingBench]]: the same two-parallelism-level
  * protocol, but the events arrive through the `cdc-binlog` TCP source
  * (fetch → base64 decode → `from_json` parse → MERGE) instead of parquet
  * replay — i.e. the full CDC INGEST path a production tail exercises, with
  * Structured Streaming's offset checkpointing and admission control in the
  * loop. Events are published once to an in-process [[BinlogServer]]; both
  * levels tail the SAME offsets (the ranges are replayable by contract, each
  * level under its own checkpoint), so the input is byte-identical.
  *
  * Run: sbt "runMain graft.tools.BinlogBench [nEvents] [nBatches] [out.md]"
  * Defaults: 2,000,000 events, 8 micro-batches (admission-controlled),
  * BENCH.md appended. SPARK_GRAFT_LEVELS / SPARK_GRAFT_TRIALS as in
  * ScalingBench.
  */
object BinlogBench {

  private val PARTS = 16 // log partitions = max fetch concurrency

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val k = args.lift(1).map(_.toInt).getOrElse(8)
    val outMd = args.lift(2).getOrElse("BENCH.md")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "2").toInt
    val levelCores = sys.env.getOrElse("SPARK_GRAFT_LEVELS", "4,16")
      .split(",").map(_.trim.toInt).toSeq
    val work = ScalingBench.workRoot()

    // Publish ONCE (deterministic, seed=42): producer-side partitioning by
    // key hash, exactly what a CDC producer does. The publish is driver-side
    // and excluded from all timings. A small seed=7 log warms codegen.
    // The logs are written as per-partition text files and served by
    // BROKERS FORKED INTO THEIR OWN JVMs (graft.tools.BinlogBroker) — the
    // production shape, and it takes the broker's fetch handlers out of
    // the executor JVM whose in-heap contention deflated the first
    // measurement of this bench. SPARK_GRAFT_BROKER_INPROC=1 restores the
    // old single-JVM mode for comparison.
    val inproc = sys.env.get("SPARK_GRAFT_BROKER_INPROC").contains("1")
    locally {
      val s = ScalingBench.session(32, s"$work/tmp-gen")
      import org.apache.spark.sql.functions.{col, hash, lit, pmod, struct, to_json}
      def publish(dir: String, events: org.apache.spark.sql.DataFrame): Unit = {
        val d = Paths.get(dir); Files.createDirectories(d)
        val writers = (0 until PARTS).map(p => Files.newBufferedWriter(
          d.resolve(s"part-$p.txt"))).toArray
        val it = events.select(
            (pmod(hash(col("repo"), col("path")), lit(PARTS))).as("p"),
            to_json(struct(events.columns.map(col): _*)).as("j"))
          .orderBy(col("p"), col("j")) // deterministic publish order
          .toLocalIterator()
        while (it.hasNext) {
          val r = it.next()
          val w = writers(r.getInt(0)); w.write(r.getString(1)); w.newLine()
        }
        writers.foreach(_.close())
      }
      publish(s"$work/log-main", Synth.events(s, n, seed = 42, repos = 200,
        pathsPerRepo = 2000, hotPct = 30, parts = 64))
      publish(s"$work/log-warm", Synth.events(s, 50000, seed = 7, repos = 200,
        pathsPerRepo = 2000, hotPct = 30, parts = 16))
      s.stop()
    }

    /** Fork ONE broker JVM serving partitions p % stride == index. */
    def forkBroker(dir: String, index: Int, stride: Int): (String, Process) = {
      val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
      val pb = new ProcessBuilder(javaBin, "-Xmx3g", "-cp",
        System.getProperty("java.class.path"),
        "graft.tools.BinlogBroker", dir, PARTS.toString, index.toString,
        stride.toString)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val rd = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      var port = -1
      var line = rd.readLine()
      while (line != null && port < 0) {
        if (line.startsWith("BINLOG_READY")) {
          port = line.split(" ").find(_.startsWith("port="))
            .flatMap(_.drop(5).toIntOption).getOrElse(-1)
          println(s"  forked broker $index/$stride: $line (pid ${proc.pid()})")
        }
        if (port < 0) line = rd.readLine() // always advance: a malformed
        // READY line must fall through to the require, not spin here
      }
      require(port > 0, "forked broker failed to report a port")
      // drain the child's stdout so a full pipe can never block it
      val drain = new Thread(() => {
        try { while (rd.readLine() != null) () } catch { case _: Exception => () }
      })
      drain.setDaemon(true); drain.start()
      (s"127.0.0.1:$port", proc)
    }

    /** Serve a published log: a SHARDED forked-JVM broker fleet (default,
      * the production topology — partition leadership split across broker
      * processes) or one in-process server for comparison. Returns the
      * source's `brokers` option string, the broker pids (CPU accounting),
      * and a stop thunk. */
    val shards = sys.env.getOrElse("SPARK_GRAFT_BROKERS", "4").toInt
    def broker(dir: String, nShards: Int): (String, Seq[Long], () => Unit) =
      if (inproc) {
        val srv = new BinlogServer(PARTS)
        (0 until PARTS).foreach { p =>
          val f = Paths.get(dir).resolve(s"part-$p.txt")
          val lines = Files.lines(f)
          try lines.forEach(srv.append(p, _)) finally lines.close()
        }
        (s"${srv.address}:${srv.port}", Nil, () => srv.stop())
      } else {
        val fleet = (0 until nShards).map(i => forkBroker(dir, i, nShards))
        (fleet.map(_._1).mkString(","), fleet.map(_._2.pid()),
          () => fleet.foreach(_._2.destroyForcibly()))
      }
    val (srvBrokers, brokerPids, stopMain) = broker(s"$work/log-main", shards)
    val (warmBrokers, _, stopWarm) = broker(s"$work/log-warm", 1)

    /** Cumulative CPU seconds of a process from /proc/<pid>/stat
      * (utime+stime, USER_HZ=100) — the per-JVM accounting that separates
      * broker-side CPU from executor-side CPU in each timed leg. */
    def procCpuSec(pid: Long): Double =
      try {
        val stat = Files.readString(Paths.get(s"/proc/$pid/stat"))
        val rest = stat.substring(stat.lastIndexOf(')') + 2).split(" ")
        (rest(11).toLong + rest(12).toLong) / 100.0
      } catch { case _: Exception => 0.0 }
    def selfCpuSec(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        .getProcessCpuTime / 1e9

    // machine ceiling at the same pair (see ScalingBench.calibrate)
    ScalingBench.calibrate(levelCores.last) // warm the JIT
    val calib = levelCores.map(c => c -> ScalingBench.calibrate(c)).toMap
    val ceiling = (calib(levelCores.head) / calib(levelCores.last)) /
      (levelCores.last.toDouble / levelCores.head)
    println(f"  machine pure-CPU ceiling ${levelCores.head}->${levelCores.last}: " +
      f"efficiency $ceiling%.2f")

    val perTrigger = (n + k - 1) / k // admission control -> ~k micro-batches

    def ingest(spark: org.apache.spark.sql.SparkSession, brokers: String,
        tableDir: String, ckpt: String, maxPerTrigger: Long): Double = {
      val table = IceliteTable.create(tableDir, Seq("repo", "path"), buckets = 64)
      val engine = new CdcEngine(spark, table, EngineConf(buckets = 64))
      val t0 = System.nanoTime()
      CdcStream.runBinlogAvailableNowBrokers(spark, engine, brokers,
        ckpt, maxRecordsPerTrigger = maxPerTrigger)
      (System.nanoTime() - t0) / 1e9
    }

    // per-level CPU attribution of the best trial:
    // (spark-JVM cpu s, broker-fleet cpu s, wall s)
    val cpuAccounting = scala.collection.mutable.Map.empty[Int, (Double, Double, Double)]
    val levels = levelCores.map { cores =>
      val s = ScalingBench.session(cores, s"$work/tmp-$cores")
      ingest(s, warmBrokers, s"$work/warm-$cores", s"$work/warmckpt-$cores", 50000)
      val secs = (1 to trials).map { t =>
        val (cpu0, bk0) = (selfCpuSec(), brokerPids.map(procCpuSec).sum)
        val sec = ingest(s, srvBrokers, s"$work/table-$cores-$t",
          s"$work/ckpt-$cores-$t", perTrigger)
        val (sparkCpu, brokerCpu) =
          (selfCpuSec() - cpu0, brokerPids.map(procCpuSec).sum - bk0)
        println(f"  local[$cores] trial $t: $sec%.1fs " +
          f"(spark-jvm cpu $sparkCpu%.1fs, broker fleet cpu $brokerCpu%.1fs)")
        if (!cpuAccounting.contains(cores) || sec < cpuAccounting(cores)._3)
          cpuAccounting(cores) = (sparkCpu, brokerCpu, sec)
        sec
      }.min
      s.stop()
      ScalingBench.Level(cores, secs, n / secs)
    }
    val small = levels.head; val big = levels.last
    val speedup = small.seconds / big.seconds
    val eff = speedup / (big.cores.toDouble / small.cores)
    def acct(cores: Int): String = cpuAccounting.get(cores).map { case (sc, bc, w) =>
      f""","cpu_spark_${cores}":$sc%.1f,"cpu_broker_${cores}":$bc%.1f"""
    }.getOrElse("")
    val json =
      s"""{"metric":"binlog_ingest_scaling","events":$n,"batches":$k,"partitions":$PARTS,""" +
        s""""broker_shards":${if (inproc) 0 else shards},""" +
        levels.map(l => s""""local${l.cores}_sec":${f"${l.seconds}%.2f"},"local${l.cores}_eps":${f"${l.eventsPerSec}%.0f"}""").mkString(",") +
        s""","speedup":${f"$speedup%.3f"},"efficiency":${f"$eff%.3f"},"machine_ceiling":${f"$ceiling%.3f"}""" +
        levelCores.map(acct).mkString +
        s""","broker":"${if (inproc) "inproc" else "forked-jvm-fleet"}"}"""
    println(json)
    // joined with "\n|": the template below runs through stripMargin, which
    // would otherwise strip each table row's leading pipe as a margin char
    val acctRows = levelCores.flatMap(c => cpuAccounting.get(c).map { case (sc, bc, w) =>
      f"| local[$c] | $w%.1f | $sc%.1f | $bc%.1f | ${(sc + bc) / w}%.1f |"
    }).mkString("\n|")
    val md =
      s"""
         |## Binlog (network) ingest scaling — measured ${java.time.LocalDate.now()}
         |
         |Same deterministic event stream (seed=42, ${n / 1000000.0}M events, 30% hot-repo
         |skew) published once to a $PARTS-partition TCP binlog, served by
         |${if (inproc) "one IN-PROCESS server (comparison mode)"
            else s"$shards forked-JVM brokers (partition leadership split p % $shards — the Kafka topology)"},
         |then tailed through the `cdc-binlog` DSv2 source (batched-frame socket
         |fetch → base64 block decode → `from_json` → MERGE, ~$k admission-controlled
         |micro-batches, checkpointed offsets) into a fresh icelite table at two
         |parallelism levels. Unlike the parquet-replay ScalingBench this times the
         |full NETWORK ingest path.
         |
         || level | wall s | events/sec |
         ||---|---|---|
         || local[${small.cores}] | ${f"${small.seconds}%.1f"} | ${f"${small.eventsPerSec}%,.0f"} |
         || local[${big.cores}] | ${f"${big.seconds}%.1f"} | ${f"${big.eventsPerSec}%,.0f"} |
         |
         |Speedup ${f"$speedup%.2f"}x over a ${big.cores / small.cores}x core increase ⇒
         |**scaling efficiency ${f"$eff%.2f"}** (machine ceiling ${f"$ceiling%.2f"}).
         |
         |Per-JVM CPU attribution of each best trial (utime+stime from /proc):
         |
         || level | wall s | spark-JVM cpu s | broker-fleet cpu s | cpu demand (cores) |
         ||---|---|---|---|---|
         |$acctRows
         |
         |The broker fleet shares the MACHINE's cores with the executors (one
         |sandbox host) — its cpu column is capacity a production deployment
         |moves to separate broker machines, so the efficiency above remains a
         |lower bound on the dedicated-hardware number.
         |""".stripMargin
    Files.writeString(Paths.get(outMd), md,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    stopMain(); stopWarm()
    ScalingBench.deleteRecursivelyPublic(Paths.get(work))
  }
}
