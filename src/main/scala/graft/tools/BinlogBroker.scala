package graft.tools

import java.nio.file.{Files, Paths}

import graft.streaming.binlog.BinlogServer

/** Standalone binlog-broker process for [[BinlogBench]]: loads a
  * pre-published log from per-partition text files (one JSON record per
  * line, `part-<p>.txt`) into a [[BinlogServer]] and serves it until the
  * parent kills the process. Running brokers OUT of the Spark JVM is the
  * production shape — broker and executors share a machine here, but not
  * a heap, GC, or JVM scheduler — and removes the in-JVM contention that
  * deflated the first binlog scaling measurement (fetch handlers
  * competing inside the executor JVM).
  *
  * SHARDING: with the optional `<index> <stride>` args this broker loads
  * (and therefore owns) only partitions `p` with `p % stride == index` —
  * the same owner rule the `cdc-binlog` source's `brokers` option routes
  * by — so a fleet of forked brokers splits the fetch fan-in the way a
  * Kafka cluster splits partition leadership across brokers. The server
  * still spans the full partition count; unowned partitions stay empty
  * and report zero marks, which the source's merged control-plane poll
  * masks out.
  *
  * Prints exactly one `BINLOG_READY port=<p> records=<n>` line when
  * serving; the parent waits for it.
  *
  * Run (normally only via BinlogBench): `graft.tools.BinlogBroker <dir>
  * <partitions> [<index> <stride>]`.
  */
object BinlogBroker {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(args(0))
    val parts = args(1).toInt
    val (index, stride) =
      if (args.length >= 4) (args(2).toInt, args(3).toInt) else (0, 1)
    val srv = new BinlogServer(parts)
    var total = 0L
    (0 until parts).filter(_ % stride == index).foreach { p =>
      val f = dir.resolve(s"part-$p.txt")
      if (Files.exists(f)) {
        val lines = Files.lines(f)
        try lines.forEach { line => srv.append(p, line); total += 1 }
        finally lines.close()
      }
    }
    // one machine-readable handshake line; the parent parses the port
    println(s"BINLOG_READY port=${srv.port} records=$total")
    System.out.flush()
    Thread.sleep(Long.MaxValue)
  }
}
