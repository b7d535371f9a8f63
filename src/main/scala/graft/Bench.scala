package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen spin-up + parquet footer reads
    Seq("lineitem", "orders", "events", "documents", "embeddings")
      .foreach(t => Tables(spark, sfDir, t).count())
    // Frozen per-query floor (BENCH_FLOOR.json — the last honest bench,
    // flat name→seconds map): any query >1.5x its floor (and >1s, to
    // skip timer noise) is surfaced as `regressed` in the bench artifact
    // itself, so a cache-feeding or plan regression is visible without
    // diffing rounds.
    val floor: Map[String, Double] = {
      val p = Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_FLOOR", "BENCH_FLOOR.json"))
      if (!Files.exists(p)) Map.empty
      else "\"([^\"]+)\"\\s*:\\s*([0-9.]+)".r
        .findAllMatchIn(new String(Files.readAllBytes(p),
          StandardCharsets.UTF_8))
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
    // host-load sentinel: a fixed cheap query timed before AND after the
    // run. When either reading exceeds ~1.5x its pinned floor the host
    // was contended, so the artifact stamps environment_suspect and the
    // `regressed` list self-qualifies — driver-host noise produced false
    // regression lists three rounds running (r10-r12), each needing
    // manual adjudication against quiet local runs.
    val sentinelName = "q1_agg"
    def timeSentinel(): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(sentinelName)(spark, sfDir)
        .queryExecution.toRdd.count()
      catch { case _: Throwable => }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    // one untimed sentinel run first: the timed "first" reading must
    // measure host load, not JVM/codegen cold-start (which is ~5-10x the
    // steady state and would stamp every run suspect)
    timeSentinel()
    val sentinelFirst = timeSentinel()
    // interleaved sentinel samples: the bracketing first/last pair
    // provably misses mid-run host bursts (PERFNOTES r13; the r20
    // driver artifact and r20 runs 3/4 all carried time-localized
    // bursts inside quiet brackets) — re-time the sentinel every
    // `sentinelEvery` queries so the artifact records WHEN the host
    // was contended, not just whether it was at the ends
    val sentinelEvery = 50
    val sentinelMid = scala.collection.mutable.ArrayBuffer[Double]()
    // local-iteration filter (driver never sets it → full run)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // sorted name order: Map iteration order shifts whenever a query is
    // added, silently moving GC/cache debt between neighbours across
    // rounds and faking per-query regressions — pin the order
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (nm, _) => only.forall(_.contains(nm)) }
    // a crashing query must surface as an error + nonzero exit — a
    // swallowed failure would record a near-zero timing and make the
    // bench look FASTER than a working build
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def timeQuery(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        recordError: Boolean): Double = {
      val t0 = System.nanoTime()
      // materialize the FULL result (toRdd.count keeps every output
      // column alive; df.count() would let Spark prune the payload of
      // projection-only queries and under-measure them)
      try { fn(spark, sfDir).queryExecution.toRdd.count() }
      catch { case e: Throwable => if (recordError)
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          .replaceAll("\\s+", " ").take(160) }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop intermediates a query persisted: cached blocks from one
      // query must not pressure (or feed) the next query's timing.
      // clearCache covers catalog-tracked plans; the blocking unpersist
      // sweep covers operator-internal persists (GlobalScan's sorted
      // frame, dedup candidate sets, the pipeline hub) and guarantees
      // the blocks are GONE before the next timer starts — clearCache
      // alone releases them asynchronously, leaking BlockManager
      // pressure into whichever query runs next
      spark.catalog.clearCache()
      // exercise the keyless ops' retained-copy contract on the hot
      // path (the unpersist sweep below would also catch the blocks,
      // but release() is the API long-lived sessions must call)
      graft.ops.GlobalScan.release()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      // and drain the GC debt the query accumulated — otherwise heavy
      // queries tax whichever query happens to RUN NEXT in map order,
      // which shows up as multi-second phantom "regressions" on
      // untouched sub-second queries
      System.gc()
      dt
    }
    val results = selected.zipWithIndex.map { case ((name, fn), i) =>
      if (i > 0 && i % sentinelEvery == 0) sentinelMid += timeSentinel()
      name -> timeQuery(name, fn, recordError = true)
    }
    val sentinelLast = timeSentinel()
    val sentinelFloor = floor.getOrElse(sentinelName, 0.0)
    // 1.25x, tightened from 1.5x after r16: a run whose sentinel sat at
    // 1.32-1.42x its floor (clearly contended — quiet runs reproduce
    // none of its regressions) still passed the old bar, so the
    // artifact claimed a clean environment while flagging phantom >2x
    // regressions. Either reading above 1.25x now stamps the run.
    val environmentSuspect = sentinelFloor > 0 &&
      ((sentinelMid :+ sentinelFirst :+ sentinelLast).max
        > sentinelFloor * 1.25)
    // flag only when BOTH the ratio and the absolute excess are real:
    // sub-second floors otherwise flag on scheduler blips
    def overFloor(name: String, dt: Double): Boolean =
      floor.get(name).exists(f => dt > f * 1.5 && dt - f > 1.0)
    val firstFlags = results.collect {
      case (name, dt) if overFloor(name, dt) => name
    }.toSeq.sorted
    // self-adjudication: every first-pass flag gets an automatic SECOND
    // reading at suite end (same methodology, warm JVM — exactly what
    // the manual two-quiet-run clearance protocol re-measures). A query
    // stays `regressed` only when BOTH readings exceed the bar; the
    // second readings are published in `retimed` so a driver artifact
    // carries its own clearance evidence instead of deferring every
    // flag to next round's quiet-run protocol (r10-r12, r16, r19, r20
    // all burned a round-trip on flags a second reading would have
    // cleared). Mid-run host bursts — the dominant false-flag source on
    // this host — don't survive the re-read; a real plan regression
    // does.
    val byName = selected.toMap
    val retimed = firstFlags.map { name =>
      name -> timeQuery(name, byName(name), recordError = false)
    }
    val regressed = retimed.collect {
      case (name, dt2) if overFloor(name, dt2) => name
    }.sorted
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    def render(rs: Seq[(String, Double)], omitted: Int): String = {
      val qs = rs.map { case (k, v) =>
        "\"" + k + "\":" + BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP) }
        .mkString("{", ",", "}")
      val total = BigDecimal(results.map(_._2).sum)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP)
      val omit = if (omitted > 0) s""","queries_omitted":$omitted""" else ""
      val errs = if (errors.isEmpty) "" else errors
        .map { case (k, v) => jstr(k) + ":" + jstr(v) }
        .mkString(""","errors":{""", ",", "}")
      def s3(v: Double) =
        BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
      val regr = if (floor.isEmpty) ""
        else regressed.map(jstr).mkString(""","regressed":[""", ",", "]") +
          retimed.map { case (k, v) => jstr(k) + ":" + s3(v) }
            .mkString(""","retimed":{""", ",", "}")
      val sent = s""","sentinel":{"query":${jstr(sentinelName)},"first":${
        s3(sentinelFirst)},"mid":${
        sentinelMid.map(s3).mkString("[", ",", "]")},"last":${
        s3(sentinelLast)},"floor":${
        s3(sentinelFloor)}},"environment_suspect":$environmentSuspect"""
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$omit$errs$regr$sent,"sf":"$sfDir"}"""
    }
    // The harness keeps only the LAST 2000 chars of stdout, and sbt
    // appends a ~75-char "[success] Total time" footer after our line —
    // so the printed JSON must fit in ~1880 chars or its FRONT gets cut
    // and json.load fails (r01-r04 all recorded parsed:null this way).
    // Print the slowest queries that fit; persist the complete map to a
    // file for the full per-query record.
    val full = render(results.toSeq, 0)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    Files.write(Paths.get(out), full.getBytes(StandardCharsets.UTF_8))
    val budget = 1750
    val printable =
      if (full.length <= budget) full
      else {
        val bySlow = results.toSeq.sortBy(-_._2)
        // binary-free walk: take slowest-first until the rendered line
        // would exceed the budget
        var keep = Vector.empty[(String, Double)]
        var line = render(keep, results.size)
        for (r <- bySlow) {
          val trial = render(keep :+ r, results.size - keep.size - 1)
          if (trial.length <= budget) { keep = keep :+ r; line = trial }
        }
        line
      }
    println(printable)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
