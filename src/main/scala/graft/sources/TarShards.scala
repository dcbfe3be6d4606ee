package graft.sources

import java.io.{BufferedOutputStream, OutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shard packing and scanning.
  *
  * Large-scale training corpora ship as directories of POSIX-ustar `.tar`
  * shards whose members are named `<key>.<ext>` — consecutive members
  * sharing a key form one multi-component sample (text + label, image +
  * caption, …). The reference pipeline only reads per-record formats
  * (extractor.py:41-70: CSV/JSON/parquet); this module adds the sharded
  * archive layout a 100 TB corpus actually uses, with a pure-JVM ustar
  * codec (no external tar library exists in this environment, and none is
  * needed — ustar is a fixed 512-byte-block format).
  *
  * Scale design:
  *  - [[pack]] writes ONE tar per shard key, streaming: members arrive
  *    through `flatMapSortedGroups`' spill-backed sorted iterator, so task
  *    memory is O(1 member) regardless of shard size, and the bytes go
  *    straight to a Hadoop `FileSystem` stream — `file://` here, `s3a://`
  *    or `hdfs://` unchanged on a cluster. One shuffle (by shard key),
  *    then sequential appends: exactly the minimum data movement a
  *    sharded export permits. Writes are idempotent (`create(path,
  *    overwrite=true)`), so task retries and speculative attempts are
  *    safe: the last complete attempt wins with identical bytes (member
  *    order inside a shard is the sort order, not arrival order).
  *  - [[readMembers]] scans `binaryFile` rows (one per shard, parallel
  *    across shards) and parses members lazily off the archive buffer.
  *    Shards should be sized like parquet row groups (hundreds of MB —
  *    well under the 2 GB `binaryFile` ceiling): at 100 TB that is
  *    ~200k shards, each a one-task unit of scan parallelism.
  */
object TarShards {

  /** One member destined for shard `shard` under member name `name`. */
  final case class Member(shard: Int, name: String, bytes: Array[Byte])

  /** One parsed member read back from a shard. */
  final case class ShardMember(shard_file: String, name: String, content: Array[Byte])

  private val Block = 512

  /** Pure ustar codec: fixed 512-byte header blocks, octal ASCII numeric
    * fields, data padded to the block size, archive terminated by two
    * zero blocks. Layout per POSIX.1-1988 (public format spec; same
    * offsets GNU/BSD tar write).
    */
  object TarCodec {

    private def putAscii(h: Array[Byte], off: Int, s: String): Unit = {
      val b = s.getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(b, 0, h, off, b.length)
    }

    /** Leading-zero octal, (len-1) digits + NUL — the strict common form. */
    private def putOctal(h: Array[Byte], off: Int, len: Int, v: Long): Unit = {
      require(v >= 0, s"octal field cannot encode $v")
      val s = java.lang.Long.toOctalString(v)
      require(s.length <= len - 1, s"value $v overflows $len-byte octal field")
      putAscii(h, off, ("0" * (len - 1 - s.length)) + s)
    }

    def header(name: String, size: Long): Array[Byte] = {
      val nameBytes = name.getBytes(StandardCharsets.US_ASCII)
      require(nameBytes.length <= 100, s"ustar member name > 100 bytes: $name")
      require(new String(nameBytes, StandardCharsets.US_ASCII) == name,
        s"ustar member name must be ASCII: $name")
      val h = new Array[Byte](Block)
      System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
      putOctal(h, 100, 8, 420)        // mode 0644
      putOctal(h, 108, 8, 0)          // uid
      putOctal(h, 116, 8, 0)          // gid
      putOctal(h, 124, 12, size)
      putOctal(h, 136, 12, 0)         // mtime pinned to epoch: byte-determinism
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces while summing
      h(156) = '0'                    // typeflag: regular file
      putAscii(h, 257, "ustar")       // magic, NUL-terminated by the zero fill
      putAscii(h, 263, "00")          // version
      var sum = 0L
      var i = 0
      while (i < Block) { sum += (h(i) & 0xff); i += 1 }
      putOctal(h, 148, 7, sum)        // 6 digits …
      h(154) = 0                      // … + NUL …
      h(155) = ' '                    // … + space: "dddddd\0 ", the form GNU/BSD tar emit
      h
    }

    def writeMember(out: OutputStream, name: String, bytes: Array[Byte]): Unit = {
      out.write(header(name, bytes.length.toLong))
      out.write(bytes)
      val pad = (Block - bytes.length % Block) % Block
      if (pad > 0) out.write(new Array[Byte](pad))
    }

    /** Two zero blocks terminate the archive. */
    def writeTrailer(out: OutputStream): Unit = out.write(new Array[Byte](2 * Block))

    /** Header-only scan of an existing archive: `(n_members,
      * payload_bytes)` by reading each 512-byte header and SKIPPING the
      * data blocks — O(members) reads, no payload I/O. Used by the
      * resume path to reconstruct manifest rows for shards it skips.
      */
    def scanStats(in: java.io.InputStream): (Long, Long) = {
      val h = new Array[Byte](Block)
      var n = 0L
      var payload = 0L
      var done = false
      while (!done) {
        var got = 0
        while (got < Block) {
          val r = in.read(h, got, Block - got)
          if (r < 0) { require(got == 0, "truncated header"); done = true; got = Block }
          else got += r
        }
        if (!done && h.forall(_ == 0)) done = true
        else if (!done) {
          val size = parseOctal(h, 124, 12, "size")
          val tf = h(156)
          if (tf == '0' || tf == 0) { n += 1; payload += size }
          var toSkip = (size + Block - 1) / Block * Block
          while (toSkip > 0) {
            val s = in.skip(toSkip)
            if (s > 0) toSkip -= s
            else {
              // skip() may legitimately return 0 mid-stream (buffer
              // boundary on some Hadoop FS streams) — only a read() of
              // -1 proves truncation
              require(in.read() >= 0, "truncated member data")
              toSkip -= 1
            }
          }
        }
      }
      (n, payload)
    }

    private def isZeroBlock(a: Array[Byte], off: Int): Boolean = {
      var i = off
      val end = off + Block
      while (i < end) { if (a(i) != 0) return false; i += 1 }
      true
    }

    private def parseOctal(a: Array[Byte], off: Int, len: Int, what: String): Long = {
      var v = 0L
      var seen = false
      var i = off
      val end = off + len
      while (i < end) {
        val c = a(i) & 0xff
        if (c >= '0' && c <= '7') { v = (v << 3) | (c - '0'); seen = true }
        else if (c != 0 && c != ' ')
          throw new IllegalArgumentException(s"bad octal byte $c in $what at $i")
        i += 1
      }
      require(seen, s"empty octal field: $what")
      v
    }

    /** Strict lazy parse: verifies magic + checksum per header, yields
      * regular-file members, skips other member types (dirs, links) over
      * their data, stops at the zero-block trailer.
      */
    def parse(archive: Array[Byte]): Iterator[(String, Array[Byte])] =
      new Iterator[(String, Array[Byte])] {
        private var off = 0
        private var nextMember: (String, Array[Byte]) = null
        private var done = false
        // GNU 'L' long-name entry: its DATA names the NEXT member
        private var pendingLongName: String = null

        private def asciiUntilNul(from: Int, max: Int): String = {
          var end = from
          while (end < from + max && archive(end) != 0) end += 1
          new String(archive, from, end - from, StandardCharsets.US_ASCII)
        }

        private def advance(): Unit = {
          while (nextMember == null && !done) {
            if (off + Block > archive.length) {
              // A well-formed archive ends with the trailer, but padding
              // to a larger blocking factor is legal; a *partial* block
              // of nonzero bytes is corruption.
              require(off >= archive.length, s"truncated header block at $off")
              done = true
            } else if (isZeroBlock(archive, off)) {
              done = true // trailer: everything after must be zero padding
              var i = off + Block
              while (i + Block <= archive.length) {
                require(isZeroBlock(archive, i), s"nonzero block after trailer at $i")
                i += Block
              }
            } else {
              val magic = new String(archive, off + 257, 5, StandardCharsets.US_ASCII)
              require(magic == "ustar", s"bad ustar magic at $off: $magic")
              val stored = parseOctal(archive, off + 148, 8, "chksum")
              var sum = 0L
              var i = off
              while (i < off + Block) { sum += (archive(i) & 0xff); i += 1 }
              var j = off + 148 // chksum field counts as spaces
              while (j < off + 156) { sum += ' ' - (archive(j) & 0xff); j += 1 }
              require(sum == stored, s"checksum mismatch at $off: $sum != $stored")
              // Foreign-archive name forms (this writer emits neither,
              // but readMembers scans ANY *.tar): the ustar `prefix`
              // field (offset 345) carries the directory part of >100-
              // byte paths, and a GNU 'L' entry carries the next
              // member's full name as data.
              val base = asciiUntilNul(off, 100)
              val prefix = asciiUntilNul(off + 345, 155)
              val name =
                if (pendingLongName != null) pendingLongName
                else if (prefix.nonEmpty) s"$prefix/$base"
                else base
              val size = parseOctal(archive, off + 124, 12, "size")
              require(size <= Int.MaxValue, s"member $name too large: $size")
              val tf = archive(off + 156)
              val dataOff = off + Block
              require(dataOff + size <= archive.length, s"truncated member $name")
              if (tf == 'L') {
                var end = dataOff + size.toInt
                while (end > dataOff && archive(end - 1) == 0) end -= 1
                pendingLongName =
                  new String(archive, dataOff, end - dataOff, StandardCharsets.US_ASCII)
              } else {
                if (tf == '0' || tf == 0) {
                  val data = java.util.Arrays.copyOfRange(
                    archive, dataOff, dataOff + size.toInt)
                  nextMember = (name, data)
                }
                pendingLongName = null
              }
              off = dataOff + ((size + Block - 1) / Block * Block).toInt
            }
          }
        }

        override def hasNext: Boolean = { advance(); nextMember != null }
        override def next(): (String, Array[Byte]) = {
          advance()
          if (nextMember == null) throw new NoSuchElementException
          val m = nextMember
          nextMember = null
          m
        }
      }
  }

  /** Pack members into one `shard-%05d.tar` per shard key under `outDir`
    * (any Hadoop-FS URI). Returns the manifest: `(shard, file,
    * n_members, member_bytes, resumed)` — payload bytes, excluding tar
    * framing. Deterministic: members are written in `name` order within
    * a shard.
    *
    * Commit protocol: each shard writes to `<file>.tmp` and RENAMES to
    * its final name only after the trailer — a crashed or preempted
    * task never leaves a half-written final file, and the rename is the
    * atomic commit marker on hdfs:// (on object stores it is
    * copy+delete, but the existence of the final name still marks a
    * COMPLETE shard — the property resume relies on). With
    * `resume = true`, a shard whose final file already exists is
    * skipped entirely: its manifest row is reconstructed from a
    * header-only scan (no payload I/O), which is what makes a restarted
    * 200k-shard export cost only the missing shards. Determinism makes
    * skipping sound: the same corpus always produces byte-identical
    * shards, so an existing complete file IS the correct output.
    */
  def pack(members: Dataset[Member], outDir: String, resume: Boolean = false): DataFrame = {
    val spark = members.sparkSession
    import spark.implicits._
    // The SESSION's Hadoop conf must reach the tasks (s3a credentials,
    // defaultFS, …) — `new Configuration()` inside a task would see only
    // classpath defaults and could resolve outDir against a DIFFERENT
    // filesystem than readMembers' session-conf reads.
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val packed = members
      .groupByKey(_.shard)
      .flatMapSortedGroups(col("name")) { (shard: Int, it: Iterator[Member]) =>
        val path = new org.apache.hadoop.fs.Path(outDir, f"shard-$shard%05d.tar")
        val fs = path.getFileSystem(hadoopConf.value)
        // Adopt a pre-existing final file as a prior commit — resume
        // (earlier run of this export) or retry safety (a prior attempt
        // of THIS task committed its rename and died before reporting;
        // failing would deterministically abort the job on every
        // retry) — but only after a member-count check: by determinism
        // a prior commit of this export has exactly this group's member
        // count, so a mismatch means the file is a STALE shard from a
        // DIFFERENT export left in a non-clean output directory (ADVICE
        // r11). Adopting it would ship a manifest row describing bytes
        // that are not this dataset's; fail loudly instead.
        def adopt(resumed: Boolean) = {
          val in = fs.open(path)
          val (n, payload) = try TarCodec.scanStats(in) finally in.close()
          var expected = 0L
          while (it.hasNext) { it.next(); expected += 1 }
          require(n == expected,
            s"$path already exists with $n members but this export's " +
              s"shard $shard has $expected — stale shard from a different " +
              "export in a non-clean output directory; delete it or " +
              "export into a clean directory")
          Iterator((shard, path.getName, n, payload, resumed))
        }
        if (resume && fs.exists(path)) {
          adopt(resumed = true)
        } else if (fs.exists(path)) {
          adopt(resumed = false)
        } else {
          // Attempt-unique tmp: concurrent attempts of the same task
          // (speculation, zombie retry) must not truncate each other's
          // in-progress stream and rename interleaved bytes to the
          // final name.
          val attempt = Option(org.apache.spark.TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          val tmp = new org.apache.hadoop.fs.Path(
            outDir, path.getName + s".tmp-$attempt")
          val out = new BufferedOutputStream(fs.create(tmp, true))
          var n = 0L
          var payload = 0L
          try {
            it.foreach { m =>
              TarCodec.writeMember(out, m.name, m.bytes)
              n += 1
              payload += m.bytes.length
            }
            TarCodec.writeTrailer(out)
          } finally out.close()
          // Commit = one rename, NEVER delete-then-rename: a delete of
          // the final name could destroy a racing attempt's committed
          // shard and die before its own rename, leaving the stage
          // "successful" with the shard missing.
          if (!fs.rename(tmp, path)) {
            // a racing attempt committed first: its output is
            // byte-identical by determinism — discard ours
            require(fs.exists(path), s"commit rename failed for $path")
            fs.delete(tmp, false): Unit
          }
          // Reap OTHER attempts' tmps. Safe post-commit: a still-running
          // zombie whose tmp vanishes fails its write or rename, lands
          // in the discard path (the final file exists), and its task
          // outcome no longer matters — the stage already has a winner.
          fs.globStatus(new org.apache.hadoop.fs.Path(
            outDir, path.getName + ".tmp-*"))
            .foreach(st => fs.delete(st.getPath, false))
          Iterator((shard, path.getName, n, payload, false))
        }
      }
    // Eager AND driver-held: a lazy manifest re-runs the packing stage
    // under any plan that samples its input (an ORDER BY's
    // range-boundary pass executes the stage TWICE, flipping `resumed`
    // on the second run), and an executor-block localCheckpoint of it
    // dies unrecoverably with a lost executor. One skinny row per shard
    // — collect once, rebuild locally.
    spark.createDataset(packed.collect().toSeq)
      .toDF("shard", "file", "n_members", "member_bytes", "resumed")
  }

  /** Scan every `*.tar` under `dir`: one row per regular-file member,
    * `(shard_file, name, content)`. Parallelism = number of shards.
    */
  def readMembers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .load(s"${dir.stripSuffix("/")}/*.tar")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val file = path.substring(path.lastIndexOf('/') + 1)
        TarCodec.parse(bytes).map { case (name, data) =>
          ShardMember(file, name, data)
        }
      }
      .toDF()
  }

  /** WebDataset sample grouping: members named `<key>.<ext>` fold into
    * one row per key with an `ext -> bytes` map. The group-by shuffles
    * only what a sample join must; component order inside the map is
    * ext-sorted for determinism. Members WITHOUT a `.ext` suffix are
    * outside the WebDataset naming contract and are dropped here (they
    * would all collapse onto key "" — regexp_extract yields "" on no
    * match — and then collide as duplicate map keys); [[readMembers]]
    * still yields them for callers that want raw members. A corpus that
    * repeats the same `<key>.<ext>` (within or across shards) fails
    * LOUDLY here via Spark's duplicate-map-key error — sample-component
    * names are the caller's uniqueness contract, and silently keeping
    * either copy would hide a corrupted export.
    */
  def samples(members: DataFrame): DataFrame =
    members
      .withColumn("key", regexp_extract(col("name"), "^(.*)\\.([^.]+)$", 1))
      .withColumn("ext", regexp_extract(col("name"), "^(.*)\\.([^.]+)$", 2))
      .where(length(col("ext")) > 0)
      .groupBy(col("key"))
      .agg(map_from_entries(array_sort(collect_list(struct(col("ext"), col("content")))))
        .as("components"))
}
