package graft.tools

import graft.sources.KvSnapshots

/** Measured evidence for MANIFEST scaling (round 18) — the planning
  * question a 100 TB table forces: the snapshot manifest is one text
  * line per committed file, and a million-file table's manifest is
  * ~10^8 bytes that the DRIVER parses at plan time. Two facts decide
  * whether that is a bottleneck:
  *
  *   1. what does ONE parse cost as the file count grows? The probe
  *      commits synthetic memberships of 10k / 100k / 1M files (with
  *      realistic key zone maps and per-column stats on every line)
  *      and times `membersWithStats` best-of-3 at each size — the
  *      slope says whether parsing stays linear in bytes and what
  *      the absolute cost is at the million-file mark.
  *
  *   2. how MANY parses does one query pay? Before the per-scan
  *      cache a single planned query parsed the same manifest ~5
  *      times (estimateStatistics, planInputPartitions, the
  *      row-level scan-file report, and the tombstone index's
  *      internal re-parse); KvScan.snapshotState now pins ONE parse
  *      (and one meta read, and one snapshot RESOLUTION — which also
  *      makes the query snapshot-consistent under concurrent
  *      commits). The probe reports the measured single-parse cost;
  *      the multiplicity is structural (see KvScan.snapshotState).
  *
  * Emits one JSON line to stdout and writes MANIFEST_SCALE_PROBE.json;
  * SCALE.md records the verdict and the regime beyond 1M files
  * (hierarchical manifest lists, the Iceberg split, as the documented
  * next step if a deployment outgrows single-file parse cost).
  *
  * Run: sbt "runMain graft.tools.ManifestScaleProbe"
  */
object ManifestScaleProbe {

  def main(args: Array[String]): Unit = {
    val sizes = sys.env.get("SPARK_GRAFT_MANIFEST_SIZES")
      .map(_.split(',').map(_.trim.toInt).toSeq)
      .getOrElse(Seq(10000, 100000, 1000000))

    val entries = sizes.map { n =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_manifest_$n").toString
      // realistic lines: bucketed name token, exact rows, key zone
      // map, and two per-column stat pairs — the widest shape the
      // format writes per file
      val stats = (0 until n).map { i =>
        KvSnapshots.KvFileStat(
          f"b${i % 64}%04d-part-$i%08d.jsonl", 1000L + (i % 7),
          Some(i * 1000L), Some(i * 1000L + 999L), keysKnown = true,
          colStats = Map(
            3 -> Some((s"${i * 10}", s"${i * 10 + 9}")),
            4 -> Some((s"v$i", s"v${i + 1}"))))
      }
      val v = KvSnapshots.commitWith(dir)(_ => stats)
      val manifestBytes = java.nio.file.Files.size(
        java.nio.file.Paths.get(dir, "_snapshots", f"v$v%05d.manifest"))
      val parseS = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val parsed = KvSnapshots.membersWithStats(dir, v)
        require(parsed.size == n, s"parsed ${parsed.size} of $n")
        (System.nanoTime() - t0) / 1e9
      }.min
      // the snapshot RESOLUTION (directory listing of _snapshots) —
      // the other per-scan metadata op the cache collapses to one
      val latestS = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        require(KvSnapshots.latest(dir).contains(v))
        (System.nanoTime() - t0) / 1e9
      }.min
      Map(
        "files" -> n,
        "manifest_bytes" -> manifestBytes,
        "parse_s" -> parseS,
        "latest_s" -> latestS,
        "mb_per_s" -> (manifestBytes / 1e6 / parseS))
    }

    def js(v: Any): String = v match {
      case s: String => "\"" + s + "\""
      case d: Double => f"$d%.4f"
      case m: Map[_, _] => m.map { case (k, x) =>
        s""""$k":${js(x)}""" }.mkString("{", ",", "}")
      case seq: Seq[_] => seq.map(js).mkString("[", ",", "]")
      case other => other.toString
    }
    val out = js(Map(
      "probe" -> "manifest_scale",
      "parses_per_query_uncached" -> 5,
      "parses_per_query_cached" -> 1,
      "entries" -> entries))
    println(out)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("MANIFEST_SCALE_PROBE.json"),
      (out + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
