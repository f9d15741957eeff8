package graft

/** Offline canonical assembler: reads the windows sidecar a bench
  * campaign left behind and assembles the per-query-min canonical WITHOUT
  * running another ~26-minute window — for when the campaign's windows
  * already contain sufficient per-query evidence but the last in-process
  * assembly attempt ran before the evidence was complete (or under an
  * older assembly rule). Measurement code identity is still enforced: all
  * windows must carry the SAME codeId/sf/work/query-set, and the tool
  * refuses mixed sidecars rather than guessing. On success it writes the
  * canonical artifact (same renderer as Bench — BenchCore.assembledJson),
  * embeds the refusal campaign, and clears both sidecars.
  *
  * Usage: runMain graft.BenchAssemble [detailsPath]
  *   detailsPath defaults to bench_details.json; sidecars are derived as
  *   <detailsPath>.windows.jsonl and <detailsPath>.refused.jsonl.
  */
object BenchAssemble {
  def main(args: Array[String]): Unit = {
    val detailsPath = args.headOption.getOrElse("bench_details.json")
    val windowsFile = new java.io.File(detailsPath + ".windows.jsonl")
    val refusedFile = new java.io.File(detailsPath + ".refused.jsonl")
    require(windowsFile.isFile, s"no windows sidecar at $windowsFile")
    def lines(f: java.io.File): Seq[String] =
      if (!f.isFile) Seq.empty
      else {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.getLines().toList finally src.close()
      }
    val windows = lines(windowsFile).flatMap(BenchCore.parseWindow)
    require(windows.nonEmpty, "windows sidecar parsed to zero records")
    val keys = windows.map(w => (w.codeId, w.sf, w.work)).distinct
    require(keys.size == 1,
      s"sidecar mixes ${keys.size} distinct (code, sf, work) identities; refusing to assemble")
    require(windows.head.codeId != "unknown", "windows carry codeId 'unknown'; refusing")
    // Full-surface windows carry the whole registry; targeted subset
    // windows carry fewer. The assembled canonical covers the UNION —
    // i.e. the registry, as long as at least one full window is present.
    val names = windows.flatMap(_.queries.map(_.name)).distinct.sorted
    BenchCore.assemble(windows, names) match {
      case None =>
        System.err.println(s"[assemble] insufficient evidence across ${windows.size} windows " +
          "(some query has neither a quiet window nor cross-window median agreement)")
        sys.exit(1)
      case Some(asm) =>
        val refusals = lines(refusedFile).flatMap(BenchCore.parseRefusal)
        val json = BenchCore.assembledJson(asm, windows.head.sf, basePasses = 3,
          windows.head.codeId, windows.map(_.noiseIndex), refusals)
        val w = new java.io.PrintWriter(detailsPath, "UTF-8")
        try w.println(json) finally w.close()
        if (refusedFile.isFile) refusedFile.delete(): Unit
        if (windowsFile.isFile) windowsFile.delete(): Unit
        val fallback = asm.queries.filterNot(_.quiet).map(_.name)
        System.err.println(f"[assemble] canonical assembled from ${asm.windows} windows: " +
          f"total ${asm.queries.map(_.median).sum}%.2f s; agreement-fallback queries: " +
          (if (fallback.isEmpty) "none" else fallback.mkString(", ")))
        println(json)
    }
  }
}
