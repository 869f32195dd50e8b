package graft

/** Cross-engine ratio loader: pairs Spark per-query minima with a DuckDB
  * timing recording made by scripts/time_oracle.py over the SAME parquet
  * layout and the same oracle SQL the correctness gate replays
  * (reference-parity headline: benchmark/src/main.rs:154-164,
  * report.rs:46-58 report engine/DuckDB per query).
  *
  * The recording embeds the data layout's fingerprint (the staging
  * marker content) so a recording taken on an older fixture generation
  * or a different layout is flagged `stale` instead of silently
  * producing apples-to-oranges ratios.
  */
object CrossEngine {

  /** Load `path` and compute spark/duckdb ratios for every query present
    * in both maps. Returns (shortJson, fullJson) or None when the
    * recording is absent/unreadable or shares no queries.
    *
    * @param expectedFingerprint the current layout's fingerprint; when
    *   the recording's `layout_fingerprint` is missing or different the
    *   artifact carries `"stale":true` (ratios still reported — a stale
    *   number plus a flag beats a vanished section).
    * @param nonAdjudicable queries whose Spark timing window carried
    *   host-degradation evidence (adjacent st-probe >1.3× the committed
    *   calibration and never re-timed on a clean window — r14 verdict
    *   task 2). Their per-query ratios are still printed, but geomean /
    *   median / bands are computed over the ADJUDICABLE subset only and
    *   the exclusions are named in the artifact: a loaded window must
    *   publish "n_excluded" instead of a 2× geomean swing.
    */
  def ratios(path: java.nio.file.Path, sparkMins: Map[String, Double],
      expectedFingerprint: Option[String],
      note: String,
      nonAdjudicable: Set[String] = Set.empty): Option[(String, String)] = try {
    if (!java.nio.file.Files.exists(path)) return None
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(java.nio.file.Files.readAllBytes(path))
    val t = root.get("times")
    val rsAll = sparkMins.toSeq.sortBy(_._1).flatMap { case (n, mn) =>
      Option(t.get(n)).map(_.asDouble).filter(d => d > 0 && mn > 0)
        .map(d => n -> mn / d)
    }
    if (rsAll.isEmpty) return None
    val excluded = rsAll.filter(r => nonAdjudicable.contains(r._1))
    // if EVERY shared query is excluded, publish the raw set (flagged):
    // an artifact with named caveats beats a vanished section
    val rs = if (excluded.size == rsAll.size) rsAll
      else rsAll.filterNot(r => nonAdjudicable.contains(r._1))
    def geomean(s: Seq[(String, Double)]): Double =
      math.exp(s.map(r => math.log(r._2)).sum / s.size)
    val geo = geomean(rs)
    val med = rs.map(_._2).sorted.apply(rs.size / 2)
    // the reference's per-query ★ bands (benchmark/src/main.rs:154-164):
    // <1.5x = 3 stars, <3x = 2, <5x = 1, else 0 — reported as counts so
    // the artifact is directly comparable to the reference's report form
    def band(r: Double): Int =
      if (r < 1.5) 3 else if (r < 3.0) 2 else if (r < 5.0) 1 else 0
    val bands = (0 to 3).map(b => b -> rs.count(r => band(r._2) == b)).toMap
    val bandsJson = f""""bands":{"3star":${bands(3)},"2star":${bands(2)},"1star":${bands(1)},"0star":${bands(0)}}"""
    val stale = expectedFingerprint.exists(fp =>
      Option(root.get("layout_fingerprint")).map(_.asText) != Some(fp))
    val staleJson = if (stale) ""","stale":true""" else ""
    val exclJson =
      if (excluded.isEmpty) ""
      else f""","n_excluded":${excluded.size},"geomean_raw":${geomean(rsAll)}%.2f,"non_adjudicable":${excluded.map("\"" + _._1 + "\"").mkString("[", ",", "]")}"""
    val qjson = rsAll.map { case (n, r) => "\"" + n + "\":" + f"$r%.2f" }
      .mkString("{", ",", "}")
    val full = f"""{"recorded_unix":${root.get("recorded_unix").asLong},""" +
      f""""duckdb_version":"${root.get("duckdb_version").asText}",""" +
      f""""n":${rs.size},"geomean":$geo%.2f,"median":$med%.2f,$bandsJson$staleJson$exclJson,""" +
      s""""note":"$note","queries":$qjson}"""
    val short = f"""{"n":${rs.size},"geomean":$geo%.2f,"median":$med%.2f,$bandsJson$staleJson${if (excluded.isEmpty) "" else s""","n_excluded":${excluded.size}"""}}"""
    Some((short, full))
  } catch {
    case e: Throwable =>
      System.err.println(s"[bench] cross-engine ratios from $path skipped: ${e.getMessage}")
      None
  }
}
