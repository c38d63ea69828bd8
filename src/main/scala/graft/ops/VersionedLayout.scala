package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-versioned parquet layout — the table-format primitive (the
  * public Delta/Iceberg idea, reduced to its core) that closes the gap the
  * at-rest layouts here document: `ZOrder.compact` swaps directories with
  * delete+rename and notes "a brief unavailability window a production
  * deployment would close with a table format's atomic manifest". This is
  * that manifest.
  *
  * Layout on disk:
  * {{{
  *   path/data/<uuid>/part-*.parquet     -- immutable data file sets
  *   path/_manifests/v00000001.manifest  -- newline list of data dirs
  * }}}
  * Every commit writes its data files FIRST, then publishes one new
  * manifest file naming the complete file-set of that version — a single
  * create is the commit point, so readers either see the old version or
  * the new one, never a half-written mix. Old manifests stay readable
  * (time travel: `read(spark, path, version = Some(n))`) until [[vacuum]]
  * drops data unreferenced by the latest version.
  *
  * At 100 TB this is the difference between "appends and compactions are
  * safe while queries run" and "hope nobody scans during the rename":
  * [[compact]] rewrites N small file sets into one and publishes the swap
  * as a manifest commit; concurrent readers pinned to version n keep a
  * consistent snapshot because data files are never mutated in place.
  * Manifests list directories (one per committed write), so the manifest
  * itself stays tiny — O(commits since vacuum), not O(files).
  *
  * MULTI-WRITER coordination is CAS-on-the-manifest: every commit writes
  * a uniquely-named tmp file and publishes it with a rename that REFUSES
  * an existing destination (`FileContext` + `Rename.NONE` — atomic
  * no-overwrite rename on HDFS), then on collision re-reads the new
  * latest version and retries with a freshly derived file list. Appends
  * ([[commit]]) always converge — each retry simply re-bases on the
  * winner's manifest. Snapshot REWRITES ([[compact]], [[deleteWhere]])
  * retry by carrying forward any file sets appended since their
  * snapshot; if the race removed one of the file sets they rewrote
  * (a concurrent compact/delete), they refuse with
  * `ConcurrentModificationException` rather than resurrect or drop data.
  * [[upsert]] reads the whole table, so ANY racing commit invalidates it
  * — it refuses on collision (re-run against the new version).
  * Object-store caveat: stores without an exclusive rename/create (plain
  * S3) shrink the commit point to an exists-check+rename window; a
  * production deployment there closes it with a conditional-put (ETag /
  * If-None-Match) manifest write — same protocol, store-native CAS.
  */
object VersionedLayout {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(path: String) = new Path(s"$path/_manifests")

  private def manifestPath(path: String, v: Int) =
    new Path(manifestDir(path), f"v$v%08d.manifest")

  /** All committed versions, ascending (empty for a fresh path). */
  def versions(spark: SparkSession, path: String): Seq[Int] = {
    val f = fs(spark, path)
    val dir = manifestDir(path)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.matches("v\\d{8}\\.manifest") =>
        n.substring(1, 9).toInt }
      .sorted.toSeq
  }

  private def readManifest(spark: SparkSession, path: String, v: Int): Seq[String] = {
    val f = fs(spark, path)
    val in = f.open(manifestPath(path, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Attempt to publish `dirs` as version `v`. Write-then-rename keeps
    * the commit point a single metadata op even on stores where partial
    * writes are visible; the tmp name is UNIQUE per attempt (two racing
    * writers can never cross-contaminate tmp content) and the rename
    * REFUSES an existing destination, so exactly one writer wins a
    * version. Returns false on loss — the CAS failure the commit loop
    * re-bases and retries on.
    */
  private def tryPublish(spark: SparkSession, path: String, v: Int,
      dirs: Seq[String]): Boolean = {
    val f = fs(spark, path)
    f.mkdirs(manifestDir(path))
    val target = f.makeQualified(manifestPath(path, v))
    if (f.exists(target)) return false // cheap fast-path, not the guard
    val tmp = f.makeQualified(new Path(manifestDir(path),
      f"v$v%08d.${java.util.UUID.randomUUID().toString}.tmp"))
    val out = f.create(tmp, true)
    try out.write((dirs.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    // FileContext rename defaults to Rename.NONE: fail-if-exists — atomic
    // on HDFS; on local/object stores the residual exists-check+rename
    // window is the documented caveat (conditional put closes it)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      f.getUri, spark.sparkContext.hadoopConfiguration)
    try { fc.rename(tmp, target); true }
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        f.delete(tmp, false); false
    }
  }

  /** CAS commit loop: per attempt, derive the new version's file list
    * from the CURRENT latest manifest via `transform` and try the
    * exclusive publish; on collision, re-read and re-derive (a racing
    * writer's commit is never dropped). `transform` returns None to
    * refuse — the current base conflicts with the snapshot the caller's
    * data rewrite was computed against.
    */
  private def publishTransform(spark: SparkSession, path: String,
      maxAttempts: Int = 16)(transform: Seq[String] => Option[Seq[String]]): Int = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val vs = versions(spark, path)
      val base = if (vs.isEmpty) Seq.empty[String]
        else readManifest(spark, path, vs.last)
      val v = vs.lastOption.getOrElse(0) + 1
      transform(base) match {
        case None => throw new java.util.ConcurrentModificationException(
          s"commit under $path conflicts with a concurrent rewrite of the " +
            "file sets this operation read — re-run against the new version")
        case Some(dirs) => if (tryPublish(spark, path, v, dirs)) return v
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"commit: lost the version race $maxAttempts times under $path")
  }

  /** Commit `df` as a new version: latest version's file sets plus this
    * write's (`overwrite = true` starts the file list fresh — the data of
    * older versions stays on disk for time travel). Returns the committed
    * version number.
    */
  def commit(df: DataFrame, path: String, overwrite: Boolean = false): Int = {
    val spark = df.sparkSession
    val dataDir = s"$path/data/${java.util.UUID.randomUUID().toString}"
    df.write.parquet(dataDir)
    // append re-bases freely on a racing winner's manifest; overwrite's
    // list is snapshot-independent by definition (replace everything)
    publishTransform(spark, path) { base =>
      Some(if (overwrite) Seq(dataDir) else base :+ dataDir)
    }
  }

  /** Read a version (default: latest). The version's file-set union as one
    * DataFrame — all files immutable, so the snapshot is consistent no
    * matter what commits land during the scan.
    */
  def read(spark: SparkSession, path: String,
      version: Option[Int] = None): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"read: no committed versions under $path")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"read: version $v not in $vs")
    val dirs = readManifest(spark, path, v)
    spark.read.parquet(dirs: _*)
  }

  /** Rewrite the latest version's file sets into one (optionally sorted —
    * pass a Z-order or timestamp column to restore clustering) and commit
    * the swap as a new version: readers mid-scan keep their snapshot, the
    * next read sees one compact file set. The rewritten data is a NEW
    * file set — [[vacuum]] reclaims the old ones.
    */
  def compact(spark: SparkSession, path: String,
      sortCol: Option[String] = None,
      numPartitions: Option[Int] = None): Int = {
    // pin the snapshot ONCE: the dirs actually rewritten below must be
    // exactly the dirs the CAS transform subtracts from the final base
    val vs0 = versions(spark, path)
    require(vs0.nonEmpty, s"compact: no committed versions under $path")
    val snapDirs = readManifest(spark, path, vs0.last).toSet
    val cur = spark.read.parquet(snapDirs.toSeq: _*)
    val parted = (sortCol, numPartitions) match {
      case (Some(c), Some(n)) => cur.repartitionByRange(n, org.apache.spark.sql.functions.col(c))
        .sortWithinPartitions(c)
      case (Some(c), None) => cur.repartitionByRange(org.apache.spark.sql.functions.col(c))
        .sortWithinPartitions(c)
      case (None, Some(n)) => cur.repartition(n)
      case (None, None) => cur
    }
    val dataDir = s"$path/data/${java.util.UUID.randomUUID().toString}"
    parted.write.parquet(dataDir)
    // snapshot rewrite: carry forward file sets APPENDED since the
    // snapshot; refuse if a racing rewrite removed one we compacted
    // (resurrecting its rows would un-delete data)
    publishTransform(spark, path) { base =>
      if (snapDirs.forall(base.contains)) // base is the snapshot + appends
        Some(dataDir +: base.filterNot(snapDirs.contains))
      else None
    }
  }

  /** Copy-on-write MERGE (upsert): rows of `df` replace same-key rows of
    * the latest version, new keys append; committed as one new version,
    * so readers see either the old table or the merged one. This is the
    * honest small-table form — it rewrites the whole survivor set.
    * Production MERGE at 100 TB prunes the rewrite to the files whose key
    * ranges the update touches (pair the layout with the Bloom/zone
    * sidecars to find them); the commit protocol — and therefore reader
    * safety — is identical, so this is the semantics gate for that
    * optimization, not a rival to it.
    */
  def upsert(df: DataFrame, path: String, keyCol: String): Int = {
    val spark = df.sparkSession
    val vs0 = versions(spark, path)
    require(vs0.nonEmpty, s"upsert: no committed versions under $path")
    val snapDirs = readManifest(spark, path, vs0.last)
    val cur = spark.read.parquet(snapDirs: _*)
    require(cur.columns.contains(keyCol) && df.columns.contains(keyCol),
      s"upsert: key column '$keyCol' must exist on both sides")
    val merged = cur.join(df.select(keyCol).distinct(), Seq(keyCol), "left_anti")
      .unionByName(df)
    val dataDir = s"$path/data/${java.util.UUID.randomUUID().toString}"
    merged.write.parquet(dataDir)
    // the merge read the WHOLE table, so any racing commit invalidates
    // it — publish only onto the exact snapshot, refuse otherwise
    publishTransform(spark, path) { base =>
      if (base == snapDirs) Some(Seq(dataDir)) else None
    }
  }

  /** Surgical copy-on-write DELETE — the right-to-be-forgotten primitive:
    * remove rows matching `predicate`, committed as ONE new version that
    * rewrites ONLY the file sets containing matches. One scan finds the
    * touched sets (the driver holds the matching file paths —
    * O(files-with-matches) metadata, the same class a table format's
    * planner holds); untouched file sets carry forward into the new
    * manifest VERBATIM, so a delete touching 1 of 1000 commits rewrites
    * ~0.1% of the data. SQL DELETE semantics: only predicate-TRUE rows
    * go — NULL-predicate rows stay. Survivors of the touched sets land
    * in one new file set; if nothing survives it is omitted. A predicate
    * matching nothing still commits (an auditable no-op version).
    * Returns the committed version.
    */
  def deleteWhere(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column): Int = {
    import org.apache.spark.sql.functions.{coalesce, input_file_name, lit, not}
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"deleteWhere: no committed versions under $path")
    val dirs = readManifest(spark, path, vs.last)
    // file-set dirs are data/<uuid>, so the parent NAME identifies the set
    val touched = spark.read.parquet(dirs: _*)
      .filter(predicate)
      .select(input_file_name().as("__f")).distinct()
      .collect().map(r => new Path(new java.net.URI(r.getString(0)).getPath)
        .getParent.getName).toSet
    val (hit, kept) = dirs.partition(d => touched.contains(new Path(d).getName))
    val rewritten: Seq[String] =
      if (hit.isEmpty) Seq.empty
      else {
        val dataDir = s"$path/data/${java.util.UUID.randomUUID().toString}"
        spark.read.parquet(hit: _*)
          .filter(not(coalesce(predicate, lit(false))))
          .write.parquet(dataDir)
        val f = fs(spark, path)
        val hasRows = f.listStatus(new Path(dataDir))
          .exists(_.getPath.getName.startsWith("part-"))
        if (hasRows) Seq(dataDir) else { f.delete(new Path(dataDir), true); Seq.empty }
      }
    // snapshot rewrite (Delta-style snapshot isolation): file sets
    // appended since the snapshot carry forward untouched — the delete
    // applied to the version it read; a racing REWRITE of a set we
    // processed refuses instead of resurrecting or double-dropping rows
    val snapDirs = dirs.toSet
    publishTransform(spark, path) { base =>
      if (snapDirs.forall(base.contains))
        Some((kept ++ rewritten) ++ base.filterNot(snapDirs.contains))
      else None
    }
  }

  /** [[read]] with parquet schema merging across the version's file sets
    * — SCHEMA EVOLUTION: a commit may add columns; older file sets fill
    * them with NULL. Additive evolution only (parquet mergeSchema
    * semantics: same-name columns must keep compatible types).
    */
  def readMerged(spark: SparkSession, path: String,
      version: Option[Int] = None): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"readMerged: no committed versions under $path")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"readMerged: version $v not in $vs")
    val dirs = readManifest(spark, path, v)
    spark.read.option("mergeSchema", "true").parquet(dirs: _*)
  }

  /** Row-level CHANGES between two versions (CDC read): `added` rows are
    * in `v2` but not `v1`, `removed` the reverse — multiset semantics via
    * exceptAll, tagged in one frame. Both sides are manifest snapshots,
    * so the diff is reproducible forever (until vacuum).
    * Output: v2-schema columns + `change` ('added' / 'removed').
    */
  def diff(spark: SparkSession, path: String, v1: Int, v2: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val a = read(spark, path, Some(v1))
    val b = read(spark, path, Some(v2))
    b.exceptAll(a).withColumn("change", lit("added"))
      .unionByName(a.exceptAll(b).withColumn("change", lit("removed")))
  }

  /** FILE-LEVEL CDC between two versions: rows of the file sets the two
    * manifests DISAGREE on, tagged 'added' (in v2's manifest only) or
    * 'removed' (in v1's only). NET-multiset-equivalent to [[diff]] —
    * a rewritten set's survivors appear on both sides and cancel — but
    * the scan cost is O(changed file sets), not O(table): an append or
    * [[deleteWhere]] commit shares every untouched set between the two
    * manifests, so only the delta is read. Whole-table rewrites
    * ([[upsert]], [[compact]]) start the file list fresh and honestly
    * degrade to a full read. This is what makes incremental consumers
    * ([[maintainAgg]]) scale: refresh cost follows the commit's size.
    */
  def fileDiff(spark: SparkSession, path: String, v1: Int, v2: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val vs = versions(spark, path)
    require(vs.contains(v1) && vs.contains(v2),
      s"fileDiff: versions ($v1, $v2) must both be in $vs")
    val m1 = readManifest(spark, path, v1).toSet
    val m2 = readManifest(spark, path, v2).toSet
    val empty = read(spark, path, Some(v2)).limit(0)
    def side(dirs: Seq[String], tag: String) =
      (if (dirs.nonEmpty) spark.read.parquet(dirs: _*) else empty)
        .withColumn("change", lit(tag))
    side((m2 -- m1).toSeq, "added")
      .unionByName(side((m1 -- m2).toSeq, "removed"))
  }

  /** Per-key (count, exact-decimal sum) snapshot in [[maintainAgg]]'s
    * summary schema — the initial materialized view.
    */
  def aggSnapshot(df: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(38,6)")).as("sum6"))
  }

  /** INCREMENTAL AGGREGATE MAINTENANCE (materialized-view refresh): fold
    * one version-to-version delta (from [[fileDiff]] or [[diff]]) into a
    * per-key (count, sum) summary — n' = n + Σ±1, sum' = sum ± value —
    * and drop keys whose count reaches 0. Counts are exact longs and the
    * sums exact decimals, so add/remove pairs cancel EXACTLY (a rewritten
    * file set's surviving rows contribute +v and −v that annihilate
    * bit-for-bit), making the refreshed summary equal to a from-scratch
    * [[aggSnapshot]] of the new version — the IVM invariant, pinned in
    * VersionedLayoutSpec.
    *
    * Shape at scale: ONE keyed aggregation over the delta (map-side
    * partials carry per-key partial counts/sums) plus a key-equi full
    * outer join against the summary — the table itself is never
    * rescanned. Refresh cost = O(delta) + O(summary keys).
    */
  def maintainAgg(summary: DataFrame, delta: DataFrame,
      keyCols: Seq[String], valueCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val sign = when(col("change") === "added", 1L).otherwise(-1L)
    val dAgg = delta.groupBy(keyCols.map(col): _*)
      .agg(sum(sign).as("__dn"),
        sum((col(valueCol) * sign).cast("decimal(38,6)")).as("__dsum"))
    summary.join(dAgg, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n"),
        (coalesce(col("sum6"), lit(java.math.BigDecimal.ZERO).cast("decimal(38,6)")) +
          coalesce(col("__dsum"), lit(java.math.BigDecimal.ZERO).cast("decimal(38,6)")))
          .cast("decimal(38,6)").as("sum6")): _*)
      .filter(col("n") > 0)
  }

  /** Drop every data dir not referenced by the LATEST manifest and every
    * older manifest — ends time travel, reclaims space. The latest
    * version is untouched.
    */
  def vacuum(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"vacuum: no committed versions under $path")
    val live = readManifest(spark, path, vs.last).map(new Path(_).getName).toSet
    val dataRoot = new Path(s"$path/data")
    if (f.exists(dataRoot))
      f.listStatus(dataRoot).foreach { st =>
        if (!live.contains(st.getPath.getName)) f.delete(st.getPath, true)
      }
    vs.init.foreach(v => f.delete(manifestPath(path, v), false))
  }
}
