package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{Constraints, FileManifest, History}

/** Model-based fuzz of the manifest lake's row lifecycle: a seeded
  * random sequence of append / deleteWhere / mergeInto / clusterBy /
  * vacuum ops runs against both the real lake and an in-memory model,
  * and the pinned image must equal the model after EVERY op — the
  * composition coverage (delete after cluster after merge after
  * append …) that targeted specs can't enumerate.
  *
  * Keyed mode adds the bloom-key-index lifecycle to the mix
  * (deleteKeys takedowns, index refreshes at random times) and
  * cross-checks a keyed point-lookup against the model after EVERY op
  * — the index is deliberately allowed to go stale between refreshes,
  * so this continuously exercises the "stale or absent index only
  * costs scan width, never rows" contract under composition.
  *
  * Tagged mode mixes snapshot-tag creates/releases into the sequence
  * and re-reads EVERY live pin after every op — a pinned image must
  * survive any composition of deletes, merges, clusters, and grace-0
  * vacuums bit-for-bit until its tag is released. */
class LakeLifecycleFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private type Model = scala.collection.mutable.Map[Long, (String, Long)]

  private def fs(lake: String) =
    new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def toDF(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("id", "part", "v")
  }

  /** Append + manifest-commit exactly the files this write landed —
    * retired files still on disk must not be re-added. */
  private def appendCommit(lake: String, rows: Seq[(Long, String, Long)]): Unit = {
    val f = fs(lake)
    val m = FileManifest.latest(f, lake).get
    val known = m.curSet ++ m.retiredSet
    toDF(rows).coalesce(1).write.mode("append")
      .partitionBy("part").parquet(lake)
    FileManifest.addFiles(f, lake,
      FileManifest.listLiveFiles(f, lake).filterNot(known))
  }

  private def img(lake: String, vCol: String = "v")
      : Map[Long, (String, Long)] = {
    import spark.implicits._
    History.readPinned(spark, lake).select("id", "part", vCol)
      .as[(Long, String, Long)].collect()
      .map { case (id, p, v) => id -> (p, v) }.toMap
  }

  private[graft] def runSequence(seed: Long, nOps: Int,
                          sharded: Boolean = false,
                          keyed: Boolean = false,
                          tagged: Boolean = false,
                          dv: Boolean = false,
                          constrained: Boolean = false,
                          dml: Boolean = false,
                          renames: Boolean = false): Unit = {
    if (dml) spark.conf.set("spark.sql.catalog.lake",
      classOf[graft.sources.LakeCatalog].getName)
    require(!(renames && (constrained || dml)),
      "renames mode composes with the engine ops (constraints would " +
        "reference the old name; the SQL rename surface has its own " +
        "spec + gate)")
    val rnd = new scala.util.Random(seed)
    val lake = java.nio.file.Files
      .createTempDirectory(s"graft-fuzz-$seed").toString + "/lake"
    val model: Model = scala.collection.mutable.Map.empty
    // renames mode: the value column's CURRENT declared name (rename
    // ops retire the old one); every validated write and predicate
    // below speaks the current name, while the raw-adopt append path
    // keeps writing the ORIGINAL physical name — deliberate
    // stale-writer coverage for the alias-chain read
    var vName = "v"
    var renSeq = 0
    // tombstone-adversary state (renames mode): the optional extra
    // nullable column the drop/re-add op cycles, every name ever
    // RETIRED (renamed away or dropped) — the resurrection attempts
    // below must bounce off each of them forever
    var wSeq = 0
    var wLive: Option[String] = None
    val retiredEver = scala.collection.mutable.ArrayBuffer.empty[String]
    def toLakeDF(rows: Seq[(Long, String, Long)]) = {
      val df0 = toDF(rows)
      val df = if (vName == "v") df0 else df0.withColumnRenamed("v", vName)
      // the keyed merge replaces WHOLE rows, so its updates frame must
      // carry the evolved extra column too (typed NULL — the same
      // image an engine caller mid-evolution would build); appends
      // tolerate narrower batches, where the extra column is harmless
      wLive.fold(df)(w => df.withColumn(w, lit(null).cast("long")))
    }
    // tag name -> (value-column name at pin time, the exact image
    // pinned at tag time); every live tag is re-read after EVERY op
    // (deletes, merges, clusters, grace-0 vacuums) and must still
    // equal its pin — under the pin-ERA column name: a pinned read
    // resolves the declaration AS OF the pinned commit, so a tag taken
    // before a rename keeps answering under the OLD name
    val tagModel = scala.collection.mutable.LinkedHashMap
      .empty[String, (String, Map[Long, (String, Long)])]
    var tagSeq = 0
    // ERA PINS (renames mode): (manifest version, value-column name at
    // commit, image at commit) for recently committed versions —
    // re-read while their roots stay retained, asserting the SNAPSHOT-
    // ERA schema resolution: the pin must answer under the name its
    // commit's schema stamp declares, whatever renames ran since
    val eraPins = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Map[Long, (String, Long)])]
    // manifest version -> the model image it published (tagged mode):
    // the restore op rolls the lake back to any RETAINED version and
    // the model must follow
    val history = scala.collection.mutable.Map
      .empty[Long, Map[Long, (String, Long)]]
    var nextId = 0L
    def freshRows(n: Int): Seq[(Long, String, Long)] =
      (0 until n).map { _ =>
        val r = (nextId, s"p${rnd.nextInt(3)}", rnd.nextLong(1000L))
        nextId += 1
        r
      }

    val init = freshRows(30)
    toDF(init).coalesce(2).write.partitionBy("part").parquet(lake)
    History.enableManifests(spark, lake): Unit
    if (sharded) History.enableShardedManifests(spark, lake): Unit
    if (keyed) History.refreshKeyIndex(spark, lake, "id"): Unit
    if (renames) History.declareSchema(spark, lake): Unit
    // constrained mode: a CHECK all generated rows satisfy, so every
    // checked append below flows through enforcement — plus periodic
    // violating appends that must bounce whole with no version flip
    if (constrained)
      Constraints.add(spark, lake, "v_nonneg", "v >= 0"): Unit
    init.foreach { case (id, p, v) => model(id) = (p, v) }
    // the last PRE-DECLARATION manifest version (era pins start after)
    val initV = FileManifest.latestVersion(fs(lake), lake).get
    assert(img(lake) === model.toMap, s"seed=$seed init")
    if (tagged)
      history(FileManifest.latestVersion(fs(lake), lake).get) = model.toMap

    // extra ops extend the base pick range; order keeps the keyed
    // tests' historical random streams intact (10=deleteKeys,
    // 11=refreshIndex as before)
    val extraOps = (if (keyed) Seq("deleteKeys", "refreshIndex") else Nil) ++
      (if (tagged) Seq("mkTag", "rmTag", "restore") else Nil) ++
      (if (dv) Seq("deleteKeysDV", "materializeDV", "overwritePart",
                   "regrain")
       else Nil) ++
      (if (constrained) Seq("appendChecked", "appendBad") else Nil) ++
      (if (dml) Seq("updateWhere", "updateMove", "sqlUpdate", "sqlDelete",
                    "sqlOverwrite", "sqlOverwritePart", "sqlMergeCdc",
                    "sqlMergeSync", "sqlDeleteInSub", "sqlMergePartial",
                    "sqlOverwriteDyn", "sqlDeleteExists", "sqlUpdateCorrIn",
                    "sqlMergeSyncUpd")
       else Nil) ++
      (if (renames) Seq("renameV", "dropReAdd", "renameOntoRetired")
       else Nil)
    for (op <- 0 until nOps) {
      val pick = rnd.nextInt(10 + extraOps.size)
      // name the op BEFORE it runs so an exception thrown INSIDE an
      // engine call still reports (seed, op#, op name) — without this
      // a deep-sweep crash surfaces as a bare analysis error with no
      // way to replay it
      val picked =
        if (pick < 10) s"base$pick" else extraOps(pick - 10)
      val desc: String = try pick match {
        case 0 | 1 => // append a fresh batch
          val rows = freshRows(1 + rnd.nextInt(8))
          appendCommit(lake, rows)
          rows.foreach { case (id, p, v) => model(id) = (p, v) }
          s"append ${rows.size}"
        case 2 | 3 => // predicate delete (sometimes matching nothing)
          rnd.nextInt(3) match {
            case 0 =>
              val k = 2 + rnd.nextInt(4); val r = rnd.nextInt(k)
              History.deleteWhere(spark, lake, col("id") % k === r): Unit
              model.filterInPlace { case (id, _) => id % k != r }
              s"delete id%$k==$r"
            case 1 =>
              val p = s"p${rnd.nextInt(4)}" // p3 never exists: no-op path
              History.deleteWhere(spark, lake, col("part") === p): Unit
              model.filterInPlace { case (_, (mp, _)) => mp != p }
              s"delete part==$p"
            case _ =>
              val x = rnd.nextLong(1000L)
              History.deleteWhere(spark, lake, col(vName) < x): Unit
              model.filterInPlace { case (_, (_, mv)) => mv >= x }
              s"delete $vName<$x"
          }
        case 4 | 5 | 6 => // keyed merge: updates on live ids + inserts
          val live = model.keys.toSeq.sorted
          val upd = rnd.shuffle(live).take(rnd.nextInt(5))
            .map { id =>
              // sometimes move the row to another partition
              val p = if (rnd.nextBoolean()) model(id)._1
                      else s"p${rnd.nextInt(3)}"
              (id, p, rnd.nextLong(1000L))
            }
          val ins = freshRows(rnd.nextInt(4))
          val batch = upd ++ ins
          if (batch.nonEmpty) {
            History.mergeInto(spark, lake, toLakeDF(batch), Seq("id")): Unit
            batch.foreach { case (id, p, v) => model(id) = (p, v) }
          }
          s"merge ${upd.size}u+${ins.size}i"
        case 7 | 8 => // cluster rewrite: contents must not change
          History.clusterBy(spark, lake, "id", 1 + rnd.nextInt(4)): Unit
          "cluster"
        case 9 => // reclaim everything reclaimable
          History.vacuum(spark, lake, graceMs = 0L): Unit
          "vacuum"
        case n => extraOps(n - 10) match {
          case "deleteKeys" => // keyed takedown: live victims + one absent
            val live = rnd.shuffle(model.keys.toSeq.sorted)
              .take(rnd.nextInt(4))
            val victims = live :+ (nextId + 555L)
            History.deleteKeys(spark, lake, "id", victims): Unit
            victims.foreach(model.remove)
            s"deleteKeys ${live.size}"
          case "refreshIndex" => // bring the key index up to date
            val c = History.refreshKeyIndex(spark, lake, "id")
            s"refreshIndex $c"
          case "mkTag" => // pin the current image (≤3 live pins)
            if (tagModel.size >= 3) {
              val oldest = tagModel.head._1
              History.deleteTag(spark, lake, oldest): Unit
              tagModel.remove(oldest): Unit
            }
            val name = s"t$tagSeq"; tagSeq += 1
            History.tag(spark, lake, name): Unit
            tagModel(name) = (vName, model.toMap)
            s"tag $name"
          case "rmTag" => // release the oldest pin
            tagModel.headOption match {
              case Some((name, _)) =>
                History.deleteTag(spark, lake, name): Unit
                tagModel.remove(name): Unit
                s"rmTag $name"
              case None => "rmTag noop"
            }
          case "deleteKeysDV" => // merge-on-read takedown: zero rewrites
            val live = rnd.shuffle(model.keys.toSeq.sorted)
              .take(rnd.nextInt(4))
            val victims = live :+ (nextId + 777L)
            History.deleteKeysDV(spark, lake, "id", victims): Unit
            victims.foreach(model.remove)
            s"deleteKeysDV ${live.size}"
          case "materializeDV" => // fold vectors back into data
            val (files, rows) = History.materializeDeletes(spark, lake)
            s"materializeDV ${files}f/${rows}r"
          case "overwritePart" => // backfill one partition atomically
            val p = s"p${rnd.nextInt(3)}"
            val rows = freshRows(1 + rnd.nextInt(5))
              .map { case (id, _, v) => (id, p, v) }
            History.overwritePartitions(spark, lake, toLakeDF(rows),
              Seq("part")): Unit
            model.filterInPlace { case (_, (mp, _)) => mp != p }
            rows.foreach { case (id, pp, v) => model(id) = (pp, v) }
            s"overwritePart $p ${rows.size}"
          case "regrain" => // whole-lake layout evolution mid-lifecycle
            // (CALL lake.repartition_lake): round-trip part →
            // unpartitioned → part so BOTH scheme-change directions run
            // under composition (tags, DVs, later deletes/merges) while
            // the lake ends in the layout the raw-append writer speaks
            // — a lasting unpartitioned re-grain would make that
            // writer's next k=v landing a mixed layout the engine
            // refuses. Contents must not change; pinned tags must
            // still answer through the retired pre-grain files.
            History.repartitionLake(spark, lake, Seq.empty): Unit
            History.repartitionLake(spark, lake, Seq("part")): Unit
            "regrain none->part"
          case "appendChecked" => // validated append through enforcement
            val rows = freshRows(1 + rnd.nextInt(4))
            History.append(spark, lake, toDF(rows), key = s"ck$op",
              partitionCols = Seq("part")): Unit
            rows.foreach { case (id, p, v) => model(id) = (p, v) }
            s"appendChecked ${rows.size}"
          case "appendBad" => // violating batch: rejected whole
            val rows = freshRows(2).map { case (id, p, _) => (id, p, -5L) }
            val before = FileManifest.latestVersion(fs(lake), lake).get
            val rejected =
              try {
                History.append(spark, lake, toDF(rows), key = s"bad$op",
                  partitionCols = Seq("part"))
                false
              } catch { case _: IllegalArgumentException => true }
            assert(rejected, s"seed=$seed op#$op appendBad not rejected")
            assert(FileManifest.latestVersion(fs(lake), lake)
              .get === before, s"seed=$seed op#$op appendBad flipped")
            "appendBad rejected"
          case "updateWhere" => // copy-on-write row correction
            val k = 2 + rnd.nextInt(3)
            val r = rnd.nextInt(k)
            History.updateWhere(spark, lake, col("id") % k === r,
              Seq("v" -> (col("v") + 10000L))): Unit
            model.mapValuesInPlace { case (id, (p, v)) =>
              if (id % k == r) (p, v + 10000L) else (p, v) }
            s"updateWhere id%$k=$r"
          case "updateMove" => // correction assigning a PARTITION column
            val from = s"p${rnd.nextInt(3)}"
            val to = s"p${rnd.nextInt(3)}"
            History.updateWhere(spark, lake, col("part") === from,
              Seq("part" -> lit(to))): Unit
            model.mapValuesInPlace { case (_, (p, v)) =>
              if (p == from) (to, v) else (p, v) }
            s"updateMove $from->$to"
          case "sqlUpdate" => // the same verb through the SQL surface
            val x = rnd.nextLong(1000L)
            spark.sql(s"UPDATE lake.`$lake` SET v = v + 7 WHERE v < $x")
              .collect(): Unit
            model.mapValuesInPlace { case (_, (p, v)) =>
              if (v < x) (p, v + 7L) else (p, v) }
            s"sqlUpdate v<$x"
          case "sqlOverwrite" => // atomic whole-lake restatement
            val rows = freshRows(3 + rnd.nextInt(5))
            toDF(rows).createOrReplaceTempView("fuzz_ovw_src")
            // table column order: data cols then the partition col
            spark.sql(s"INSERT OVERWRITE lake.`$lake` " +
              "SELECT id, v, part FROM fuzz_ovw_src").collect(): Unit
            model.clear()
            rows.foreach { case (id, p, v) => model(id) = (p, v) }
            s"sqlOverwrite ${rows.size}"
          case "sqlDelete" => // SQL DELETE lands as deletion vectors
            if (model.isEmpty) "sqlDelete noop"
            else {
              val victims = rnd.shuffle(model.keys.toSeq)
                .take(1 + rnd.nextInt(3)).sorted
              spark.sql(s"DELETE FROM lake.`$lake` " +
                s"WHERE id IN (${victims.mkString(", ")})"): Unit
              victims.foreach(model.remove)
              s"sqlDelete ${victims.size}"
            }
          case "sqlOverwritePart" => // static-partition restatement
            val target = s"p${rnd.nextInt(3)}"
            val rows = freshRows(1 + rnd.nextInt(5))
              .map { case (id, _, v) => (id, target, v) }
            toDF(rows).createOrReplaceTempView("fuzz_povw_src")
            spark.sql(s"INSERT OVERWRITE lake.`$lake` " +
              s"PARTITION (part = '$target') " +
              "SELECT id, v FROM fuzz_povw_src").collect(): Unit
            model.filterInPlace { case (_, (p, _)) => p != target }
            rows.foreach { case (id, p, v) => model(id) = (p, v) }
            s"sqlOverwritePart $target ${rows.size}"
          case "sqlMergeCdc" => // the four-arm CDC apply in one MERGE
            import spark.implicits._
            val live = rnd.shuffle(model.keys.toSeq)
            val dels = live.take(rnd.nextInt(3))
            val upds = live.drop(dels.size).take(rnd.nextInt(3))
              .map(id => (id, s"p${rnd.nextInt(3)}", rnd.nextLong(1000L)))
            val ins = freshRows(rnd.nextInt(3))
            val ghostDels = freshRows(1) // absent keys: must no-op
            val src =
              dels.map(id => (id, "px", 0L, "D")) ++
              upds.map { case (id, p, v) => (id, p, v, "U") } ++
              ins.map { case (id, p, v) => (id, p, v, "I") } ++
              ghostDels.map { case (id, p, v) => (id, p, v, "D") }
            if (src.isEmpty) "sqlMergeCdc noop"
            else {
              src.toDF("id", "part", "v", "op")
                .createOrReplaceTempView("fuzz_cdc_src")
              spark.sql(s"""MERGE INTO lake.`$lake` t
                            USING fuzz_cdc_src s ON t.id = s.id
                            WHEN MATCHED AND s.op = 'D' THEN DELETE
                            WHEN MATCHED THEN UPDATE SET *
                            WHEN NOT MATCHED AND s.op != 'D'
                              THEN INSERT *""").collect(): Unit
              dels.foreach(model.remove)
              upds.foreach { case (id, p, v) => model(id) = (p, v) }
              ins.foreach { case (id, p, v) => model(id) = (p, v) }
              s"sqlMergeCdc d${dels.size}/u${upds.size}/i${ins.size}"
            }
          case "sqlMergeSync" => // full sync: the lake BECOMES the src
            import spark.implicits._
            val keep = rnd.shuffle(model.toSeq)
              .take(rnd.nextInt(model.size + 1))
              .map { case (id, (p, v)) => (id, p, v + 1L) }
            val fresh = freshRows(rnd.nextInt(3))
            val src = keep ++ fresh
            if (src.isEmpty) "sqlMergeSync noop"
            else {
              toDF(src).createOrReplaceTempView("fuzz_sync_src")
              spark.sql(s"""MERGE INTO lake.`$lake` t
                            USING fuzz_sync_src s ON t.id = s.id
                            WHEN MATCHED THEN UPDATE SET *
                            WHEN NOT MATCHED THEN INSERT *
                            WHEN NOT MATCHED BY SOURCE THEN DELETE""")
                .collect(): Unit
              model.clear()
              src.foreach { case (id, p, v) => model(id) = (p, v) }
              s"sqlMergeSync ${src.size}"
            }
          case "sqlMergePartial" => // column-subset CDC: conditional
            // partial-SET arms, first-match-wins; ghosts must no-op
            import spark.implicits._
            val live = rnd.shuffle(model.keys.toSeq)
            val vUpds = live.take(rnd.nextInt(3))
              .map(id => (id, "px", rnd.nextLong(1000L), "V"))
            val pUpds = live.drop(vUpds.size).take(rnd.nextInt(3))
              .map(id => (id, s"p${rnd.nextInt(3)}", 0L, "P"))
            val ghosts = freshRows(1)
              .map { case (id, p, v) => (id, p, v, "V") }
            val src = vUpds ++ pUpds ++ ghosts
            src.toDF("id", "np", "nv", "op")
              .createOrReplaceTempView("fuzz_partial_src")
            spark.sql(s"""MERGE INTO lake.`$lake` t
                          USING fuzz_partial_src s ON t.id = s.id
                          WHEN MATCHED AND s.op = 'V'
                            THEN UPDATE SET v = s.nv + 1
                          WHEN MATCHED AND s.op = 'P'
                            THEN UPDATE SET part = s.np""").collect(): Unit
            vUpds.foreach { case (id, _, nv, _) =>
              model(id) = (model(id)._1, nv + 1) }
            pUpds.foreach { case (id, np, _, _) =>
              model(id) = (np, model(id)._2) }
            s"sqlMergePartial v${vUpds.size}/p${pUpds.size}"

          case "sqlOverwriteDyn" => // dynamic-mode backfill: replace
            // exactly the partitions the batch produced
            val rows = freshRows(1 + rnd.nextInt(4))
            spark.conf
              .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try
              // table column order: data cols then the partition col
              spark.sql(s"INSERT OVERWRITE lake.`$lake` " +
                rows.map { case (id, p, v) => s"($id, $v, '$p')" }
                  .mkString("VALUES ", ", ", "")).collect(): Unit
            finally spark.conf
              .unset("spark.sql.sources.partitionOverwriteMode")
            if (model.isEmpty) {
              // empty current set: zero partition columns derivable —
              // the verb degenerates to the whole-table restatement
              model.clear()
            } else {
              val restated = rows.map(_._2).toSet
              model.filterInPlace { case (_, (p, _)) => !restated(p) }
            }
            rows.foreach { case (id, p, v) => model(id) = (p, v) }
            s"sqlOverwriteDyn ${rows.map(_._2).distinct.sorted.mkString(",")}"

          case "sqlDeleteExists" => // correlated-EXISTS takedown: the
            // decorrelated semi-join route (h56 shape) — plus one
            // ghost row that must match nothing
            if (model.isEmpty) "sqlDeleteExists noop"
            else {
              val victims = rnd.shuffle(model.keys.toSeq)
                .take(1 + rnd.nextInt(3)).sorted
              toDF(victims.map(id => (id, "px", rnd.nextLong(1000L))) :+
                  ((nextId + 888L, "px", 0L)))
                .createOrReplaceTempView("fuzz_exists_src")
              spark.sql(s"""DELETE FROM lake.`$lake` t
                            WHERE EXISTS (SELECT 1 FROM fuzz_exists_src s
                                          WHERE s.id = t.id)""")
                .collect(): Unit
              victims.foreach(model.remove)
              s"sqlDeleteExists ${victims.size}"
            }
          case "sqlUpdateCorrIn" => // correlated-IN correction: value
            // matched per-key through the decorrelated (id, v) frame
            // (h57 shape) — a stale v in the source matches nothing
            if (model.isEmpty) "sqlUpdateCorrIn noop"
            else {
              val live = rnd.shuffle(model.keys.toSeq)
                .take(1 + rnd.nextInt(3)).sorted
              val (hit, stale) = live.partition(_ => rnd.nextBoolean())
              toDF(hit.map(id => (id, "px", model(id)._2)) ++
                  stale.map(id => (id, "px", model(id)._2 + 5000L)))
                .createOrReplaceTempView("fuzz_corrin_src")
              spark.sql(s"""UPDATE lake.`$lake` t SET v = v + 31
                            WHERE t.v IN (SELECT s.v FROM fuzz_corrin_src s
                                          WHERE s.id = t.id)""")
                .collect(): Unit
              hit.foreach(id => model(id) = (model(id)._1, model(id)._2 + 31L))
              s"sqlUpdateCorrIn ${hit.size}h/${stale.size}s"
            }
          case "sqlMergeSyncUpd" => // full sync with the by-source
            // UPDATE arm (h58 shape): unmatched target rows are MARKED
            // (v bumped) instead of shed — key reassignment refused by
            // the engine, so the mark is the representative shape
            if (model.isEmpty) "sqlMergeSyncUpd noop"
            else {
              val keep = rnd.shuffle(model.toSeq)
                .take(rnd.nextInt(model.size + 1))
                .map { case (id, (p, v)) => (id, p, v + 1L) }
              val fresh = freshRows(rnd.nextInt(3))
              val src = keep ++ fresh
              if (src.isEmpty) "sqlMergeSyncUpd noop"
              else {
                toDF(src).createOrReplaceTempView("fuzz_syncupd_src")
                spark.sql(s"""MERGE INTO lake.`$lake` t
                              USING fuzz_syncupd_src s ON t.id = s.id
                              WHEN MATCHED THEN UPDATE SET *
                              WHEN NOT MATCHED THEN INSERT *
                              WHEN NOT MATCHED BY SOURCE
                                THEN UPDATE SET v = v + 100000""")
                  .collect(): Unit
                val srcIds = src.map(_._1).toSet
                model.mapValuesInPlace { case (id, (p, v)) =>
                  if (srcIds(id)) (p, v) else (p, v + 100000L) }
                src.foreach { case (id, p, v) => model(id) = (p, v) }
                s"sqlMergeSyncUpd ${keep.size}k+${fresh.size}f"
              }
            }
          case "renameV" => // metadata-only rename mid-lifecycle: every
            // later read/write speaks the new name; old files (and the
            // raw-adopt writer still emitting the ORIGINAL name) read
            // back through the alias chain
            val nn = s"v_r$renSeq"; renSeq += 1
            graft.sources.SchemaLog.renameColumn(
              spark, lake, vName, nn): Unit
            retiredEver += vName
            vName = nn
            s"renameV -> $nn"

          case "dropReAdd" => // the NAME-RESURRECTION adversary: cycle
            // an extra nullable column through add -> drop, and after
            // every drop ATTEMPT to re-add the tombstoned name — old
            // files still hold its bytes, so a successful re-add would
            // resurrect stale values into the "new" column; the
            // tombstone must bounce it forever
            val f = fs(lake)
            wLive match {
              case None =>
                val nn = s"w$wSeq"; wSeq += 1
                val cur = graft.sources.SchemaLog.latest(f, lake).get
                graft.sources.SchemaLog.evolve(spark, lake,
                  org.apache.spark.sql.types.StructType(cur.fields :+
                    org.apache.spark.sql.types.StructField(nn,
                      org.apache.spark.sql.types.LongType,
                      nullable = true))): Unit
                wLive = Some(nn)
                s"addW $nn"
              case Some(w) =>
                graft.sources.SchemaLog.dropColumn(spark, lake, w): Unit
                retiredEver += w
                wLive = None
                val cur = graft.sources.SchemaLog.latest(f, lake).get
                val e = intercept[IllegalArgumentException] {
                  graft.sources.SchemaLog.evolve(spark, lake,
                    org.apache.spark.sql.types.StructType(cur.fields :+
                      org.apache.spark.sql.types.StructField(w,
                        org.apache.spark.sql.types.LongType,
                        nullable = true)))
                }
                assert(e.getMessage.contains("retired"),
                  s"seed=$seed op#$op re-add of dropped $w must bounce " +
                    s"off the tombstone: ${e.getMessage}")
                s"dropW $w + re-add bounced"
            }

          case "renameOntoRetired" => // rename-onto-retired collision:
            // renaming the live value column ONTO any name ever
            // retired (renamed away or dropped) must refuse — the old
            // files still answer to that physical name, so the read
            // schema would go ambiguous / resurrect stale values
            if (retiredEver.isEmpty) "renameOntoRetired noop"
            else {
              val target = retiredEver(rnd.nextInt(retiredEver.size))
              val e = intercept[IllegalArgumentException] {
                graft.sources.SchemaLog.renameColumn(
                  spark, lake, vName, target)
              }
              assert(e.getMessage.contains("retired"),
                s"seed=$seed op#$op rename onto retired $target must " +
                  s"refuse: ${e.getMessage}")
              s"renameOntoRetired $target bounced"
            }

          case "sqlDeleteInSub" => // IN-subquery takedown, keyed route
            if (model.isEmpty) "sqlDeleteInSub noop"
            else {
              val x = rnd.nextLong(1000L)
              val victims = rnd.shuffle(model.keys.toSeq)
                .take(1 + rnd.nextInt(4))
              toDF(victims.map(id => (id, "px", 0L)))
                .createOrReplaceTempView("fuzz_insub_src")
              spark.sql(s"""DELETE FROM lake.`$lake`
                            WHERE id IN (SELECT id FROM fuzz_insub_src
                                         WHERE v < $x OR v >= $x)""")
                .collect(): Unit
              victims.foreach(model.remove)
              s"sqlDeleteInSub ${victims.size}"
            }
          case _ => // roll back to any retained snapshot ("restore")
            val f = fs(lake)
            val candidates = FileManifest.versions(f, lake)
              .filter(history.contains)
            if (candidates.isEmpty) "restore noop"
            else {
              val v = candidates(rnd.nextInt(candidates.size))
              History.restore(spark, lake, v): Unit
              model.clear()
              model ++= history(v)
              s"restore v$v"
            }
        }
      } catch {
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case e: Throwable => throw new IllegalStateException(
          s"seed=$seed op#$op [$picked] threw: ${e.getMessage}", e)
      }
      assert(img(lake, vName) === model.toMap, s"seed=$seed op#$op [$desc]")
      if (keyed) {
        // point-lookup cross-check on a live sample + two absent keys;
        // the index may be arbitrarily stale here — staleness must
        // only cost planned files, never rows
        import spark.implicits._
        val probes = model.keys.toSeq.sorted.take(5) ++
          Seq(nextId + 1000L, nextId + 2000L)
        val got = History.readPinnedKeyed(spark, lake, "id", probes)
          .select("id", "part", vName).as[(Long, String, Long)].collect()
          .map { case (id, p, v) => id -> (p, v) }.toMap
        val want = probes.flatMap(id => model.get(id).map(id -> _)).toMap
        assert(got === want, s"seed=$seed op#$op [$desc] keyed lookup")
      }
      if (tagged) {
        // every live pin must read back EXACTLY the image it pinned,
        // whatever deletes/merges/clusters/grace-0 vacuums ran since —
        // under the PIN-ERA column name: a tagged manifest's schema
        // STAMP names the column as declared at its COMMIT, which can
        // lag the name at tag-creation time (a metadata-only rename
        // between data commits becomes pin-visible only at the next
        // commit — the documented stamp contract), so the value column
        // resolves from the frame itself: the one declared name the
        // era actually carries ("v" or a rename-generation "v_rK");
        // pre-stamp pins fall back to the present declaration the
        // same way
        import spark.implicits._
        for ((name, (pinName, snap)) <- tagModel) {
          val df = History.readTag(spark, lake, name)
          val vc =
            if (df.columns.contains(pinName)) pinName
            else df.columns.filter(c => c == "v" || c.startsWith("v_r"))
              .sorted.lastOption.getOrElse(vName)
          val got = df
            .select("id", "part", vc).as[(Long, String, Long)].collect()
            .map { case (id, p, v) => id -> (p, v) }.toMap
          assert(got === snap, s"seed=$seed op#$op [$desc] tag $name")
        }
        // record this op's committed image for future restore ops
        history(FileManifest.latestVersion(fs(lake), lake).get) = model.toMap
      }
      if (renames) {
        // SNAPSHOT-ERA re-reads: pin freshly committed versions with
        // the column name their commit declared; while the root stays
        // retained (no vacuum yet), the pinned read must answer under
        // exactly that era name with exactly that image — a rename
        // landing after the commit must NOT leak into the pin
        val f = fs(lake)
        val latestV = FileManifest.latestVersion(f, lake).get
        // only post-declaration commits carry a schema stamp — the
        // init versions (enableManifests / shard conversion) predate
        // declareSchema and would era-resolve to the PRESENT name
        if (latestV > initV && !eraPins.exists(_._1 == latestV) &&
            eraPins.forall(_._1 < latestV)) {
          eraPins += ((latestV, vName, model.toMap))
          if (eraPins.size > 4) eraPins.remove(0): Unit
        }
        val retained = FileManifest.versions(f, lake).toSet
        import spark.implicits._
        for ((v, pinName, snap) <- eraPins if retained(v)) {
          val df = History.readPinned(spark, lake, v)
          assert(df.columns.contains(pinName),
            s"seed=$seed op#$op [$desc] era pin v$v must declare " +
              s"'$pinName' (has: ${df.columns.mkString(",")})")
          val got = df
            .select("id", "part", pinName).as[(Long, String, Long)]
            .collect().map { case (id, p, v2) => id -> (p, v2) }.toMap
          assert(got === snap, s"seed=$seed op#$op [$desc] era pin v$v")
        }
      }
    }
    // release every remaining pin first: pinned files are retired-but-
    // kept on disk, which the plain directory read below would
    // double-count (by design — that's what the pin preserves)
    if (tagged) {
      tagModel.keys.toSeq.foreach(n => History.deleteTag(spark, lake, n): Unit)
      tagModel.clear()
    }
    // fold any outstanding deletion vectors first: the plain directory
    // read below sees raw parquet bytes, which by design include
    // DV-deleted rows until a rewrite materializes them (dml mode's
    // SQL DELETEs land as vectors too)
    if (dv || dml) History.materializeDeletes(spark, lake): Unit
    // after a final vacuum the plain directory read agrees too (no
    // retired/orphan files left to double-count)
    History.vacuum(spark, lake, graceMs = 0L): Unit
    if (renames) {
      // physical files span rename eras, so the raw directory read
      // cannot select one value-column name — check the orphan/double-
      // count property by COUNT (schema-free) and values via the
      // aliased engine read
      if (model.nonEmpty)
        assert(spark.read.parquet(lake).count() === model.size.toLong,
          s"seed=$seed final raw count")
      assert(img(lake, vName) === model.toMap, s"seed=$seed final read")
    } else {
      val plain =
        if (model.isEmpty) Map.empty[Long, (String, Long)]
        else {
          import spark.implicits._
          spark.read.parquet(lake).select("id", "part", "v")
            .as[(Long, String, Long)].collect()
            .map { case (id, p, v) => id -> (p, v) }.toMap
        }
      assert(plain === model.toMap, s"seed=$seed final plain read")
    }
    if (sharded) {
      // partition-pruned reads reassemble the model slice by slice
      import spark.implicits._
      for (p <- Seq("p0", "p1", "p2") if model.exists(_._2._1 == p)) {
        val got = History.readPinnedPartitions(spark, lake, _ == s"part=$p")
          .select("id", "part", vName).as[(Long, String, Long)].collect()
          .map { case (id, pp, v) => id -> (pp, v) }.toMap
        assert(got === model.filter(_._2._1 == p).toMap,
          s"seed=$seed sharded pruned read part=$p")
      }
      // after the final grace-0 vacuum, disk shards == referenced shards
      val f = fs(lake)
      assert(FileManifest.listShardFiles(f, lake).map(_._1).toSet ===
        FileManifest.referencedShards(f, lake), s"seed=$seed shard GC")
    }
  }

  test("random lifecycle sequences agree with the model (seed 1)") {
    runSequence(seed = 1L, nOps = 10)
  }

  test("random lifecycle sequences agree with the model (seed 42)") {
    runSequence(seed = 42L, nOps = 10)
  }

  test("random lifecycle sequences agree with the model (seed 1337)") {
    runSequence(seed = 1337L, nOps = 10)
  }

  test("sharded manifests: lifecycle sequences agree (seed 7)") {
    runSequence(seed = 7L, nOps = 10, sharded = true)
  }

  test("sharded manifests: lifecycle sequences agree (seed 99)") {
    runSequence(seed = 99L, nOps = 10, sharded = true)
  }

  test("keyed mode: takedowns + stale-index lookups agree (seed 3)") {
    runSequence(seed = 3L, nOps = 10, keyed = true)
  }

  test("keyed + sharded: the full metadata stack agrees (seed 13)") {
    runSequence(seed = 13L, nOps = 10, sharded = true, keyed = true)
  }

  test("tagged mode: pins survive arbitrary lifecycles (seed 17)") {
    runSequence(seed = 17L, nOps = 12, sharded = true, tagged = true)
  }

  test("DV mode: merge-on-read deletes compose with COW ops (seed 29)") {
    runSequence(seed = 29L, nOps = 12, dv = true)
  }

  test("DV + keyed + sharded + tagged: the whole stack agrees (seed 31)") {
    runSequence(seed = 31L, nOps = 12, sharded = true, keyed = true,
      tagged = true, dv = true)
  }

  test("constrained mode: enforcement composes with the lifecycle (seed 53)") {
    runSequence(seed = 53L, nOps = 12, constrained = true)
  }

  test("constrained + DV + sharded: enforcement on the full stack (seed 59)") {
    runSequence(seed = 59L, nOps = 12, sharded = true, dv = true,
      constrained = true)
  }

  test("DML mode: UPDATE + SQL verbs compose with the lifecycle (seed 61)") {
    runSequence(seed = 61L, nOps = 12, dml = true)
  }

  test("DML + DV + sharded + constrained: corrections on the full stack (seed 67)") {
    runSequence(seed = 67L, nOps = 14, sharded = true, dv = true,
      constrained = true, dml = true)
  }

  // Deep sweep for bug hunts — opt-in (SPARK_GRAFT_DEEP_FUZZ=1) so the
  // default suite stays fast; longer sequences and more seeds over
  // both manifest modes, half with the keyed-index lifecycle mixed in.
  test("deep fuzz: long sequences across both manifest modes (opt-in)") {
    assume(sys.env.get("SPARK_GRAFT_DEEP_FUZZ").contains("1"))
    for (seed <- Seq(5L, 11L, 23L, 47L, 101L, 211L))
      runSequence(seed, nOps = 25, sharded = seed % 2 == 1,
        keyed = Seq(23L, 101L, 211L).contains(seed),
        tagged = Seq(5L, 47L, 211L).contains(seed),
        dv = Seq(11L, 47L, 101L).contains(seed))
    // constrained joins the deep sweep on its own seeds (the existing
    // seeds' random streams must stay replayable as-is)
    for (seed <- Seq(307L, 311L))
      runSequence(seed, nOps = 25, sharded = seed == 311L,
        dv = seed == 311L, constrained = true)
    // dml (UPDATE + SQL verbs) likewise joins on fresh seeds, one on
    // the full stack
    for (seed <- Seq(401L, 409L))
      runSequence(seed, nOps = 25, sharded = seed == 409L,
        dv = seed == 409L, constrained = seed == 409L, dml = true)
    // round-16 verbs (partial-SET MERGE arms, dynamic overwrite) get
    // their own fresh seeds so the widened pick range is swept hard
    for (seed <- Seq(503L, 509L))
      runSequence(seed, nOps = 30, sharded = seed == 509L,
        dv = seed == 509L, dml = true)
    // RENAMES mid-lifecycle: metadata-only column renames interleave
    // with deletes/merges/clusters/DV takedowns/tags/restores while a
    // stale raw-adopt writer keeps emitting the ORIGINAL physical name
    // — every read must keep answering through the alias chain
    for (seed <- Seq(601L, 607L))
      runSequence(seed, nOps = 25, sharded = seed == 607L,
        keyed = true, dv = seed == 607L, tagged = seed == 601L,
        renames = true)
    // TOMBSTONE adversary seeds (round-17): longer renames-mode walks
    // so the widened pick range (dropReAdd / renameOntoRetired — the
    // name-resurrection hazard class) is swept hard alongside the
    // alias-chain lifecycle
    for (seed <- Seq(701L, 709L))
      runSequence(seed, nOps = 35, sharded = seed == 709L,
        keyed = true, dv = seed == 709L, tagged = seed == 701L,
        renames = true)
  }

  // Bug-hunt dial: SPARK_GRAFT_FUZZ_SWEEP=<n> runs n EXTRA randomized
  // full-stack sequences (fresh deterministic seeds, mode bits cycled)
  // on top of the deep sweep — any failure reproduces from its printed
  // seed. The round-16 layout-memory hole was found exactly this way.
  test("deep fuzz: env-sized randomized sweep (opt-in)") {
    assume(sys.env.get("SPARK_GRAFT_DEEP_FUZZ").contains("1"))
    val n = sys.env.get("SPARK_GRAFT_FUZZ_SWEEP")
      .flatMap(_.toIntOption).getOrElse(0)
    for (i <- 0 until n) {
      // every 5th sequence trades the SQL verbs for the renames mode
      // (they don't compose: constraints/SQL fixtures speak fixed
      // column names)
      val ren = i % 5 == 4
      runSequence(seed = 10000L + i, nOps = 20,
        sharded = i % 2 == 0, keyed = i % 3 == 0, tagged = i % 4 == 0,
        dv = i % 2 == 1, constrained = !ren && i % 3 == 1, dml = !ren,
        renames = ren)
    }
  }
}
