package graft.query

import graft.model._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational queries between spatial elements and annotation tables —
  * the reference's `_core/query/relational_query.py`.
  *
  * Join key: element instance id (shapes `index`, labels `label`, points
  * `instance_key` column) vs the table's `(region_key, instance_key)`
  * columns. All five join flavors are plain Spark joins; `matchRows`
  * ordering is explicit (there is no implicit row order in a distributed
  * table — SURVEY.md §7.4.4).
  */
object RelationalQuery {

  /** Result pair: either side may be dropped by the join flavor
    * (relational_query.py:507-517 JoinTypes).
    */
  final case class JoinResult(element: Option[DataFrame], table: Option[DataFrame])

  /** Distinct instance ids of an element (get_element_instances,
    * relational_query.py:62-120; labels drop background 0).
    */
  def elementInstanceIds(el: SpatialElement): DataFrame = el.meta.kind match {
    case ElementKind.Labels =>
      el.data.select(col("label").as("__instance")).filter(col("__instance") =!= 0).distinct()
    case ElementKind.Shapes =>
      el.data.select(col("index").as("__instance"))
    case ElementKind.Points =>
      val key = el.meta.attrs.getOrElse("instance_key",
        sys.error(s"points '${el.meta.name}' have no instance_key"))
      el.data.select(col(key).cast("long").as("__instance")).distinct()
    case k => sys.error(s"cannot enumerate instances of $k element")
  }

  /** The five join flavors between one element and an annotating table
    * (join_spatialelement_table, relational_query.py:558-716). `idCol` is
    * the element-side instance column.
    *
    * No forced broadcast hints: the distinct-id side is small for
    * label/shape regions but can be 1e8+ ids when the element is a points
    * table (transcripts). AQE picks broadcast vs shuffle from actual sizes.
    */
  def joinElementTable(elem: DataFrame, idCol: String, elementName: String,
      obs: DataFrame, ann: TableAnnotation, how: String): JoinResult = {
    val obsRegion = obs.filter(col(ann.regionKey) === elementName)
    val obsIds = obsRegion.select(col(ann.instanceKey).cast("long").as("__obs_id")).distinct()
    val elemIds = elem.select(col(idCol).cast("long").as("__elem_id")).distinct()
    val joinElemToObs = elem.col(idCol).cast("long") === col("__obs_id")

    how match {
      case "left" =>
        // all element rows; table filtered to matching instances (:434-479)
        val t = obsRegion.join(elemIds,
          col(ann.instanceKey).cast("long") === col("__elem_id"), "left_semi")
        JoinResult(Some(elem), Some(t))
      case "left_exclusive" =>
        // element rows NOT annotated; no table (:398-431)
        val e = elem.join(obsIds, joinElemToObs, "left_anti")
        JoinResult(Some(e), None)
      case "inner" =>
        // both sides filtered to matches (:337-395)
        val e = elem.join(obsIds, joinElemToObs, "left_semi")
        val t = obsRegion.join(elemIds,
          col(ann.instanceKey).cast("long") === col("__elem_id"), "left_semi")
        JoinResult(Some(e), Some(t))
      case "right" =>
        // table kept; element masked to table ids (:293-334)
        val e = elem.join(obsIds, joinElemToObs, "left_semi")
        JoinResult(Some(e), Some(obsRegion))
      case "right_exclusive" =>
        // table rows whose instance not in element (:249-290)
        val t = obsRegion.join(elemIds,
          col(ann.instanceKey).cast("long") === col("__elem_id"), "left_anti")
        JoinResult(None, Some(t))
      case other => sys.error(s"unknown join flavor '$other'")
    }
  }

  /** Row-order-aligned annotation: element rows enriched with table columns
    * in element order (`match_rows`, relational_query.py:482-504) — an
    * explicit inner join keyed on instance id; ordering is carried by
    * `orderCol`, never implicit.
    */
  def matchTableToElement(elem: DataFrame, idCol: String, elementName: String,
      obs: DataFrame, ann: TableAnnotation): DataFrame = {
    val obsRegion = obs.filter(col(ann.regionKey) === elementName)
      .withColumnRenamed(ann.instanceKey, "__instance")
      .drop(ann.regionKey)
    elem.join(obsRegion, elem(idCol).cast("long") === col("__instance").cast("long"), "left")
      .drop("__instance")
  }

  /** Filter elements to the instances present in a table — the reference's
    * `match_element_to_table` (relational_query.py:752-787:
    * `join_spatialelement_table(how="right", match_rows="right")`). Returns
    * the masked element per name plus the table obs. Labels are not
    * supported, matching the reference's contract.
    */
  def matchElementToTable(sd: SpatialDataset, elementNames: Seq[String],
      tableName: String): (Map[String, DataFrame], DataFrame) = {
    val tbl = sd.element(tableName)
    val ann = tbl.meta.table.getOrElse(sys.error(s"table '$tableName' annotates nothing"))
    val masked = elementNames.map { name =>
      val el = sd.element(name)
      val idCol = el.meta.kind match {
        case ElementKind.Shapes => "index"
        case ElementKind.Points =>
          el.meta.attrs.getOrElse("instance_key",
            ann.instanceKey match {
              case k if el.data.columns.contains(k) => k
              case _ => sys.error(s"points '$name': no instance key column")
            })
        case ElementKind.Labels =>
          sys.error("match_element_to_table does not support Labels elements " +
            "(reference relational_query.py:763)")
        case other => sys.error(s"unsupported element kind $other")
      }
      val r = joinElementTable(el.data, idCol, name, tbl.obs, ann, "right")
      name -> r.element.get
    }.toMap
    (masked, tbl.obs)
  }

  /** Cascade: restrict each annotating table to instances that survive in
    * their region elements (`_filter_table_by_elements`,
    * relational_query.py:123-159).
    */
  def filterTablesByElements(sd: SpatialDataset): SpatialDataset = {
    val newTables = sd.tables.map { case (name, tbl) =>
      tbl.meta.table match {
        case Some(ann) =>
          val perRegion = ann.region.flatMap { regionName =>
            sd.elementData.get(regionName).map { el =>
              val ids = elementInstanceIds(el)
              tbl.obs.filter(col(ann.regionKey) === regionName)
                .join(ids, col(ann.instanceKey).cast("long") === col("__instance"), "left_semi")
            }
          }
          if (perRegion.isEmpty) name -> tbl
          else {
            val newObs = perRegion.reduce(_ unionByName _)
            val newX = tbl.aux.get("X").map { x =>
              x.join(newObs.select(col(ann.instanceKey).cast("long").as("__keep")).distinct(),
                col("instance_id").cast("long") === col("__keep"), "left_semi")
            }
            name -> tbl.copy(data = newObs,
              aux = tbl.aux ++ newX.map("X" -> _))
          }
        case None => name -> tbl
      }
    }
    new SpatialDataset(sd.spark, sd.manifest, sd.elementData ++ newTables)
  }

  /** Labels pixel filtering for right/inner joins: zero out pixels whose
    * label is not annotated by the table (reference
    * relational_query.py:1112-1156, blockwise np.isin -> 0; here a
    * left join + conditional — AQE broadcasts the id side when it is small).
    */
  def maskLabelsByInstances(labels: DataFrame, keepIds: DataFrame): DataFrame = {
    val keep = keepIds.select(col(keepIds.columns.head).cast("long").as("__keep")).distinct()
    labels.join(keep, labels("label") === col("__keep"), "left")
      .withColumn("label", when(col("__keep").isNull, 0L).otherwise(col("label")))
      .drop("__keep")
  }

  /** Which tables annotate an element (get_element_annotators,
    * relational_query.py:38-59) — a manifest lookup.
    */
  def elementAnnotators(sd: SpatialDataset, elementName: String): Seq[String] =
    sd.manifest.ofKind(ElementKind.Tables)
      .filter(_.table.exists(_.region.contains(elementName)))
      .map(_.name)

  /** Resolve a value key against element columns, obs columns, or X vars
    * (`get_values`, relational_query.py:981-1109). Returns a DataFrame of
    * (instance id, value). `tableLayer` redirects the var lookup to an
    * AnnData layer instead of X (`table_layer`,
    * relational_query.py:1078-1086); an unknown layer fails loudly, matching
    * the reference's ValueError.
    */
  def getValues(sd: SpatialDataset, key: String, elementName: String,
      tableLayer: Option[String] = None): DataFrame = {
    val el = sd.element(elementName)
    val matKey = tableLayer.map(l => s"layer:$l").getOrElse("X")
    if (el.data.columns.contains(key)) {
      el.data
    } else {
      // search annotating tables: obs column, then X/layer var
      val annotators = sd.tables.values.filter(_.meta.table.exists(_.region.contains(elementName)))
      annotators.collectFirst {
        case t if t.obs.columns.contains(key) =>
          val ann = t.meta.table.get
          t.obs.filter(col(ann.regionKey) === elementName)
            .select(col(ann.instanceKey).as("instance_id"), col(key))
      }.orElse {
        // the reference only raises its layer-not-found ValueError when
        // resolution reaches X/layers (relational_query.py:1078-1086) — an
        // obs-column hit with a bogus table_layer still returns obs values
        if (tableLayer.isDefined && !annotators.exists(_.aux.contains(matKey)))
          sys.error(s"Layer ${tableLayer.get} was not found.")
        annotators.collectFirst {
          case t if t.aux.contains(matKey) &&
              !t.aux(matKey).filter(col("var_name") === key).isEmpty =>
            t.aux(matKey).filter(col("var_name") === key)
              .select(col("instance_id"), col("value").as(key))
        }
      }.orElse {
        // obsm matrices resolve by key too (relational_query.py:981-1109
        // accepts obsm keys): aux "obsm:<key>" is the wide per-key frame
        annotators.collectFirst {
          case t if t.aux.contains(s"obsm:$key") => t.aux(s"obsm:$key")
        }
      }.getOrElse(sys.error(s"value key '$key' not found for element '$elementName'"))
    }
  }

  /** Predicate pushdown over table obs / X then re-match elements
    * (`filter_by_table_query` surface, relational_query.py:835-910):
    * keeps obs rows passing `predicate`, then masks every annotated element
    * to the surviving instance ids.
    */
  def filterByTableQuery(sd: SpatialDataset, tableName: String, predicate: Column): SpatialDataset = {
    val tbl = sd.element(tableName)
    val ann = tbl.meta.table.getOrElse(sys.error(s"table '$tableName' annotates nothing"))
    val newObs = tbl.obs.filter(predicate)
    val newX = tbl.aux.get("X").map { x =>
      x.join(newObs.select(col(ann.instanceKey).cast("long").as("__keep")).distinct(),
        col("instance_id").cast("long") === col("__keep"), "left_semi")
    }
    val filteredElements = ann.region.flatMap { regionName =>
      sd.elementData.get(regionName).map { el =>
        val keep = newObs.filter(col(ann.regionKey) === regionName)
          .select(col(ann.instanceKey).cast("long").as("__keep")).distinct()
        val masked = el.meta.kind match {
          case ElementKind.Shapes =>
            el.data.join(keep, col("index").cast("long") === col("__keep"), "left_semi")
          case ElementKind.Labels =>
            el.data.join(keep, col("label") === col("__keep"), "left_semi")
          case ElementKind.Points =>
            val key = el.meta.attrs.getOrElse("instance_key", "instance_id")
            el.data.join(keep, col(key).cast("long") === col("__keep"), "left_semi")
          case _ => el.data
        }
        el.meta.name -> el.copy(data = masked)
      }
    }.toMap
    new SpatialDataset(sd.spark, sd.manifest,
      sd.elementData ++ filteredElements +
        (tableName -> tbl.copy(data = newObs, aux = tbl.aux ++ newX.map("X" -> _))))
  }
}
