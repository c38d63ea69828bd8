package graft.model

import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/** Element kinds (the reference's five container dicts,
  * `spatialdata.py:115-171`).
  */
sealed abstract class ElementKind(val dirName: String)
object ElementKind {
  case object Images extends ElementKind("images")
  case object Labels extends ElementKind("labels")
  case object Points extends ElementKind("points")
  case object Shapes extends ElementKind("shapes")
  case object Tables extends ElementKind("tables")
  val all: Seq[ElementKind] = Seq(Images, Labels, Points, Shapes, Tables)
  def fromDir(s: String): ElementKind =
    all.find(_.dirName == s).getOrElse(sys.error(s"unknown element kind '$s'"))
}

/** Table annotation metadata (`TableModel`'s
  * `uns["spatialdata_attrs"] = {region, region_key, instance_key}`,
  * reference models.py:1246-1248). `region` may list several annotated
  * elements.
  */
final case class TableAnnotation(
    region: Seq[String],
    regionKey: String,
    instanceKey: String)

/** Per-element manifest entry: everything the driver needs to plan queries
  * without touching data — kind, dims, named transforms, channel names,
  * table annotation, freeform attrs.
  */
final case class ElementMeta(
    name: String,
    kind: ElementKind,
    dims: Seq[String] = Nil,
    transforms: Map[String, Transform] = Map("global" -> IdentityT),
    channelNames: Seq[String] = Nil,
    table: Option[TableAnnotation] = None,
    attrs: Map[String, String] = Map.empty) {
  Validation.validateName(name)

  /** Tile extent of a tiled raster element's rows. Stores written with a
    * non-default chunk size record it here (`tile_size` attr) — consumers
    * must use THIS, not the global default, or pixel coordinates silently
    * corrupt (tile_y * 256 vs tile_y * storeChunk).
    */
  def tileSize: Int =
    attrs.get("tile_size").map(_.toInt).getOrElse(Models.ImageModel.TileSize)
}

/** Container manifest: the driver-side registry persisted as
  * `manifest.json` at the dataset root (mirrors the reference's Zarr
  * consolidated metadata, spatialdata.py:1478-1492).
  */
final case class GraftManifest(
    version: String,
    elements: Seq[ElementMeta],
    attrs: Map[String, String] = Map.empty,
    freeAttrs: JObject = JObject()) {
  Validation.validateUniqueNames(elements.map(_.name))

  def element(name: String): ElementMeta =
    elements.find(_.name == name)
      .getOrElse(sys.error(s"no element named '$name'"))

  def ofKind(kind: ElementKind): Seq[ElementMeta] = elements.filter(_.kind == kind)

  /** All coordinate-system names any element maps into. */
  def coordinateSystems: Seq[String] =
    elements.flatMap(_.transforms.keys).distinct.sorted
}

object GraftManifest {
  val CurrentVersion = "0.1"

  // --- transform <-> JSON (NGFF-flavoured tagged encoding) ---

  def transformToJson(t: Transform): JValue = t match {
    case IdentityT => ("type" -> "identity"): JObject
    case MapAxisT(m) => ("type" -> "mapAxis") ~ ("map" -> m)
    case TranslationT(v, ax) =>
      ("type" -> "translation") ~ ("translation" -> v) ~ ("axes" -> ax)
    case ScaleT(v, ax) =>
      ("type" -> "scale") ~ ("scale" -> v) ~ ("axes" -> ax)
    case AffineT(m, in, out) =>
      ("type" -> "affine") ~ ("matrix" -> m.data.toSeq) ~
        ("rows" -> m.rows) ~ ("cols" -> m.cols) ~
        ("inputAxes" -> in) ~ ("outputAxes" -> out)
    case SequenceT(ts) =>
      ("type" -> "sequence") ~ ("transforms" -> ts.map(transformToJson))
  }

  def transformFromJson(j: JValue): Transform = {
    implicit val fmt: Formats = DefaultFormats
    (j \ "type").extract[String] match {
      case "identity" => IdentityT
      case "mapAxis"  => MapAxisT((j \ "map").extract[Map[String, String]])
      case "translation" =>
        TranslationT((j \ "translation").extract[Seq[Double]], (j \ "axes").extract[Seq[String]])
      case "scale" =>
        ScaleT((j \ "scale").extract[Seq[Double]], (j \ "axes").extract[Seq[String]])
      case "affine" =>
        AffineT(
          Matrix((j \ "rows").extract[Int], (j \ "cols").extract[Int],
            (j \ "matrix").extract[Seq[Double]].toArray),
          (j \ "inputAxes").extract[Seq[String]],
          (j \ "outputAxes").extract[Seq[String]])
      case "sequence" =>
        SequenceT((j \ "transforms").asInstanceOf[JArray].arr.map(transformFromJson))
      case other => sys.error(s"unknown transform type '$other'")
    }
  }

  def toJson(m: GraftManifest): String = {
    val els: List[JValue] = m.elements.toList.map { e =>
      ("name" -> e.name) ~
        ("kind" -> e.kind.dirName) ~
        ("dims" -> e.dims) ~
        ("transforms" -> JObject(
          e.transforms.toList.map { case (cs, t) => JField(cs, transformToJson(t)) })) ~
        ("channelNames" -> e.channelNames) ~
        ("table" -> e.table.map(t =>
          ("region" -> t.region) ~ ("regionKey" -> t.regionKey) ~
            ("instanceKey" -> t.instanceKey))) ~
        ("attrs" -> e.attrs)
    }
    val root: JValue =
      ("version" -> m.version) ~ ("elements" -> els) ~ ("attrs" -> m.attrs) ~
        ("freeAttrs" -> (m.freeAttrs: JValue))
    JsonMethods.pretty(JsonMethods.render(root))
  }

  def fromJson(s: String): GraftManifest = {
    implicit val fmt: Formats = DefaultFormats
    val j = JsonMethods.parse(s)
    val els = (j \ "elements").asInstanceOf[JArray].arr.map { e =>
      val transforms = (e \ "transforms") match {
        case JObject(fields) =>
          fields.map { case JField(cs, tj) => cs -> transformFromJson(tj) }.toMap
        case _ => Map.empty[String, Transform]
      }
      val table = (e \ "table") match {
        case JNothing | JNull => None
        case tj => Some(TableAnnotation(
          (tj \ "region").extract[Seq[String]],
          (tj \ "regionKey").extract[String],
          (tj \ "instanceKey").extract[String]))
      }
      ElementMeta(
        name = (e \ "name").extract[String],
        kind = ElementKind.fromDir((e \ "kind").extract[String]),
        dims = (e \ "dims").extract[Seq[String]],
        transforms = transforms,
        channelNames = (e \ "channelNames").extract[Seq[String]],
        table = table,
        attrs = (e \ "attrs").extract[Map[String, String]])
    }
    GraftManifest(
      version = (j \ "version").extract[String],
      elements = els,
      attrs = (j \ "attrs").extract[Map[String, String]],
      freeAttrs = (j \ "freeAttrs") match {
        case o: JObject => o
        case _ => JObject()
      })
  }
}
