package graft.origin

import scala.collection.mutable

import graft.model.StarTable

/** A node in the location forest: a load location (file/folder) or a leaf
  * block with its table (reference: pdtable/io/load/_tree.py:20-55).
  */
final class LocationTreeNode(
    val location: AnyRef, // LoadLocation or LocationBlock
    val table: Option[StarTable] = None
) {
  var parent: Option[LocationTreeNode] = None
  val children: mutable.ArrayBuffer[LocationTreeNode] = mutable.ArrayBuffer.empty

  def addChild(c: LocationTreeNode): Unit = { c.parent = Some(this); children += c }

  def render(indent: Int = 0): String = {
    val pad = "  " * indent
    val label = location match {
      case b: LocationBlock => s"$b" + table.map(t => s" [table ${t.name}]").getOrElse("")
      case l: LoadLocation  => l.loadIdentifier
      case other            => other.toString
    }
    (s"$pad$label" +: children.map(_.render(indent + 1)).toSeq).mkString("\n")
  }
}

object LocationTree {

  /** Invert per-table origins into a file/folder forest
    * (reference: pdtable/io/load/_tree.py:58-116 make_location_trees).
    * Relies on load_identifier uniqueness per LocationFile. */
  def makeLocationTrees(tables: Seq[StarTable]): Seq[LocationTreeNode] = {
    val buf = mutable.LinkedHashMap.empty[String, LocationTreeNode]

    def registerNode(location: LoadLocation, child: LocationTreeNode): Unit = {
      buf.get(location.loadIdentifier) match {
        case Some(node) => node.addChild(child)
        case None =>
          val node = new LocationTreeNode(location)
          node.addChild(child)
          buf(location.loadIdentifier) = node
          location.loadItem.source.foreach(src => registerNode(src, node))
      }
    }

    tables.foreach { t =>
      val loc = t.meta.origin.inputLocation.getOrElse(
        throw new IllegalArgumentException(
          s"Table '${t.name}' without input location not supported for makeLocationTrees"))
      val leaf = new LocationTreeNode(loc, Some(t))
      registerNode(loc.sheet.file, leaf)
    }
    buf.values.filter(_.parent.isEmpty).toSeq
  }
}
