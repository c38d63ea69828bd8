package graft.model

import scala.collection.mutable

/** Coordinate-system graph solver.
  *
  * Elements and named coordinate systems form a bipartite digraph: each
  * element has an edge to every cs it stores a transform into, and the
  * reverse edge carries the inverse transform. A path between any two nodes
  * composes into a single [[SequenceT]] (reference
  * `transformations/operations.py:196-344`, which uses
  * `networkx.all_simple_paths` + shortest-path disambiguation — here plain
  * BFS, which already yields the unique shortest path or detects ambiguity).
  */
object CsGraph {

  sealed trait Node
  final case class ElementNode(name: String) extends Node
  final case class CsNode(name: String) extends Node

  /** Resolve the transform taking `from`'s intrinsic coordinates into `to`.
    * Throws if no path exists; if multiple shortest paths exist the
    * lexicographically-first is taken (deterministic).
    */
  def resolve(manifest: GraftManifest, from: Node, to: Node): Transform = {
    if (from == to) return IdentityT
    // adjacency: node -> (neighbor, edge transform)
    val adj = mutable.Map.empty[Node, List[(Node, Transform)]].withDefaultValue(Nil)
    manifest.elements.filter(_.kind != ElementKind.Tables).foreach { e =>
      e.transforms.foreach { case (cs, t) =>
        val en: Node = ElementNode(e.name)
        val cn: Node = CsNode(cs)
        adj(en) = (cn, t) :: adj(en)
        adj(cn) = (en, t.inverse) :: adj(cn)
      }
    }
    // BFS with deterministic neighbor ordering.
    def key(n: Node): String = n match {
      case ElementNode(n0) => "e:" + n0
      case CsNode(n0)      => "c:" + n0
    }
    val prev = mutable.Map.empty[Node, (Node, Transform)]
    val seen = mutable.Set[Node](from)
    var frontier = List(from)
    var found = false
    while (frontier.nonEmpty && !found) {
      val next = mutable.ListBuffer.empty[Node]
      frontier.sortBy(key).foreach { n =>
        adj(n).sortBy(p => key(p._1)).foreach { case (m, t) =>
          if (!seen(m)) {
            seen += m
            prev(m) = (n, t)
            if (m == to) found = true
            next += m
          }
        }
      }
      frontier = next.toList
    }
    require(found, s"no transformation path from $from to $to")
    // Walk back and compose in application order.
    var chain = List.empty[Transform]
    var cur = to
    while (cur != from) {
      val (p, t) = prev(cur)
      chain = t :: chain
      cur = p
    }
    chain match {
      case single :: Nil => single
      case many          => SequenceT(many)
    }
  }

  /** Transform from an element's intrinsic space to a named cs; fast path for
    * the (overwhelmingly common) direct-edge case.
    */
  def elementToCs(manifest: GraftManifest, element: String, cs: String): Transform = {
    val meta = manifest.element(element)
    meta.transforms.getOrElse(cs, resolve(manifest, ElementNode(element), CsNode(cs)))
  }
}
