package graft.queries
import graft.Q
object BreadthQueries { val all: Seq[Q] = Seq() }
