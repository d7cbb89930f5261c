package graft.queries
import graft.Q
object EventQueries { val all: Seq[Q] = Seq() }
