package graft.queries
import graft.Q
object VectorQueries { val all: Seq[Q] = Seq() }
