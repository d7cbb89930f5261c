package graft.queries
import graft.Q
object RefMartQueries { val all: Seq[Q] = Seq() }
