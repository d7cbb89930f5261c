package graft.queries
import graft.Q
object WindowQueries { val all: Seq[Q] = Seq() }
