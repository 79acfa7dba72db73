package graft.queries

object QScalar extends Registry {
  def qs: Seq[Q] = Seq()
}
