package graft.queries

object QSetSortPivot extends Registry {
  def qs: Seq[Q] = Seq()
}
