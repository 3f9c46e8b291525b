package graft.operators

import graft.QueryDef

object EventOps {
  val all: Seq[QueryDef] = Seq()
}
