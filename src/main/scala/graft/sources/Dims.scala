package graft.sources

/** Shared CF auxiliary-coordinate dimension matching: the indices of
  * `sub` within `full` when `sub` is a NON-EMPTY order-preserving
  * subsequence (2-D `latitude[y, x]` beside `sst[time, y, x]`). Scalars
  * (empty `sub` — grid_mapping/crs container variables) are never
  * auxiliaries: None. */
object Dims {
  def subsequenceIdx[A](sub: Seq[A], full: Seq[A]): Option[Seq[Int]] = {
    if (sub.isEmpty) return None
    val out = Seq.newBuilder[Int]
    var i = 0
    var ok = true
    sub.foreach { a =>
      while (i < full.size && full(i) != a) i += 1
      if (i == full.size) ok = false
      else { out += i; i += 1 }
    }
    if (ok) Some(out.result()) else None
  }
}
