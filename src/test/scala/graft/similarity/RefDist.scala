package graft.similarity

/** The CellArgmin expanded-form distance, reimplemented independently
  * for spec-side cross-checks: d = (Σv² − 2·Σv·c) + Σc², each sum
  * left-to-right — the operand order BOTH engines and the DuckDB
  * oracles are pinned to. One copy only: KMeansSpec and PqSpec gate the
  * same arithmetic contract, and two hand-maintained copies could
  * drift apart.
  */
private[similarity] object RefDist {

  def sqDist(v: Array[Double], c: Seq[Double]): Double = {
    var vv = 0.0; var vc = 0.0; var cc = 0.0; var i = 0
    while (i < v.length) { vv += v(i) * v(i); i += 1 }
    i = 0
    while (i < v.length) { vc += v(i) * c(i); i += 1 }
    i = 0
    while (i < c.length) { cc += c(i) * c(i); i += 1 }
    (vv - 2.0 * vc) + cc
  }
}
