package graft

/** Locations of external test fixtures. The ECG5000 file ships with the
  * reference checkout, not this repo — suites that need it `assume` its
  * presence (skip, not fail, when the checkout is absent) and honor
  * `GRAFT_ECG5000_TSV` to point elsewhere.
  */
object TestData {
  val ecg5000Path: String =
    sys.env.getOrElse("GRAFT_ECG5000_TSV", "/root/reference/ECG5000/ECG5000_TRAIN.tsv")

  def ecg5000Available: Boolean = new java.io.File(ecg5000Path).isFile
}
