package graft.operators

/** The committed BPE fixture table: the verbatim output of
  * `Bpe.train(sf0.001 documents, "text", 48)` — 48 ranked merges over
  * the smallest driver-generated corpus. DERIVED, not authored: BpeSpec
  * re-runs the trainer over the same corpus and asserts equality, so
  * any drift between this constant, the trainer, and the corpus fails
  * the suite. ns78 embeds the same table as a VALUES literal in its
  * oracle SQL (see TextQueries), which is why it must be a committed
  * constant rather than trained at query time: the oracle's SQL text is
  * static, and a table trained per scale factor would diverge from it.
  *
  * Regenerate after a corpus or trainer change with
  * {{{ sbt "runMain graft.operators.FixtureMerges" }}}
  * and paste the printed rows.
  */
object FixtureMerges {

  val table: Seq[(String, String)] = Seq(
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"),
    ("s", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("m", "er"), ("a", "t"), ("a", "n"), ("c", "an"),
    ("s", "can"), ("c", "o"), ("co", "lu"), ("colu", "m"),
    ("colum", "n"), ("d", "ow"), ("in", "dow"), ("w", "indow"),
    ("d", "er"), ("or", "der"), ("or", "t"), ("s", "ort"),
    ("par", "t"), ("u", "p"), ("a", "g"), ("ag", "g"),
    ("a", "lu"), ("alu", "e"), ("v", "alue"), ("in", "e"),
    ("l", "ine"), ("e", "y"), ("k", "ey"), ("j", "o"),
    ("jo", "in"), ("g", "e"), ("mer", "ge"), ("er", "y"),
    ("g", "r"), ("gr", "o"), ("gro", "up"), ("q", "u"),
    ("qu", "ery"), ("c", "t"), ("ct", "or"), ("e", "ctor")
  )

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val docs = spark.read.parquet(
      args.headOption.getOrElse("/root/testdata/sf0.001") + "/documents.parquet")
    val merges = Bpe.train(docs, "text", 48)
    println(merges.map { case (l, r) => s"""("$l", "$r")""" }
      .grouped(4).map(_.mkString(", ")).mkString(",\n    "))
    spark.stop()
  }
}
