package graft

import graft.sources.CsvIngest
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The CSV oracle's load-bearing assumption, property-pinned: for every
  * line shape the staged drop can contain — the rendering grammar plus
  * arbitrary truncation and the doc_id drift — the LINE GRAMMAR's
  * validity verdict (what the DuckDB oracle computes) must equal
  * univocity's PERMISSIVE parse verdict (what the engine computes:
  * 3 tokens + an integral doc_id). A Spark upgrade or option change
  * that shifts univocity's edge behavior fails HERE on a shrunk
  * counterexample, not as an opaque hash mismatch at the gate.
  *
  * One spark.read.csv per generated line keeps the property honest
  * (batching would amortize but couple the cases); the generator count
  * is kept modest for suite time.
  */
object CsvGrammarProps extends Properties("CsvGrammar") {
  private lazy val spark = TestSpark.spark

  // text material: printable ASCII plus the characters the quoting
  // machinery exists for
  private val textChar: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    1 -> Gen.const(' '),
    1 -> Gen.const(','),
    1 -> Gen.const('"'),
    1 -> Gen.oneOf('.', '!', '?', ':', '/', '\\'))
  private val rawText: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, textChar).map(_.mkString))
  private val lang: Gen[String] = Gen.oneOf("en", "fr", "de", "")

  /** The drop's rendering rule ([[CsvIngest.ensureCsvDrop]]'s quoting,
    * minus the corpus-only sanitize step — generated text carries no
    * newlines by construction). */
  private def render(id: String, text: String, lg: String): String =
    id + ",\"" + text.replace("\"", "\"\"") + "\"," + lg

  // drop-reachable ids only: the rendering always leads with the
  // rendered doc_id (digits) or the planted drift, and truncation only
  // shortens from the RIGHT — an empty id field never occurs (univocity
  // would read it as a VALID null-id row, a shape the gate never sees)
  private val line: Gen[String] = for {
    id <- Gen.oneOf(
      Gen.chooseNum(0L, 999999L).map(_.toString),
      Gen.const("id-7")) // the planted drift
    t <- rawText
    lg <- lang
    full = render(id, t, lg)
    cut <- Gen.chooseNum(1, full.length)
    truncate <- Gen.frequency(2 -> false, 1 -> true)
  } yield if (truncate) full.substring(0, cut) else full

  private val LinePattern = java.util.regex.Pattern.compile(CsvIngest.LineRe)

  /** The oracle's `parseable` predicate re-expressed: grammar match plus
    * an integral id field. `toLongOption` mirrors both TRY_CAST and
    * univocity's Long conversion on every drop-reachable id shape
    * (digits, possibly truncated; the drift prefix) — exotic forms
    * DuckDB's cast would also take (' 7') are unreachable in the drop
    * and excluded by the generator, not by this predicate. */
  private def grammarValid(l: String): Boolean = {
    val m = LinePattern.matcher(l)
    m.matches() && m.group(1).toLongOption.isDefined
  }

  private def univocityValid(l: String): Boolean = {
    val ds = spark.createDataset(Seq(l))(org.apache.spark.sql.Encoders.STRING)
    val row = spark.read.schema(CsvIngest.corruptSchema)
      .options(CsvIngest.readOptions)
      .csv(ds)
      .collect()
    // the reader never drops a line (blank lines cannot be generated:
    // every line starts with a digit or 'i' or ',')
    row.length == 1 && row.head.isNullAt(3)
  }

  property("grammar validity == univocity PERMISSIVE verdict on drop-shaped lines") =
    forAll(line) { l =>
      grammarValid(l) == univocityValid(l)
    }
}
