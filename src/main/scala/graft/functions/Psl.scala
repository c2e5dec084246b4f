package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Public-Suffix-List registrable domains as a BROADCAST TABLE — the
  * production upgrade of [[UrlOps.registeredDomain]]'s inline ccSLD list
  * (which stays the zero-dependency default).
  *
  * The PSL (publicsuffix.org) is a few thousand rules in three shapes:
  * plain (`co.uk`), single-label wildcard (`*.ck`), and exception
  * (`!www.ck`). The prevailing rule for a host is the exception if one
  * matches, else the matching rule with the most labels, else the implicit
  * `*` (every unlisted TLD is itself a public suffix). The public suffix is
  * the prevailing rule's labels (minus its leftmost label for an
  * exception); the registrable domain is the public suffix plus one more
  * host label, or NULL when the host IS a public suffix.
  *
  * Scale shape (the reason this is an operator, not a 9000-branch
  * expression): DISTINCT hosts (≪ rows in any crawl) explode to at most
  * 2·min(labels, 8) candidate suffix strings each, equi-join the broadcast
  * rule table, one map-side-combined max picks the prevailing rule, and
  * the result joins back to the input — no rule-count-sized expression
  * tree, no per-row loop, and a full upstream list changes nothing but the
  * broadcast's size. Rules are parsed driver-side (the upstream file is
  * ~240 KB — bounded by contract, like a codebook).
  *
  * Reference behavior anchor: vector-graph-rag stores URL-keyed corpora
  * (api/app.py ingestion paths); per-domain caps and domain dedup on such
  * corpora are standard curation steps (C4/RefinedWeb) that need the
  * registrable domain, not the raw host.
  */
object Psl {

  /** One parsed rule: labels WITHOUT any '!' prefix, label count, and
    * whether the rule is an exception. */
  final case class Rule(rule: String, nlab: Int, exc: Boolean)

  /** Parse upstream-format PSL text: blank and '//' lines dropped, '!'
    * marks exceptions, rules lowercased. Section markers are comments. */
  def parseRules(lines: Iterator[String]): Seq[Rule] =
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).map { l =>
      val exc = l.startsWith("!")
      val r = (if (exc) l.substring(1) else l).toLowerCase
      Rule(r, r.count(_ == '.') + 1, exc)
    }.toSeq.distinct

  /** The bundled snapshot (subset; see psl_snapshot.dat's header). */
  def snapshotRules(): Seq[Rule] = {
    val in = getClass.getResourceAsStream("/graft/psl_snapshot.dat")
    require(in != null, "psl_snapshot.dat missing from classpath")
    try parseRules(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** Parse a full upstream public_suffix_list.dat from local disk. */
  def loadFile(path: String): Seq[Rule] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parseRules(src.getLines()) finally src.close()
  }

  /** Rules as a DataFrame(rule, nlab, exc) ready to broadcast. */
  def rulesDf(spark: SparkSession, rules: Seq[Rule]): DataFrame = {
    import spark.implicits._
    rules.toDF("rule", "nlab", "exc")
  }

  private val MaxLabels = 8 // longest upstream rules have 5 labels

  /** Adds `outCol` = PSL registrable domain of `hostCol` (NULL when the
    * host is itself a public suffix, empty, null, or malformed — an empty
    * label anywhere, e.g. `a..com` or `.com`, must never classify as a
    * bogus implicit-`*` suffix). One trailing dot is DNS root notation
    * (`example.com.`) and classifies as its dotless form. Matching is
    * case-insensitive; the original column is untouched. Raw-Unicode (IDN)
    * hosts are punycode-normalized first ([[UrlOps.idnToAscii]] — the PSL's
    * canonical rule form is ACE), a byte-identity no-op on ASCII hosts. */
  def registeredDomain(df: DataFrame, hostCol: String, rules: DataFrame,
                       outCol: String = "psl_domain"): DataFrame = {
    val hostKey = UrlOps.idnToAscii(lower(col(hostCol)))
    val hosts = df.select(hostKey.as("__host"))
      .where(col("__host").isNotNull && col("__host") =!= "")
      .distinct()
      .withColumn("__l", split(regexp_replace(col("__host"), "\\.$", ""), "\\."))
      .withColumn("__n", size(col("__l")))
      .withColumn("__bad", exists(col("__l"), t => t === ""))
    // Candidate suffix strings per host: the k-label tail for k = 1..K and
    // its wildcard form ('*' replacing the tail's leftmost label).
    val ks = sequence(lit(1), least(col("__n"), lit(MaxLabels)))
    val exacts = transform(ks, k => array_join(slice(col("__l"), -k, k), "."))
    val wilds = transform(ks, k =>
      when(k === 1, lit("*")).otherwise(
        concat(lit("*."), array_join(slice(col("__l"), -(k - 1), k - 1), "."))))
    val cands = hosts.filter(!col("__bad")).select(col("__host"),
        explode(concat(exacts, wilds)).as("rule"))
    // Prevailing rule per host: exceptions beat everything, then most
    // labels; ps = public-suffix label count (exception drops its leftmost
    // label). No match → the implicit '*' rule (ps = 1).
    val best = cands.join(broadcast(rules), Seq("rule"))
      .groupBy("__host")
      .agg(max(struct(col("exc").cast("int").as("e"), col("nlab").as("k"))).as("b"))
      .select(col("__host"),
        when(col("b.e") === 1, col("b.k") - 1).otherwise(col("b.k")).as("__ps"))
    val mapping = hosts.join(best, Seq("__host"), "left")
      .withColumn("__ps", coalesce(col("__ps"), lit(1)))
      .select(col("__host"),
        when(!col("__bad") && col("__n") > col("__ps"),
          array_join(slice(col("__l"), -(col("__ps") + 1), col("__ps") + 1), "."))
          .as(outCol))
    df.join(mapping, hostKey === col("__host"), "left")
      .drop("__host")
  }
}
