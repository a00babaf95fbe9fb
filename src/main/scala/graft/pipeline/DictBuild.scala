package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dictionary source readers and set-algebra (SURVEY.md §2.1 S4–S8,
  * §2.5 A1–A3), as DataFrame pipelines over the reference's file
  * formats. All readers end in the same normalized shape
  * `(form string, label string)`; `build` aggregates to the dict table
  * `(form, labels array<string>)` used for broadcast.
  *
  * Scale: these are metadata-sized inputs, but the pipelines are still
  * fully distributed (csv scan → filter → aggregate) so a 10^8-row
  * lexicon would stream through the same code.
  */
object DictBuild {

  /** PoliMorf TSV `form base tag cat`: keep (form, cat) where cat is a
    * proper-name category (/root/reference/src/NLP/Nerf/Dict.hs:43-51).
    */
  def readPoliMorf(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").csv(path)
      .toDF("form", "base", "tag", "cat")
      .where(col("cat") =!= "pospolita" && col("cat") =!= "")
      .select(col("form"), col("cat").as("label"))

  /** Prolexbase TSV `form base tag cat` -> (form, cat)
    * (/root/reference/src/NLP/Nerf/Dict/Prolexbase.hs:15-21).
    */
  def readProlexbase(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").csv(path)
      .toDF("form", "base", "tag", "cat")
      .select(col("form"), col("cat").as("label"))

  /** NELexicon lines `type;form` — the form is everything after the
    * first separator (/root/reference/src/NLP/Nerf/Dict/NELexicon.hs:14-20).
    */
  def readNELexicon(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(
        substring_index(col("value"), ";", 1).as("label"),
        expr("substring(value, instr(value, ';') + 1)").as("form"))
      .where(col("form") =!= "")
      .select("form", "label")

  /** PNET trigger TSV `orth base tag typ neTyp example`; `typ` splits
    * internal vs external triggers
    * (/root/reference/src/NLP/Nerf/Dict/PNET.hs:18-53, Dict.hs:61-79).
    */
  def readPNET(spark: SparkSession, path: String, typ: String): DataFrame =
    spark.read.option("sep", "\t").csv(path)
      .toDF("orth", "base", "tag", "typ", "neTyp", "example")
      .where(col("typ") === typ)
      .select(col("orth").as("form"), col("neTyp").as("label"))

  /** PNEG pre-flattened TSV `form<TAB>type` (FIXTURES.md §3); the real
    * LMF XML format is handled by [[readPNEGXml]].
    */
  def readPNEG(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").csv(path)
      .toDF("form", "label")

  // --- PNEG LMF XML ---------------------------------------------------

  private val FeatRe = "<feat\\b([^>]*?)/?>".r
  private val AttrRe = "([\\w:]+)\\s*=\\s*\"([^\"]*)\"".r
  private val WordElemRe = "(?s)<(Lemma|WordForm)\\b[^>]*>(.*?)</\\1>".r
  private val SenseRe = "(?s)<Sense\\b[^>]*>(.*?)</Sense>".r

  /** First `<feat att="wanted" val="..."/>` value inside `chunk`. */
  private def featVal(chunk: String, wanted: String): Option[String] =
    FeatRe.findAllMatchIn(chunk).flatMap { m =>
      val attrs = AttrRe.findAllMatchIn(m.group(1))
        .map(a => a.group(1) -> a.group(2)).toMap
      if (attrs.get("att").contains(wanted)) attrs.get("val") else None
    }.nextOption()

  /** Parse one `<LexicalEntry>` block into (form, label) pairs: every
    * `Lemma`/`WordForm` contributes its `writtenForm` feat; the label is
    * the Sense's `externalReference` feat, falling back to a `label`
    * feat (/root/reference/src/NLP/Nerf/Dict/PNEG.hs:22-34).
    */
  def parseLmfEntry(entry: String): Seq[(String, String)] = {
    val words = WordElemRe.findAllMatchIn(entry)
      .flatMap(m => featVal(m.group(2), "writtenForm")).toVector
    val sense = SenseRe.findFirstMatchIn(entry)
      .flatMap(m => featVal(m.group(1), "externalReference"))
      .orElse(featVal(entry, "label"))
    sense match {
      case Some(l) => words.map(w => (graft.core.Xces.unescapeXml(w), l))
      case None => Vector.empty
    }
  }

  /** S5 PNEG LMF XML reader
    * (/root/reference/src/NLP/Nerf/Dict/PNEG.hs:19-44). The file is
    * split DISTRIBUTED on `</LexicalEntry>` boundaries (Spark's `lineSep`
    * text scan), so a multi-GB lexicon parses in parallel without ever
    * materializing the document on one machine; each chunk is then
    * tag-soup parsed per-row.
    */
  def readPNEGXml(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("lineSep", "</LexicalEntry>").text(path)
      .as[String]
      .flatMap(parseLmfEntry _)
      .toDF("form", "label")
  }

  /** `atomic` filter: single-word forms only
    * (/root/reference/src/NLP/Nerf/Dict.hs:25-26, Dict/Base.hs:43-44).
    */
  def atomic(df: DataFrame): DataFrame =
    df.where(size(split(col("form"), " ")) === 1)

  /** A1 `fromPairs`: group forms, union label sets
    * (/root/reference/src/NLP/Nerf/Dict/Base.hs:63-71).
    */
  def build(pairs: DataFrame): DataFrame =
    pairs.groupBy("form")
      .agg(sort_array(collect_set(col("label"))).as("labels"))

  /** A2 `merge`: n-way union with per-key set union
    * (/root/reference/src/NLP/Nerf/Dict/Base.hs:86-97).
    */
  def merge(dicts: Seq[DataFrame]): DataFrame =
    build(dicts.map(_.select("form", "label")).reduce(_ unionByName _))

  /** A3 `diff`: disambiguate sources by prefixing labels with the dict
    * ordinal (/root/reference/src/NLP/Nerf/Dict/Base.hs:101-116).
    */
  def diff(dicts: Seq[DataFrame]): DataFrame =
    build(dicts.zipWithIndex.map { case (d, i) =>
      d.select(col("form"), concat(lit(s"$i:"), col("label")).as("label"))
    }.reduce(_ unionByName _))

  /** Distributed dict-feature lookup for lexicons ABOVE the broadcast
    * budget (`CompactDict.MaxBroadcastEntries`): a plain left join of
    * the token table against the dict table on the surface form, so a
    * 10^8-form lexicon is co-shuffled instead of materialized on every
    * executor. Catalyst picks the join strategy by size — a small dict
    * still broadcasts (the q04 shape), a huge one sort-merge-joins.
    * Missing forms get an EMPTY label array, mirroring
    * `CompactDict.getOrElse(form, Nil)` so the two paths are
    * feature-for-feature interchangeable.
    */
  def lookupJoin(tokens: DataFrame, tokenCol: String, dict: DataFrame,
                 out: String = "dict_labels"): DataFrame = {
    val d = dict.select(col("form").as(tokenCol), col("labels").as(out))
    tokens.join(d, Seq(tokenCol), "left")
      .withColumn(out, coalesce(col(out), typedLit(Seq.empty[String])))
  }

  /** Collect a (small) dict table to the broadcast-map shape used by the
    * feature schema. The caller is responsible for size discipline —
    * dicts are KB-scale by contract (SURVEY.md §1.4); `CompactDict`
    * enforces the hard budget and points oversized lexicons at
    * [[lookupJoin]].
    */
  def toBroadcastMap(dict: DataFrame): Map[String, List[String]] =
    dict.collect().map { r =>
      r.getString(0) -> r.getSeq[String](1).toList
    }.toMap

  /** S10 dict save/load: the reference binary-serializes its DAWG
    * (/root/reference/src/NLP/Nerf/Dict/Base.hs:78-83); ours is a
    * parquet table.
    */
  def saveDict(dict: DataFrame, path: String): Unit =
    dict.write.mode("overwrite").parquet(path)

  def loadDict(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** A7 dict stats: forms / labels / avg labels-per-form — the
    * counterpart of the reference's automaton-size diagnostics
    * (/root/reference/app/Main.hs:219-221).
    */
  def stats(dict: DataFrame): DataFrame = {
    val a = dict.agg(
      count(lit(1)).as("n_forms"),
      coalesce(sum(size(col("labels"))), lit(0L)).cast("long").as("n_entries"))
    val b = dict.select(explode(col("labels")).as("l"))
      .agg(countDistinct(col("l")).as("n_distinct_labels"))
    a.crossJoin(b)
  }
}
