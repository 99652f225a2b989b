package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language-ID, document fingerprinting.
  * All are narrow per-row transforms (no shuffle) built from codegen'd
  * built-ins where possible; UDFs only where a loop is genuinely needed
  * (language-ID profile scoring, rolling hash).
  */
object TextOps extends Serializable {

  /** Whitespace/punctuation tokenizer with exact ANSI-SQL parity
    * (`regexp_split_to_array(lower(x), '[^a-z0-9]+')` in DuckDB) — used by
    * the oracle-checked queries. The code-aware analyzer for the search
    * engine is [[graft.analyze.Tokenizer]]; this one is deliberately the
    * simplest cross-engine-reproducible split. */
  def simpleTokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 0)

  /** A small English stopword set for quality ratios (public knowledge). */
  val stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "in",
    "on", "to", "is", "are", "was", "for", "with", "as", "at", "by", "it")

  /** Quality features per document: lengths, punctuation ratio, stopword
    * ratio, mean token length — the classic cheap quality filters. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val toks = simpleTokens(col(textCol))
    val sw = typedLit(stopwords)
    df.withColumn("n_chars_calc", length(col(textCol)).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("punct_ratio", round(
        (length(col(textCol)) - length(regexp_replace(col(textCol), "[^a-zA-Z0-9 ]", ""))).cast("double") /
          greatest(length(col(textCol)), lit(1)), 4))
      .withColumn("stopword_ratio", round(
        size(filter(toks, t => array_contains(sw, t))).cast("double") /
          greatest(size(toks), lit(1)), 4))
      .withColumn("mean_token_len", round(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          greatest(size(toks), lit(1)), 4))
  }

  /** Linear text-classifier scoring — the fastText/CCNet quality-filter
    * shape: `score = sigmoid(bias + Σ_t weight(t) · tf(t) / |tokens|)`
    * over [[simpleTokens]], with `weights` a (term, weight) vocabulary
    * table. Scale shape: the vocabulary broadcasts (a trained quality
    * classifier is a few hundred thousand rows — executor-memory small at
    * any corpus size), tokens explode narrowly with `explode_outer` (so
    * empty documents still score `sigmoid(bias)`), the left join against
    * the broadcast vocabulary is map-side, and the per-doc sum partial-
    * aggregates before the only shuffle — slim (id, partial-sum) rows,
    * never text. Score rounded to 6 decimals (cross-engine parity, the
    * [[qualityFeatures]] convention). */
  def classifierScore(df: DataFrame, idCol: String, textCol: String,
                      weights: DataFrame, bias: Double = 0.0): DataFrame = {
    val toks = simpleTokens(col(textCol))
    df.select(col(idCol), greatest(size(toks), lit(1)).as("n_toks"),
        explode_outer(toks).as("term"))
      .join(broadcast(weights.select(col("term"), col("weight"))), Seq("term"), "left")
      .groupBy(idCol)
      .agg(round(lit(1.0) / (lit(1.0) + exp(-(
        sum(coalesce(col("weight"), lit(0.0)) / col("n_toks")) + lit(bias)))), 6)
        .as("score"))
  }

  /** Feature-hashed TF-IDF document vectors — the model-free text →
    * embedding bridge into the [[Similarity]] ops (cosine top-k, LSH/IVF
    * ANN): `vec[h(term) mod dim] += tf(term) · idf(term)` with the smooth
    * idf `ln((N+1)/(df+1)) + 1`, emitted as `Array[Float]` (the
    * embeddings-table storage type; sums run in double, one cast at the
    * end). Totality: documents with no tokens get the zero vector.
    *
    * Scale shape: with no supplied vocabulary this is the standard
    * TWO-PASS distributed tf-idf — pass 1 tokenizes and aggregates the
    * (term, df) vocabulary, pass 2 re-tokenizes and builds the vectors
    * (recomputing a columnar scan beats caching exploded token rows at
    * corpus scale) — plus `df.count()` for N (parquet-footer cheap on a
    * scan; one narrow pass otherwise). To embed repeatedly or score new
    * documents, compute [[tfidfVocab]] once, stage it, and pass it back
    * (the q57 shape): then ONE corpus pass remains — the (id, term) tf
    * aggregate and the (id, bucket) sum, both map-side partial, with the
    * vocabulary join AQE-broadcast whenever it fits. */
  def hashedTfidf(df: DataFrame, idCol: String, textCol: String,
                  dim: Int = 256, vocab: Option[DataFrame] = None): DataFrame = {
    require(dim > 0)
    // a trained vocab hashed at a different dim would silently drop every
    // bucket >= dim from the vectors — fail loudly instead (slim agg)
    vocab.foreach { v =>
      val maxB = v.agg(max(col("bucket"))).head().getInt(0)
      require(maxB < dim,
        s"vocab has bucket $maxB but dim=$dim — was it built at another dim?")
    }
    val voc = vocab.getOrElse(tfidfVocab(df, idCol, textCol, dim))
    val vecs = tfRows(df, idCol, textCol).join(voc, Seq("term"))
      .groupBy("id", "bucket").agg(sum(col("tf") * col("idf")).as("w"))
      .groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("w")))).as("m"))
      .select(col("id"), transform(sequence(lit(0), lit(dim - 1)),
        i => coalesce(element_at(col("m"), i), lit(0.0)).cast("float")).as("vec"))
    df.select(col(idCol).as("id")).join(vecs, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("vec"), array_repeat(lit(0.0f), dim)).as("vec"))
  }

  /** The (term, idf, bucket) vocabulary [[hashedTfidf]] scores with,
    * exposed so hash-defined verification can stage it — and so a
    * corpus-trained vocabulary can embed NEW documents consistently
    * (pass it back via `hashedTfidf(..., vocab = Some(v))`). */
  def tfidfVocab(df: DataFrame, idCol: String, textCol: String,
                 dim: Int = 256): DataFrame = {
    val n = df.count()
    tfRows(df, idCol, textCol)
      .groupBy("term").agg(count(lit(1)).cast("double").as("df_t"))
      .select(col("term"),
        (log((lit(n) + 1.0) / (col("df_t") + 1.0)) + 1.0).as("idf"),
        pmod(xxhash64(col("term")), lit(dim.toLong)).cast("int").as("bucket"))
  }

  private def tfRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), explode(simpleTokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).cast("double").as("tf"))

  /** Gopher's required stopwords (Rae et al. 2021, Table A1): a doc is
    * expected to contain at least 2 of these common English words. */
  val gopherRequiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The REST of the Gopher quality rule inputs (Rae et al. 2021, Table
    * A1), completing [[qualityFeatures]]: symbol-to-word ratio (`#` chars
    * plus non-overlapping `...` occurrences over word count), fraction of
    * non-blank lines starting with a bullet (`-`/`*`) or ending with an
    * ellipsis, fraction of words containing an alphabetic character, and
    * the count of required stopwords present. Pure codegen'd built-ins —
    * narrow per-row transform, ANSI-SQL-reproducible (pinned by q48). */
  def gopherQualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    val toks = simpleTokens(c)
    val nWords = size(toks)
    val lines = filter(split(c, "\n"), l => length(trim(l)) > 0)
    // '#' count and non-overlapping '...' count, both as length deltas —
    // the greedy left-to-right scan regexp_replace and SQL replace() share
    val hashes = length(c) - length(regexp_replace(c, "#", ""))
    val ellipses = (length(c) - length(regexp_replace(c, "\\.\\.\\.", ""))) / lit(3)
    df.withColumn("n_words", nWords.cast("long"))
      .withColumn("symbol_word_ratio", round(
        (hashes + ellipses).cast("double") / greatest(nWords, lit(1)), 4))
      .withColumn("bullet_line_frac", round(
        size(filter(lines, l => l.rlike("^\\s*[-*]"))).cast("double") /
          greatest(size(lines), lit(1)), 4))
      .withColumn("ellipsis_line_frac", round(
        size(filter(lines, l => l.rlike("\\.\\.\\.\\s*$"))).cast("double") /
          greatest(size(lines), lit(1)), 4))
      .withColumn("alpha_word_frac", round(
        size(filter(toks, t => t.rlike("[a-z]"))).cast("double") /
          greatest(nWords, lit(1)), 4))
      .withColumn("req_stopword_hits",
        size(filter(typedLit(gopherRequiredStopwords),
          w => array_contains(toks, w))).cast("long"))
  }

  // ---- sequence packing ----

  /** GPT-style sequence-packing PLAN: concatenate documents in a
    * deterministic order and cut the token stream at fixed `seqLen`
    * boundaries (documents span chunks; nothing is padded or dropped).
    * Returns one row per doc with its placement:
    * (id, grp, n_tokens, start_off, chunk_first, chunk_last) — chunk ids
    * are (grp, chunk) pairs; `start_off` is the doc's token offset inside
    * its group's stream.
    *
    * Scale shape: a truly global concatenation order would serialize the
    * corpus through one partition, so docs are first hash-assigned to
    * `groups` independent pack streams (xxhash64 — deterministic and
    * resharding-invariant, like [[assignSplit]]) and the running offset is
    * a window cumsum per group: one shuffle on grp, `groups`-way parallel,
    * and re-running on re-partitioned input yields byte-identical packing.
    * Token counts use [[simpleTokens]]; swap in a real tokenizer count
    * upstream by pre-computing an `n_tokens` column and calling with
    * `tokenCountCol`. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    seqLen: Int, groups: Int = 64,
                    tokenCountCol: String = ""): DataFrame = {
    require(seqLen > 0 && groups > 0)
    val n =
      if (tokenCountCol.nonEmpty) col(tokenCountCol).cast("long")
      else size(simpleTokens(col(textCol))).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(idCol).as("id"), n.as("n_tokens"))
      .withColumn("grp", pmod(xxhash64(col("id")), lit(groups.toLong)).cast("int"))
      .withColumn("start_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("chunk_first", floor(col("start_off") / seqLen).cast("long"))
      .withColumn("chunk_last",
        when(col("n_tokens") > 0,
          floor((col("start_off") + col("n_tokens") - 1) / seqLen))
          .otherwise(floor(col("start_off") / seqLen)).cast("long"))
  }

  /** BPE-ish subword count: alphanumeric runs split at 4-char boundaries
    * plus standalone punctuation marks — a deterministic, tokenizer-free
    * approximation of subword token counts for budgeting. */
  def approxBpeTokenCount(c: Column): Column =
    (aggregate(simpleTokens(c), lit(0L),
      (acc, t) => acc + ceil(length(t).cast("double") / 4.0).cast("long")) +
      length(regexp_replace(c, "[a-zA-Z0-9\\s]", "")).cast("long"))

  // ---- language ID (n-gram heuristic) ----

  /** Tiny per-language character/stopword profiles. A real pipeline ships
    * fastText-style models; the heuristic keeps the operator deterministic
    * and dependency-free while exercising the same plumbing. */
  private[graft] val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " is ", " to ", "th", "er", "on"),
    "de" -> Seq(" der ", " die ", " und ", " ist ", "sch", "ei", "ch", "en "),
    "fr" -> Seq(" le ", " la ", " et ", " est ", " les ", "ou", "é", "re "),
    "es" -> Seq(" el ", " la ", " y ", " es ", " los ", "ción", "ar ", "os "),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  def detectLang(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val t = " " + text.toLowerCase(java.util.Locale.ROOT) + " "
    var best = "und"
    var bestScore = 0.0
    // deterministic tie-break: iterate keys sorted
    langProfiles.toSeq.sortBy(_._1).foreach { case (lang, grams) =>
      var s = 0.0
      grams.foreach { g =>
        // NON-overlapping occurrences (same greedy left-to-right scan as
        // String.replace), so the score is exactly
        // length(t) - length(replace(t, g, '')) — ANSI-SQL-reproducible
        var idx = t.indexOf(g)
        while (idx >= 0) { s += g.length; idx = t.indexOf(g, idx + g.length) }
      }
      val score = s / t.length
      if (score > bestScore) { best = lang; bestScore = score }
    }
    best
  }

  val detectLangUdf = udf(detectLang _)

  // ---- document fingerprint (rolling hash) ----

  /** 64-bit rolling (polynomial) hash over the token stream — a stable
    * content fingerprint that ignores whitespace/punctuation layout.
    * Null-safe: null (from simpleTokens of a null text) fingerprints as
    * the empty stream. */
  def rollingFingerprint(tokens: Seq[String]): Long = {
    var h = 1469598103934665603L // FNV offset basis
    if (tokens == null) return h
    tokens.foreach { t =>
      var i = 0
      while (i < t.length) { h = (h ^ t.charAt(i)) * 1099511628211L; i += 1 }
      h = (h ^ ' ') * 1099511628211L
    }
    h
  }

  val fingerprintUdf = udf((toks: Seq[String]) => rollingFingerprint(toks))

  def fingerprint(textCol: Column): Column = fingerprintUdf(simpleTokens(textCol))

  /** Exact-sequence duplicate GROUPS by rolling fingerprint — the
    * production form of fingerprint dedup: an exact-dup clique of g docs
    * emits ONE row (fp, rep_id, group_size, ids) instead of g·(g−1)/2
    * pairs (quadratic in output by definition — the pair form is a
    * verification query, not a dedup plan). One hash shuffle on fp;
    * map-side partial aggregation collapses cliques early. */
  def fingerprintDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("group_size"),
        min(col("id")).as("rep_id"),
        array_sort(collect_list(col("id"))).as("ids"))
      .filter(col("group_size") >= 2)

  /** Corpus-level LINE deduplication (the MassiveText/RefinedWeb
    * boilerplate-removal rule): delete every line whose exact text occurs
    * in ≥ `minDocs` DISTINCT documents (headers, footers, nav chrome),
    * preserving the order of the surviving lines. Blank/whitespace-only
    * lines are structure, not boilerplate — never counted, never removed.
    *
    * Scale shape: one narrow posexplode; a (line, id)-distinct + count
    * aggregation (map-side partial combine collapses each partition's
    * repeats before the shuffle — boilerplate is by definition massively
    * repeated, so the exchange carries ~|distinct lines| rows); one
    * equi-join of the frequent-line set back to the exploded rows (AQE
    * broadcasts it when small — boilerplate sets are); one per-doc
    * reassembly aggregation. Nothing all-pairs, nothing driver-side.
    *
    * @return one row per input doc: (id, clean) — docs whose every line
    *         was boilerplate come back as "" (they should then be dropped
    *         by a length filter, the usual pipeline ordering) */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 minDocs: Int = 2): DataFrame =
    dedupUnits(df, idCol, textCol, minDocs, "\n", "\n")

  /** Paragraph-level corpus dedup — the same boilerplate rule one level
    * up (RefinedWeb removes repeated paragraphs as well as lines): units
    * are blank-line-separated paragraphs, paragraphs appearing in ≥
    * `minDocs` distinct docs are stripped everywhere, order preserved.
    * Multi-blank-line separators are normalized to one blank line on
    * rebuild (the split is `\n\n+`). */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
                      minDocs: Int = 2): DataFrame =
    dedupUnits(df, idCol, textCol, minDocs, "\n\n+", "\n\n")

  /** Shared core of [[dedupLines]]/[[dedupParagraphs]]: split each doc
    * into positioned units, count DISTINCT docs per exact unit (blank
    * units never count), strip frequent units from every doc, and rebuild
    * in original order. One unit-keyed shuffle + one per-doc regroup —
    * never doc×doc. Docs that lose every unit (or had null text) come
    * back as "". */
  private def dedupUnits(df: DataFrame, idCol: String, textCol: String,
                         minDocs: Int, splitPattern: String, sep: String): DataFrame = {
    val units = df
      .select(col(idCol).as("id"), posexplode(split(col(textCol), splitPattern, -1)))
      .withColumnRenamed("col", "unit")
    val frequent = units.filter(trim(col("unit")) =!= "")
      .select("unit", "id").distinct()
      .groupBy("unit").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("unit")
    val rebuilt = units.join(frequent, Seq("unit"), "left_anti")
      .groupBy("id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("unit")))),
        x => x.getField("unit")), sep).as("clean"))
    df.select(col(idCol).as("id")).join(rebuilt, Seq("id"), "left")
      .select(col("id"), coalesce(col("clean"), lit("")).as("clean"))
  }

  // ---- text cleaning (C4-style normalization) ----

  private val nfcUdf = udf((s: String) =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))

  /** C4/RefinedWeb-style normalization: strip HTML tags, unescape the
    * common entities (`&amp;` LAST, so a literal `&amp;lt;` surfaces as
    * `&lt;`, not `<`), Unicode-NFC normalize, collapse whitespace runs,
    * trim. Narrow per-row transform; everything except NFC is codegen'd
    * regexp (Spark has no built-in normalizer — the UDF is the justified
    * exception). DuckDB parity (regexp_replace 'g' + replace +
    * nfc_normalize) is pinned by the q39 oracle. */
  def cleanText(c: Column): Column = {
    val noTags = regexp_replace(c, "<[^>]*>", " ")
    val unesc = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (e, r)) => regexp_replace(acc, e, r) }
    trim(regexp_replace(nfcUdf(unesc), "\\s+", " "))
  }

  // ---- PII redaction ----

  /** C4-style PII scrubbing: emails, IPv4 literals, and phone-like digit
    * runs are replaced with typed placeholder tokens (so downstream
    * token statistics remain meaningful). Order matters — emails can
    * embed digits, so they redact FIRST. Pure codegen'd regexp chain
    * (patterns restricted to the regex subset Java and RE2/DuckDB agree
    * on); per-row narrow, no shuffle. DuckDB parity pinned by q43. */
  def redactPii(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\b\\d[\\d\\- ]{7,}\\d\\b", "<PHONE>")
  }

  // ---- repetition features (Gopher-style quality rules) ----

  /** Per-doc repetition statistics over non-empty lines — the Gopher
    * repetition filters' inputs: `dup_line_frac` (fraction of line
    * OCCURRENCES that are repeats) and `dup_line_char_frac` (fraction of
    * line characters inside repeated lines). Narrow per-row transform;
    * the nested occurrence count is O(lines²) per doc against a
    * line-count-bounded document, never cross-doc. */
  def repetitionFeatures(df: DataFrame, textCol: String): DataFrame = {
    val lines = filter(split(col(textCol), "\n"), l => length(l) > 0)
    val charSum = (l: Column) => aggregate(l, lit(0L), (acc, x) => acc + length(x))
    val dupLines = filter(lines, x => size(filter(lines, y => y === x)) > 1)
    df.withColumn("n_lines", size(lines).cast("long"))
      .withColumn("dup_line_frac", round(
        (size(lines) - size(array_distinct(lines))).cast("double") /
          greatest(size(lines), lit(1)), 4))
      .withColumn("dup_line_char_frac", round(
        charSum(dupLines).cast("double") /
          greatest(charSum(lines), lit(1L)), 4))
  }

  /** Gopher's n-gram repetition rules (Rae et al. 2021, Table A1), the
    * companion to [[repetitionFeatures]]' line rules: the char fraction
    * covered by the most frequent {2,3}-gram and by duplicated (count ≥ 2)
    * {5,10}-grams. Conventions (documented because the oracle reproduces
    * them exactly):
    *  - grams are over [[simpleTokens]], joined with single spaces; the
    *    doc char base T = Σ token_len + (n_tokens − 1) (the joined stream)
    *  - frac = count·len(gram)/T for the top gram (occurrences may
    *    overlap, so the product can exceed T — capped at 1), and
    *    Σ count·len over duplicated grams for the dup rules, same cap
    *  - top-gram tie-break: max count, then lexicographically smallest
    *    gram (ASCII-only tokens, so JVM and SQL collation agree)
    *  - docs with fewer than n tokens score 0
    * Narrow per-row UDF (a per-doc hash-count loop has no codegen
    * spelling); never cross-doc, no shuffle. */
  def ngramRepetitionFeatures(df: DataFrame, textCol: String): DataFrame = {
    val f = ngramRepUdf(simpleTokens(col(textCol)))
    df.withColumn("top2_frac", round(f.getField("top2"), 4))
      .withColumn("top3_frac", round(f.getField("top3"), 4))
      .withColumn("dup5_frac", round(f.getField("dup5"), 4))
      .withColumn("dup10_frac", round(f.getField("dup10"), 4))
  }

  private[graft] case class NgramRep(top2: Double, top3: Double,
                                     dup5: Double, dup10: Double)

  private val ngramRepUdf = udf((toksIn: Seq[String]) => {
    val ts = if (toksIn == null) IndexedSeq.empty[String] else toksIn.toIndexedSeq
    val total = math.max(1L, ts.map(_.length.toLong).sum + math.max(0, ts.length - 1))
    def grams(n: Int): collection.Map[String, Int] = {
      val m = new scala.collection.mutable.HashMap[String, Int]()
      var i = 0
      while (i + n <= ts.length) {
        m.updateWith(ts.slice(i, i + n).mkString(" "))(c => Some(c.getOrElse(0) + 1))
        i += 1
      }
      m
    }
    def topFrac(n: Int): Double = {
      val m = grams(n)
      if (m.isEmpty) 0.0
      else {
        val (g, c) = m.minBy { case (g, c) => (-c, g) }
        math.min(1.0, c.toDouble * g.length / total)
      }
    }
    def dupFrac(n: Int): Double = {
      val s = grams(n).iterator.collect { case (g, c) if c >= 2 => c.toLong * g.length }.sum
      math.min(1.0, s.toDouble / total)
    }
    NgramRep(topFrac(2), topFrac(3), dupFrac(5), dupFrac(10))
  })

  // ---- deterministic split assignment ----

  /** Stable train/val/test assignment by 64-bit hash of the id: no RNG
    * state, invariant under reordering/resharding/re-runs — the property
    * a 100 TB pipeline needs so splits never bleed when data is
    * recomputed. Narrow projection (bucket = xxhash64 mod 100); the
    * bucket column is kept so hash-defined verification can stage it. */
  def assignSplit(df: DataFrame, idCol: String,
                  valPct: Int = 5, testPct: Int = 5): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100)
    df.withColumn("bucket", pmod(xxhash64(col(idCol)), lit(100L)).cast("int"))
      .withColumn("split",
        when(col("bucket") < 100 - valPct - testPct, "train")
          .when(col("bucket") < 100 - testPct, "val")
          .otherwise("test"))
  }

  // ---- stratified sampling (data mixing) ----

  /** THE data-mixing hash rule: a row's deterministic bucket in
    * [0, 1e6), shared by [[stratifiedSample]] and [[epochMix]] (and
    * staged by their oracle queries) so the keep/repeat decisions of the
    * two mixing directions agree row-for-row. */
  def mixBucket(idCol: String): Column =
    pmod(xxhash64(col(idCol)), lit(1000000L))

  /** Per-group value lookup as a when-chain (deterministic fold order). */
  private def perGroup(groupCol: String, values: Map[String, Double],
                       default: Double): Column =
    values.toSeq.sortBy(_._1).foldLeft(lit(default)) {
      case (acc, (g, v)) => when(col(groupCol) === g, lit(v)).otherwise(acc)
    }

  /** Deterministic stratified sampling — the data-mixing primitive (keep
    * 100% of one stratum, x% of another): row kept iff its hash bucket
    * falls under its group's rate. xxhash64-based like [[assignSplit]]:
    * no RNG state, invariant under reordering/resharding/re-runs, and the
    * same row is kept or dropped in every recomputation — the property
    * that stops split/sample bleed at 100 TB. Narrow projection, no
    * shuffle; `bucket` (0..999999) is kept so hash-defined verification
    * can stage it.
    *
    * @param rates per-group keep rate in [0,1]; groups absent from the
    *              map use `defaultRate` */
  def stratifiedSample(df: DataFrame, idCol: String, groupCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1))
    df.withColumn("bucket", mixBucket(idCol))
      .withColumn("kept",
        col("bucket") < perGroup(groupCol, rates, defaultRate) * 1000000L)
  }

  /** Fixed-window document chunking with overlap — the embedding/RAG
    * pipeline primitive: chunk i covers characters
    * `[i·(size−overlap), i·(size−overlap)+size)`, so consecutive chunks
    * share `overlap` characters and every character lands in ≥1 chunk.
    * Narrow per-row explode, no shuffle; empty documents yield one empty
    * chunk (total: every doc appears). Character-addressed — not token —
    * so it is exactly reproducible in ANSI SQL (`substr`), the same
    * cross-engine-parity reason [[simpleTokens]] exists; a token-addressed
    * variant composes from [[packSequences]]' offsets. */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                size: Int, overlap: Int = 0): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "need size > 0 and 0 <= overlap < size")
    val stride = size - overlap
    val n = greatest(ceil((length(col(textCol)) - lit(overlap)).cast("double") /
      stride).cast("int"), lit(1))
    df.select(col(idCol), col(textCol))
      .withColumn("chunk_id", explode(sequence(lit(0), n - 1)))
      .withColumn("chunk",
        col(textCol).substr(col("chunk_id") * stride + 1, lit(size)))
      .drop(textCol)
  }

  /** Deterministic epoch-mixture upsampling — the other half of data
    * mixing ([[stratifiedSample]] keeps a fraction; this REPEATS): a group
    * with `epochs = 2.4` contributes every row twice plus a deterministic
    * 40% of rows a third time, so the group's expected multiplicity is
    * exactly 2.4 and the SAME rows carry the extra copy on every run and
    * any resharding (hash-bucketed like [[assignSplit]], no RNG state).
    * Epochs below 1 degrade gracefully to sampling (floor 0 + fractional
    * keep). Output rows carry `copy` (0-based repeat ordinal) so a
    * downstream global shuffle can decorrelate repeats. Narrow: a per-row
    * sequence explode, no shuffle — the multiplicity decision never sees
    * another row. */
  def epochMix(df: DataFrame, idCol: String, groupCol: String,
               epochs: Map[String, Double],
               defaultEpochs: Double = 1.0): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(e => e >= 0 && e <= 100),
      "epochs must be in [0, 100]")
    val eCol = perGroup(groupCol, epochs, defaultEpochs)
    val copies = (floor(eCol).cast("int") +
      (mixBucket(idCol) < (eCol - floor(eCol)) * 1000000L).cast("int"))
    // sequence(0, -1) would step DOWN in Spark; the zero-copy case goes
    // through when()'s null branch, which explode() emits zero rows for
    df.withColumn("copy", explode(when(copies > 0, sequence(lit(0), copies - 1))))
  }

  // ---- test-set decontamination ----

  /** Flag corpus docs sharing ≥ `minHits` DISTINCT word n-grams with any
    * doc of a benchmark set — the standard pre-training decontamination
    * step (GPT-3's 13-gram overlap rule; `n` is a parameter). Scale
    * shape: the benchmark gram set is tiny by definition, so it
    * BROADCASTS and the corpus gram stream hash-joins against it without
    * shuffling the corpus; only the surviving (id, gram) hits — a
    * benchmark-bounded trickle — shuffle for the per-doc count. Never
    * doc×doc. Returns (id, gram_hits), gram_hits = distinct shared
    * grams. */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    n: Int = 8, minHits: Int = 1): DataFrame = {
    val cg = corpus.select(col(idCol).as("id"),
      explode(array_distinct(Dedup.shingles(col(textCol), n))).as("gram"))
    val bg = bench
      .select(explode(array_distinct(Dedup.shingles(col(benchTextCol), n))).as("gram"))
      .distinct()
    cg.join(broadcast(bg), Seq("gram"))
      .groupBy("id").agg(count(lit(1)).as("gram_hits"))
      .filter(col("gram_hits") >= minHits)
  }

  // ---- result highlighting ----

  /** Snippet extraction for search hits — the OpenSearch plain-highlighter
    * analog (re-scan the source text, no term vectors needed): for each
    * (query_id, doc_id) hit, the snippet is the `width`-character window
    * starting `before` characters ahead of the FIRST occurrence of any of
    * the query's terms in the lowercased content (terms are
    * analyzer-lowercased, and every emitted token is a contiguous
    * lowercase substring of its source, so a genuine hit always has an
    * occurrence; a term-less hit falls back to the document head).
    *
    * Character-addressed built-ins only (`position`/`substring`) — exactly
    * reproducible in ANSI SQL, the same cross-engine-parity discipline as
    * [[chunkDocs]]. Scale shape: hits are a top-k result (|queries|·k
    * rows) — the content scan is joined against the BROADCAST hit set
    * (column-pruned to (id, content)), snippets collapse to a per-hit
    * table that broadcasts back onto the hits, and nothing wider than the
    * snippet column survives.
    *
    * EVERY hit row comes back (skip-and-log discipline): a hit whose
    * doc_id has no row in `docs` keeps its row with a NULL snippet —
    * never silently dropped.
    *
    * @param hits   (query_id, doc_id, ...) — all columns carried through
    * @param docs   (doc_id, content) — one row per doc_id
    * @param qTerms (query_id, term) — one row per query term
    * @return hits + `snippet` string column */
  def highlightSnippets(hits: DataFrame, docs: DataFrame, qTerms: DataFrame,
                        before: Int = 40, width: Int = 120): DataFrame = {
    require(before >= 0 && width > 0, "need before >= 0 and width > 0")
    val content = docs.select(col("doc_id"), col("content"))
    val withContent = content
      .join(broadcast(hits.select("query_id", "doc_id").distinct()), Seq("doc_id"))
    val firstPos = withContent
      .join(broadcast(qTerms), Seq("query_id"))
      .withColumn("p", expr("position(term IN lower(content))"))
      .filter(col("p") > 0)
      .groupBy("query_id", "doc_id").agg(min(col("p")).as("p0"))
    val snips = withContent
      .join(broadcast(firstPos), Seq("query_id", "doc_id"), "left")
      .select(col("query_id"), col("doc_id"),
        expr(s"substring(content, greatest(1, coalesce(p0, 1) - $before), $width)")
          .as("snippet"))
    hits.join(broadcast(snips), Seq("query_id", "doc_id"), "left")
  }
}
