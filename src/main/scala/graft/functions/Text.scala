package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All functions are pure Column expressions built from
  * org.apache.spark.sql.functions — they stay inside whole-stage codegen
  * (no UDFs), so they vectorize across a 1000-executor scan. Designed for the
  * `documents` table but schema-agnostic.
  */
object Text {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: words + punctuation clusters + digit
    * runs each count; long words count ceil(len/4) pieces (the common
    * ~4-chars-per-token heuristic). Fused codegen kernel — the
    * transform+aggregate HOF formulation was interpreted AND disabled
    * whole-stage codegen for its stage. */
  def tokenCountBpeIsh(text: Column): Column =
    graft.functions.expressions.TextExpressions.bpeIshTokenCount(tokens(text))

  def charCount(text: Column): Column = length(text)

  /** Mean token length (0 for empty docs). Computed arithmetically —
    * sum of token lengths == count of non-whitespace chars — so the whole
    * thing is codegen'd string ops, no interpreted array lambda. */
  def avgWordLength(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "\\s+", "")).cast("double") / n)
  }

  /** Regex matching exactly the tokens (whitespace-delimited) equal to one
    * of `words` — token-filter semantics without the interpreted lambda. */
  private def tokenMatchPattern(words: Seq[String]): String =
    "(?<=^|\\s)(?:" +
      words.map(java.util.regex.Pattern.quote).mkString("|") + ")(?=\\s|$)"

  /** Fraction of tokens that are in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(
      stopwordCount(text, stopwords).cast("double") / n)
  }

  /** Count of tokens in `stopwords` (integral = oracle-exact).
    * regexp_extract_all is codegen'd; the equivalent
    * filter(tokens, _.isin(...)) is an interpreted higher-order function. */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(regexp_extract_all(text, lit(tokenMatchPattern(stopwords)), lit(0))).cast("long")

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", "")))
        .cast("double") / length(text))

  /** Fraction of characters that are uppercase. */
  def upperRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[A-Z]", "")))
        .cast("double") / length(text))

  /** Digit-character fraction. */
  def digitRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[0-9]", "")))
        .cast("double") / length(text))

  /** Composite quality score in [0,1]: favors moderate length, low
    * punctuation/digit noise, some stopword mass (fluent prose). The exact
    * blend is a heuristic; each term is codegen'd. */
  def qualityScore(text: Column, stopwords: Seq[String] = defaultStopwords("en")): Column = {
    val len = length(text).cast("double")
    val lengthTerm = least(len / lit(500.0), lit(1.0))
    val punctTerm = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    val digitTerm = lit(1.0) - least(digitRatio(text) * 4.0, lit(1.0))
    val stopTerm = least(stopwordRatio(text, stopwords) * 5.0, lit(1.0))
    round((lengthTerm * 0.3 + punctTerm * 0.25 + digitTerm * 0.2 + stopTerm * 0.25), 6)
  }

  /** Tiny per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Public knowledge (most-frequent function words). */
  // ListMap: profile order is the deterministic tie-break (a 5-entry plain
  // Map hashes to arbitrary order, making ties pick a random language)
  val languageProfiles: Map[String, Seq[String]] = scala.collection.immutable.ListMap(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "del"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不", "这", "他")
  )

  def defaultStopwords(lang: String): Seq[String] =
    languageProfiles.getOrElse(lang, languageProfiles("en"))

  /** Language-ID heuristic: score each profile by stopword hits per token,
    * pick the arg-max (ties broken by profile order). Pure expressions —
    * one pass over the token array per language. */
  def langId(text: Column, profiles: Map[String, Seq[String]] = languageProfiles): Column = {
    // One codegen'd regex count per language; arg-max over (hits, -index)
    // structs, ties broken toward the earlier profile.
    val withIdx = profiles.toSeq.zipWithIndex.map { case ((lang, words), i) =>
      struct(
        size(regexp_extract_all(text, lit(tokenMatchPattern(words)), lit(0))).as("hits"),
        lit(-i).as("prio"),
        lit(lang).as("lang"))
    }
    array_max(array(withIdx: _*)).getField("lang")
  }

  // PII scrubbing patterns: deliberately lookaround-free so the same regex
  // runs identically on Java (Spark) and RE2-based engines (oracle parity).
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+?[0-9][0-9()\\-\\s]{7,}[0-9]"
  val ipPattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Redact emails, phone-like numbers, and IPv4 addresses — the standard
    * pre-training scrub pass, fully codegen'd regexp_replace chain. */
  def redactPii(text: Column,
                emailTag: String = "<EMAIL>",
                phoneTag: String = "<PHONE>",
                ipTag: String = "<IP>"): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, emailTag),
        ipPattern, ipTag),
      phonePattern, phoneTag)

  /** Count of PII matches per document (for filtering decisions). */
  def piiCount(text: Column): Column =
    (size(regexp_extract_all(text, lit(emailPattern), lit(0))) +
      size(regexp_extract_all(text, lit(ipPattern), lit(0)))).cast("long")

  /** Canonical text normalization for dedup/fingerprint pipelines:
    * lowercase, strip punctuation, collapse whitespace runs, trim. Pure
    * codegen'd string ops with engine-portable regexes (no lookaround, no
    * unicode classes) so the result is oracle-exact. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[\\p{Punct}]", ""),
      "\\s+", " "))

  /** Document fingerprint: 64-bit content hash (xxhash64 — codegen'd,
    * seed-stable, the rolling-hash analog for whole-document identity). */
  def fingerprint64(text: Column): Column = xxhash64(text)

  /** MD5 fingerprint (hex string) — exact-dedup key that is reproducible
    * across engines. */
  def fingerprintMd5(text: Column): Column = md5(text)

  /** Word n-gram shingles, joined by spaces:
    * shingles("a b c", 2) = ["a b", "b c"]. */
  // NOTE (hot-path rule): higher-order-function lambdas are evaluated per
  // ELEMENT with no cross-element subexpression elimination — an outer
  // expression like `element_at(split(text), i)` inside a lambda re-runs
  // the regex split for every element (O(n²) splits per doc, measured 4-5 s
  // per 250k grams at sf0.1). The n-gram builders below therefore use
  // zip_with over pre-sliced arrays: every lambda touches ONLY its lambda
  // variables, so the split runs a constant number of times per row.

  /** Sliding token windows joined by spaces (MinHash shingling):
    * shingles("a b c", 2) = ["a b", "b c"]. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val m = size(toks)
    val windows = (2 to n).foldLeft(slice(toks, lit(1), m - (n - 1))) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k), m - (n - 1)),
        (a, t) => concat(a, lit(" "), t))
    }
    when(m < n, array(array_join(toks, " "))).otherwise(windows)
  }

  /** Adjacent token pairs as struct<w1,w2> — one narrow array transform,
    * no shuffle, no per-position self-join. Empty for docs under 2 tokens. */
  def bigrams(text: Column): Column = {
    val toks = tokens(text)
    val m = size(toks)
    when(m < 2,
      array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(zip_with(slice(toks, lit(1), m - 1), slice(toks, lit(2), m - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
  }

  /** Adjacent token triples as struct<w1,w2,w3> — same narrow transform
    * as [[bigrams]]. Empty for docs under 3 tokens. */
  def trigrams(text: Column): Column = {
    val toks = tokens(text)
    val m = size(toks)
    val pairs = zip_with(slice(toks, lit(1), m - 2), slice(toks, lit(2), m - 2),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    when(m < 3,
      array().cast("array<struct<w1:string,w2:string,w3:string>>"))
      .otherwise(zip_with(pairs, slice(toks, lit(3), m - 2),
        (p, c) => struct(p.getField("w1").as("w1"),
          p.getField("w2").as("w2"), c.as("w3"))))
  }

  /** Character n-gram set (distinct), for n-gram Jaccard similarity. */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) < n, array(text)).otherwise(
      array_distinct(transform(sequence(lit(0), length(text) - n),
        i => text.substr(i + 1, lit(n)))))

  /** Jaccard similarity of two string arrays (as sets): one fused hash-set
    * kernel instead of the distinct/intersect/union chain (three set builds
    * per candidate pair). */
  def jaccard(a: Column, b: Column): Column =
    graft.functions.expressions.TextExpressions.jaccardSimilarity(a, b)

  // -------------------------------------------------- Gopher quality rules

  /** Count of tokens containing at least one ASCII letter. */
  def alphaWordCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("(?<=^|\\s)\\S*[A-Za-z]\\S*(?=\\s|$)"), lit(0))).cast("long")

  /** Count of "symbol" occurrences (#, …, ...) — the Gopher
    * symbol-to-word-ratio numerator. */
  def symbolCount(text: Column): Column =
    size(regexp_extract_all(text, lit("#|\\.\\.\\.|…"), lit(0))).cast("long")

  /** Fraction of newline-separated lines starting with a bullet marker. */
  def bulletLineRatio(text: Column): Column = {
    val lines = split(text, "\n")
    val bullets = size(regexp_extract_all(text,
      lit("(?m)^\\s*(?:[-*•‣▪])"), lit(0)))
    bullets.cast("double") / size(lines).cast("double")
  }

  /** Fraction of lines ending with an ellipsis. */
  def ellipsisLineRatio(text: Column): Column = {
    val lines = split(text, "\n")
    val ell = size(regexp_extract_all(text, lit("(?m)(?:\\.\\.\\.|…)\\s*$"), lit(0)))
    ell.cast("double") / size(lines).cast("double")
  }

  /** Gopher-style quality rule evaluation (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training Gopher",
    * App. A document filters — public method). Every rule is a codegen'd
    * regex/arithmetic expression; the composite `passes` requires all:
    *   - word count within [minWords, maxWords]
    *   - mean word length within [3, 10]
    *   - symbol-to-word ratio < 0.1
    *   - < 90% of lines bullet-started, < 30% ellipsis-ended
    *   - ≥ 80% of words contain an alphabetic character
    *   - ≥ 2 stopword hits
    * Returns a struct; select fields or `.getField("passes")` to filter. */
  def gopherRules(text: Column,
                  stopwords: Seq[String] = defaultStopwords("en"),
                  minWords: Int = 50, maxWords: Int = 100000): Column = {
    val nWords = tokenCount(text).cast("long")
    val meanLen = avgWordLength(text)
    val symRatio = when(nWords === 0, lit(1.0))
      .otherwise(symbolCount(text).cast("double") / nWords.cast("double"))
    val alphaFrac = when(nWords === 0, lit(0.0))
      .otherwise(alphaWordCount(text).cast("double") / nWords.cast("double"))
    val nStop = stopwordCount(text, stopwords)
    val bullet = bulletLineRatio(text)
    val ellipsis = ellipsisLineRatio(text)
    val passes = nWords.between(minWords, maxWords) &&
      meanLen.between(3.0, 10.0) && symRatio < 0.1 &&
      bullet < 0.9 && ellipsis < 0.3 && alphaFrac >= 0.8 && nStop >= 2
    struct(nWords.as("n_words"), meanLen.as("mean_word_len"),
      symRatio.as("symbol_ratio"), bullet.as("bullet_ratio"),
      ellipsis.as("ellipsis_ratio"), alphaFrac.as("alpha_frac"),
      nStop.as("n_stop"), passes.as("passes"))
  }

  // ---------------------------------------------------- URL canonicalization

  /** Canonicalize a URL for dedup keys, the standard web-corpus
    * normalization: lowercase scheme+host, drop the fragment, strip
    * tracking parameters (utm_*, fbclid, gclid, ref), collapse leftover
    * separators, drop default ports, drop a trailing slash. Every step is
    * a lookaround-free regex, so an external engine (the DuckDB oracle)
    * applies the identical transformation. */
  def canonicalizeUrl(url: Column): Column = {
    val t = trim(url)
    // lowercase exactly the scheme://host[:port] prefix, keep the rest
    val head = regexp_extract(t, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val lowered = concat(lower(head), substr(t, length(head) + 1, lit(Int.MaxValue)))
    val noFrag = regexp_replace(lowered, "#.*$", "")
    val noTrack = regexp_replace(noFrag,
      "(utm_[A-Za-z0-9]+|fbclid|gclid|msclkid|ref)=[^&#]*", "")
    val collapsed = regexp_replace(
      regexp_replace(regexp_replace(noTrack, "&+", "&"), "\\?&", "?"),
      "[?&]+$", "")
    val noPort = regexp_replace(collapsed, "^([a-z]+://[^/?#:]*):(?:80|443)([/?]|$)", "$1$2")
    regexp_replace(noPort, "/$", "")
  }

  // ------------------------------------------------------- character entropy

  /** Shannon entropy of each document's character distribution, in bits —
    * the classic compressibility quality signal (keyboard mash and
    * repeated boilerplate score low, natural prose ~4.0-4.5 bits for
    * English; pairs with the Gopher rules and repetition ratios).
    *
    *   H(d) = Σ_c (n_c/n) · log2(n/n_c)
    *
    * Determinism: per-character log terms are rounded after the log and
    * summed as exact DECIMAL (the UnigramLm scheme); the final /n is one
    * IEEE division + round. Engine-independent to `outScale` digits.
    *
    * Scale shape: the per-character explode partial-aggregates in place —
    * at most \|alphabet\| rows per document reach the (id, char) shuffle,
    * and the second aggregate ships one decimal per (id, char). Empty
    * documents are dropped (entropy undefined). Returns (idCol, entropy). */
  def charEntropyScores(df: DataFrame, idCol: String, textCol: String,
                        logScale: Int = 6, outScale: Int = 4): DataFrame = {
    val counts = df
      .select(col(idCol).as("id"), length(col(textCol)).as("__n"),
        explode(split(col(textCol), "")).as("__ch"))
      .filter(col("__n") > 0 && col("__ch") =!= "")
      .groupBy(col("id"), col("__n"), col("__ch"))
      .agg(count(lit(1)).as("__c"))
    counts
      .select(col("id"), col("__n"),
        (col("__c") * round(log2(col("__n").cast("double") / col("__c")), logScale)
          .cast(s"decimal(18,$logScale)"))
          .cast(s"decimal(28,$logScale)").as("__term"))
      .groupBy(col("id"), col("__n"))
      .agg(sum(col("__term")).as("__s"))
      .select(col("id").as(idCol),
        UnigramLm.pinnedMean("__s", "__n", logScale, outScale).as("entropy"))
  }

  /** Corpus collocations by pointwise mutual information: the top-k
    * adjacent token pairs whose co-occurrence beats chance,
    * PMI = ln(p(w1w2) / (p(w1)·p(w2))) with p(w) = c(w)/N_tok and
    * p(w1w2) = c(w1w2)/N_bi — the classic collocation-mining statistic
    * (Church & Hanks 1990). `minCount` drops rare pairs (PMI's known
    * low-count pathology) before any join.
    *
    * Determinism: counts and totals are exact integers; the PMI argument
    * is one parenthesized chain of IEEE multiplications/divisions over
    * those integers (bit-identical cross-engine), then a single ln
    * rounded to 6 decimals; ranking is the (pmi desc, bigram asc) total
    * order.
    *
    * Scale shape: unigram/bigram count tables are vocabulary-sized (they
    * grow with diversity, not corpus size); both PMI joins are keyed by
    * token — never broadcast, a 100 TB corpus's vocabulary is not
    * driver-sized; corpus totals ride a broadcast 1-row aggregate; the
    * final top-k is a TakeOrdered, no global sort. */
  def pmiCollocations(df: DataFrame, textCol: String,
                      minCount: Long = 3, topK: Int = 50): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val uni = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("__c"))
    val bi = df.select(explode(bigrams(col(textCol))).as("g"))
      .select(col("g.w1").as("__w1"), col("g.w2").as("__w2"))
      .groupBy(col("__w1"), col("__w2")).agg(count(lit(1)).as("c12"))
    val totals = broadcast(uni.agg(sum(col("__c")).as("__n1"))
      .crossJoin(bi.agg(sum(col("c12")).as("__n2"))))
    bi.filter(col("c12") >= minCount)
      .join(uni.select(col("w").as("__w1"), col("__c").as("__c1")), Seq("__w1"))
      .join(uni.select(col("w").as("__w2"), col("__c").as("__c2")), Seq("__w2"))
      .crossJoin(totals)
      .select(
        concat_ws(" ", col("__w1"), col("__w2")).as("bigram"),
        col("c12"),
        round(log(
          col("c12").cast("double") * col("__n1").cast("double") *
            col("__n1").cast("double") /
            (col("__c1").cast("double") * col("__c2").cast("double") *
              col("__n2").cast("double"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram").asc)
      .limit(topK)
  }

  /** Per-document n-gram novelty: the fraction of a document's DISTINCT
    * bigrams whose first corpus appearance (minimum id) is this document —
    * the memorization/novelty profile used to spot near-template documents
    * (novelty → 0) and genuinely fresh content (novelty → 1) in id
    * (crawl/arrival) order. Documents under 2 tokens carry no grams and
    * are absent from the output.
    *
    * Deterministic: exact integer counts, min over ids, one IEEE division
    * rounded to 6.
    *
    * Scale shape: groupBy(gram) min is map-side combinable; the
    * attribution join is gram-keyed; per-doc distinct grams collapse
    * inside the row (array_distinct) before any shuffle. */
  def gramNovelty(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
        explode(array_distinct(bigrams(col(textCol)))).as("g"))
      .select(col("id"), concat_ws(" ", col("g.w1"), col("g.w2")).as("__g"))
    val firstSeen = grams.groupBy(col("__g")).agg(min(col("id")).as("__first"))
    grams.join(firstSeen, Seq("__g"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__first") === col("id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("id").as(idCol), col("n_grams"), col("n_novel"),
        PinnedMath.pinnedRatio(col("n_novel"), col("n_grams"), 6)
          .as("novelty"))
  }

  /** Per-group keyness: the top-k tokens most OVER-represented in each
    * group vs the rest of the corpus by Dunning's log-likelihood G²
    * (Dunning 1993) — the corpus-linguistics "what words characterize
    * this source/language" statistic, robust at low counts where PMI
    * explodes. G² = 2·(a·ln(a·N/(n1·c)) + b·ln(b·N/(n2·c))) for token
    * count a in-group, b elsewhere, group sizes n1/n2, corpus total N,
    * token total c = a + b; only enriched tokens (a·N > n1·c, an exact
    * integer comparison) are ranked, and the b = 0 term is 0 by limit.
    *
    * Determinism: counts exact integers; each ln runs on one
    * parenthesized IEEE product/quotient chain, is rounded to `logScale`
    * decimals, multiplied by the exact integer count and summed as
    * DECIMAL; ranking is the (keyness desc, token asc) total order.
    *
    * Scale shape: (group, token) and token count tables grow with
    * vocabulary, not corpus; the count join is token-keyed (never
    * broadcast); per-group totals are a group-cardinality-sized broadcast;
    * ranking rides the distributed range-partitioned globalRowNumber —
    * no per-group window task. */
  def keynessTopTerms(df: DataFrame, groupCol: String, textCol: String,
                      topK: Int = 10, minCount: Long = 5,
                      logScale: Int = 6): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val ag = df.select(col(groupCol).as("grp"),
        explode(tokens(col(textCol))).as("token"))
      .groupBy(col("grp"), col("token")).agg(count(lit(1)).as("cnt"))
    val ct = ag.groupBy(col("token")).agg(sum(col("cnt")).as("__ct"))
    val n1 = ag.groupBy(col("grp")).agg(sum(col("cnt")).as("__n1"))
    val nn = broadcast(n1.agg(sum(col("__n1")).as("__nn")))
    def lnTerm(x: Column, nx: Column): Column =
      round(log(x.cast("double") * col("__nn").cast("double") /
        (nx.cast("double") * col("__ct").cast("double"))), logScale)
        .cast(s"decimal(18,$logScale)")
    val scored = ag.join(ct, Seq("token"))
      .join(broadcast(n1), Seq("grp"))
      .crossJoin(nn)
      .withColumn("__b", col("__ct") - col("cnt"))
      .withColumn("__n2", col("__nn") - col("__n1"))
      .filter(col("cnt") >= minCount)
      .filter(col("cnt").cast("decimal(38,0)") * col("__nn") >
        col("__n1").cast("decimal(38,0)") * col("__ct"))
      .withColumn("keyness",
        ((col("cnt") * lnTerm(col("cnt"), col("__n1")) +
          when(col("__b") === 0, lit(0).cast(s"decimal(28,$logScale)"))
            .otherwise(col("__b") * lnTerm(col("__b"), col("__n2"))))
          * 2).cast(s"decimal(28,$logScale)"))
      .withColumn("__neg", -col("keyness"))
    Windowing.globalRowNumber(scored, Seq("grp"), Seq("__neg", "token"), "rank")
      .filter(col("rank") <= topK)
      .select(col("grp").as(groupCol), col("token"), col("cnt"),
        col("keyness").cast("double").as("keyness"), col("rank"))
  }

  /** Zipf power-law fit over the token frequency spectrum: least-squares
    * slope/intercept of ln(count) on ln(rank) for the top `topRanks`
    * tokens — Zipf's law predicts slope ≈ −1; a corpus whose fit departs
    * far from that (or whose residual spread is huge) is unnatural text
    * (template/boilerplate or spam), which makes the exponent a cheap
    * corpus-health signal.
    *
    * Determinism: ranks come from the exact (count desc, token asc)
    * total order; ln(rank)/ln(count) are rounded to 6 decimals and
    * summed as DECIMAL, so the four sufficient statistics are exact; the
    * closed-form slope/intercept is then a short IEEE chain over their
    * double conversions, rounded to 6.
    *
    * Scale shape: the count table is vocabulary-sized; ranking rides the
    * range-partitioned globalRowNumber (constant group — the range
    * exchange still spreads the sort); only `topRanks` rows reach the
    * final single-row aggregate. */
  def zipfFit(df: DataFrame, textCol: String, topRanks: Int = 100): DataFrame = {
    require(topRanks >= 2, s"topRanks must be >= 2, got $topRanks")
    val counts = df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("__c"))
      .withColumn("__g", lit(0))
      .withColumn("__neg", -col("__c"))
    val ranked = Windowing
      .globalRowNumber(counts, Seq("__g"), Seq("__neg", "token"), "rank")
      .filter(col("rank") <= topRanks)
      .select(
        round(log(col("rank").cast("double")), 6).cast("decimal(18,6)").as("__x"),
        round(log(col("__c").cast("double")), 6).cast("decimal(18,6)").as("__y"))
    val s = ranked.agg(
      count(lit(1)).as("__n"),
      sum(col("__x")).cast("decimal(38,6)").as("__sx"),
      sum(col("__y")).cast("decimal(38,6)").as("__sy"),
      sum((col("__x") * col("__x")).cast("decimal(38,12)")).as("__sxx"),
      sum((col("__x") * col("__y")).cast("decimal(38,12)")).as("__sxy"))
    val n = col("__n").cast("double")
    val sx = col("__sx").cast("double"); val sy = col("__sy").cast("double")
    val sxx = col("__sxx").cast("double"); val sxy = col("__sxy").cast("double")
    val slope = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    s.select(col("__n").as("n_terms"), slope.as("slope"),
        round((sy - slope * sx) / n, 6).as("intercept"))
  }

  /** GloVe-style windowed co-occurrence accumulation (Pennington et al.
    * 2014 §3: the X_ij matrix build, with the paper's 1/d distance
    * weighting) — the preprocessing pass behind count-based word vectors
    * and the standard corpus-level association table. Returns the top-k
    * directed pairs (w1 precedes w2 within `window` tokens) by summed
    * weight: (w1, w2, wsum, n, rank).
    *
    * Weights are INTEGER-exact: 1/d is scaled to `weightScale`/d with the
    * division done in Long arithmetic at plan-build time (d is a plan
    * constant), so sums are engine/order/partitioning-independent — no
    * floating point anywhere.
    *
    * Scale shape: one narrow zip_with pass per distance (d ≤ window, no
    * position self-join, no per-element HOF lambda re-evaluation — the
    * pre-sliced-arrays rule documented at [[bigrams]]); the union feeds
    * ONE pair-keyed aggregate with map-side combine, and the pair table
    * grows with corpus diversity, not size. The final top-k is a
    * TakeOrdered under the (wsum desc, w1 asc, w2 asc) total order; the
    * row_number window runs over k rows only. */
  def cooccurrenceTopK(df: DataFrame, textCol: String, window: Int,
                       topK: Int, weightScale: Long = 1000000L): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = tokens(col(textCol))
    val m = size(toks)
    val streams = (1 to window).map { d =>
      val pairs = when(m < d + 1,
        array().cast("array<struct<w1:string,w2:string>>"))
        .otherwise(zip_with(slice(toks, lit(1), m - d),
          slice(toks, lit(1 + d), m - d),
          (a, b) => struct(a.as("w1"), b.as("w2"))))
      df.select(explode(pairs).as("__p"))
        .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"),
          lit(weightScale / d).as("wt"))
    }
    val agg = streams.reduce(_ unionByName _)
      .groupBy(col("w1"), col("w2"))
      .agg(sum(col("wt")).as("wsum"), count(lit(1)).as("n"))
    val top = agg.orderBy(col("wsum").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("wsum").desc, col("w1").asc, col("w2").asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
  }

  // -------------------------------------------------- C4 heuristic filters

  /** C4-style document filters (Raffel et al. 2020 §2.2, public method):
    * boilerplate/code markers (curly brace, "lorem ipsum", "javascript")
    * and a minimum terminal-punctuation sentence count. Each flag is one
    * codegen'd contains/regex; `passes` is their conjunction. Returns a
    * struct (n_sentences, has_brace, has_lorem, has_js, passes). */
  def c4Flags(text: Column, minSentences: Int = 3): Column = {
    val nSent = size(regexp_extract_all(text, lit("[.!?]"), lit(0))).cast("long")
    val brace = text.contains("{")
    val lorem = lower(text).contains("lorem ipsum")
    val js = lower(text).contains("javascript")
    struct(nSent.as("n_sentences"), brace.as("has_brace"),
      lorem.as("has_lorem"), js.as("has_js"),
      (!brace && !lorem && !js && nSent >= minSentences).as("passes"))
  }

  // -------------------------------------------------- readability scoring

  /** Flesch reading-ease + Flesch-Kincaid grade (Kincaid et al. 1975,
    * public formulas) from three exact counts — words (whitespace tokens),
    * sentences (terminal-punctuation runs, floored at 1), syllables (vowel
    * groups, the standard cheap approximation). Each score is ONE rounded
    * IEEE chain over the integer counts, so real-corpus readability
    * rankings hash-match across engines. */
  def fleschScores(text: Column): Column = {
    val w = tokenCount(text).cast("double")
    val sRaw = size(regexp_extract_all(text, lit("[.!?]+"), lit(0))).cast("double")
    val s = greatest(sRaw, lit(1.0))
    val syl = size(regexp_extract_all(text, lit("[AEIOUYaeiouy]+"), lit(0)))
      .cast("double")
    val wSafe = greatest(w, lit(1.0))
    // 4-dp quantization via floor(x·10⁴ + 0.5)/10⁴ rather than round():
    // readability chains land EXACTLY on .xxxx5 ties (small power-of-two
    // denominators × short decimal constants), where Java's exact-decimal
    // rounding and a scaled-double round() disagree — the floor chain is
    // the same IEEE ops in any engine, so it is bit-identical by
    // construction, tie or no tie.
    def q4(x: Column): Column = floor(x * 10000.0 + 0.5).cast("double") / 10000.0
    val fre = q4(lit(206.835) - lit(1.015) * (w / s) -
      lit(84.6) * (syl / wSafe))
    val fk = q4(lit(0.39) * (w / s) + lit(11.8) * (syl / wSafe) -
      lit(15.59))
    struct(w.cast("long").as("n_words"), sRaw.cast("long").as("n_sentences"),
      syl.cast("long").as("n_syllables"), fre.as("fre"), fk.as("fk_grade"))
  }

  /** Blocklist screening — which of `terms` occur (as substrings) in each
    * document, in ONE Aho–Corasick DFA pass per row regardless of term
    * count (a contains() per term re-scans the text |terms| times — the
    * naive form is quadratic in the wrong place at real blocklist sizes).
    * Matched terms come back in list order (the automaton reports distinct
    * indices ascending), so the output is engine-independent and a SQL
    * mirror is a per-term contains() filter over the same fixed list.
    *
    * Returns (idCol, n_terms_hit, terms_hit csv, flagged). Zero shuffle —
    * pure per-row projection. */
  def blocklistScreen(df: DataFrame, idCol: String, textCol: String,
                      terms: Seq[String]): DataFrame = {
    val termArr = array(terms.map(lit): _*)
    df.withColumn("__hits",
        expressions.MultiPattern.hits(col(textCol), terms))
      .select(col(idCol),
        size(col("__hits")).cast("long").as("n_terms_hit"),
        concat_ws(",",
          transform(col("__hits"), i => element_at(termArr, i + 1)))
          .as("terms_hit"),
        (size(col("__hits")) > 0).as("flagged"))
  }

  /** KWIC concordance (keyword in context): every occurrence of `term`
    * with its ±`window`-token context — the inspection surface behind
    * "show me how this word is used" corpus debugging and blocklist
    * triage. Zero shuffle: tokenize → posexplode → filter → two clamped
    * slices, all codegen projections; output volume ∝ term frequency.
    * Returns (idCol, pos 0-based, left_ctx, right_ctx). */
  def concordance(df: DataFrame, idCol: String, textCol: String,
                  term: String, window: Int = 3): DataFrame = {
    require(window >= 1, s"concordance: window must be >= 1, got $window")
    val start = greatest(col("pos") - window, lit(0))
    df.select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol), col("__t"),
        posexplode(col("__t")).as(Seq("pos", "__tok")))
      .filter(col("__tok") === term)
      .select(col(idCol), col("pos").cast("long").as("pos"),
        array_join(slice(col("__t"), start + 1,
          (col("pos") - start).cast("int")), " ").as("left_ctx"),
        array_join(slice(col("__t"), col("pos") + 2, lit(window)), " ")
          .as("right_ctx"))
  }

  /** Per-group boilerplate TEMPLATE detection: the longest common token
    * PREFIX of every document in a group (source/domain/crawl-host) — the
    * shared header a scraper stamps on every page. Exactness trick: the
    * LCP of a whole set equals the LCP of its lexicographic MIN and MAX
    * elements, so one (min, max) aggregate per group (arrays are
    * orderable in both engines) replaces any pairwise comparison — the
    * group never ships its documents anywhere. The prefix-run length is
    * one bounded fold over the two arrays. Returns (groupCol, n_docs,
    * lcp_len, template_prefix). */
  def templatePrefix(df: DataFrame, groupCol: String,
                     textCol: String): DataFrame = {
    val agg = df.select(col(groupCol), tokens(col(textCol)).as("__t"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        min(col("__t")).as("__mn"), max(col("__t")).as("__mx"))
    val m = least(size(col("__mn")), size(col("__mx")))
    // guard: Spark's sequence(0, -1) DESCENDS instead of being empty
    val idx = when(m > 0, sequence(lit(0), m - 1))
      .otherwise(array().cast("array<int>"))
    val run = aggregate(idx,
      struct(lit(true).as("going"), lit(0L).as("len")),
      (acc, i) => {
        val going = acc.getField("going") &&
          element_at(col("__mn"), i + 1) === element_at(col("__mx"), i + 1)
        struct(going.as("going"),
          (acc.getField("len") + when(going, 1L).otherwise(0L)).as("len"))
      })
    agg.withColumn("lcp_len", run.getField("len"))
      .select(col(groupCol), col("n_docs"), col("lcp_len"),
        array_join(slice(col("__mn"), lit(1), col("lcp_len").cast("int")), " ")
          .as("template_prefix"))
  }

  /** PII / pattern redaction — the scrub step every shared training
    * corpus runs before release: for each named `(name, pattern,
    * replacement)` rule, count matches in the ORIGINAL text and replace
    * all occurrences; rules apply in order to the running text. Returns
    * (idCol, n_<name>… one count per rule, text_scrubbed).
    *
    * Patterns must stay in the regex dialect intersection that Java's
    * engine and RE2-family engines (DuckDB, Go, Rust) evaluate
    * identically — character classes, bounded repetition, alternation,
    * `\b` on ASCII; no backreferences or lookaround — which keeps the
    * scrub engine-mirrorable and the scrubbed TEXT itself
    * oracle-hashable. Counts are per original text, so overlapping rules
    * report independently of application order. Zero shuffle — pure
    * per-row codegen projection; at 100 TB this is a map-only pass. */
  def regexRedact(df: DataFrame, idCol: String, textCol: String,
                  rules: Seq[(String, String, String)]): DataFrame = {
    require(rules.nonEmpty, "regexRedact: no rules")
    require(rules.map(_._1).distinct.size == rules.size,
      "regexRedact: duplicate rule names")
    val counts = rules.map { case (n, p, _) =>
      regexp_count(col(textCol), lit(p)).cast("long").as(s"n_$n") }
    val scrubbed = rules.foldLeft(col(textCol)) { case (c, (_, p, r)) =>
      regexp_replace(c, p, r) }
    df.select(col(idCol) +: counts :+ scrubbed.as("text_scrubbed"): _*)
  }
}
