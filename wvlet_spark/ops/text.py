"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.  Pure column expressions (codegen, no UDFs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "was", "for", "on", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit", "von", "auf"],
    "fr": ["le", "la", "les", "et", "est", "une", "un", "des", "du", "dans", "pour", "que"],
    "es": ["el", "la", "los", "las", "y", "es", "una", "un", "de", "en", "por", "que"],
}


def _tokens(text_col):
    return F.split(F.lower(F.trim(text_col)), r"\s+")


_LANG_PRIORITY = {"en": 4, "de": 3, "fr": 2, "es": 1}


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: stopword hit-count per language; argmax with
    fixed priority en>de>fr>es on ties.
    (A real model would be a Pandas UDF; the heuristic keeps this JVM-only.)"""
    from wvlet_spark.ops.util import ensure_map_parallelism, let1
    df = ensure_map_parallelism(df)

    # let-bind the distinct token array: as a free subexpression it
    # re-evaluated split+distinct once PER LANGUAGE (let1 rationale in
    # ops/util.py); __best stages through its own projection so the
    # argmax struct computes once, not once per field reference
    def best_of(d):
        scores = []
        for lang, words in STOPWORDS.items():
            lit = F.array(*[F.lit(w) for w in words])
            scores.append(
                F.struct(
                    F.size(F.array_intersect(d, lit)).alias("score"),
                    F.lit(_LANG_PRIORITY[lang]).alias("prio"),
                    F.lit(lang).alias("lang"),
                )
            )
        return F.array_max(F.array(*scores))

    tmp = df.withColumn(
        "__best", let1(F.array_distinct(_tokens(F.col(text_col))), best_of))
    pred = F.when(F.col("__best.score") > 0, F.col("__best.lang")) \
        .otherwise(F.lit("unknown"))
    return tmp.withColumn(out_col, pred).drop("__best")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate + char count.
    The BPE-ish pattern is RE2-safe (no lookaround) so the DuckDB oracle can
    run the identical regex."""
    from wvlet_spark.ops.util import ensure_map_parallelism
    df = ensure_map_parallelism(df)
    toks = _tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    # BPE-ish word pieces: letter runs (<=4 chars each piece), digits, punct.
    # regexp_count returns the same match count regexp_extract_all's size
    # did without materializing an array of per-match strings per row
    # (round 9, guide §1.2 per-task work: the extract_all form allocated
    # every piece only to take the array's length)
    bpe_pieces = F.expr(
        f"regexp_count({text_col}, '[A-Za-z]{{1,4}}|[0-9]|[^\\\\sA-Za-z0-9]')"
    )
    # chars-after-removing-\s == n_chars minus the count of \s chars;
    # counting avoids building the stripped copy of every document
    non_space = n_chars - F.expr(f"regexp_count({text_col}, '\\\\s')")
    avg_word_len = F.when(n_tokens > 0, non_space / n_tokens).otherwise(F.lit(0.0))
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("n_chars_computed", n_chars)
        .withColumn("n_bpeish", bpe_pieces)
        .withColumn("avg_word_len", avg_word_len.cast("double"))
    )


def quality_score(df: DataFrame, text_col: str = "text", out_col: str = "quality") -> DataFrame:
    """Composite quality heuristic in [0,1]: length band, alpha ratio,
    punctuation ratio, stopword presence — the usual pretraining filters."""
    from wvlet_spark.ops.util import ensure_map_parallelism
    df = ensure_map_parallelism(df)
    t = F.col(text_col)
    n = F.length(t).cast("double")
    # count chars in a class as length minus length-after-deleting the
    # class: translate is a per-char map lookup, so neither count pays
    # the regex engine or allocates the stripped string (round 9; the
    # regexp_replace form built two full copies of every document only
    # to take their lengths) — counts are identical by construction
    _alpha_chars = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                    "abcdefghijklmnopqrstuvwxyz")
    alpha = (F.length(t)
             - F.length(F.translate(t, _alpha_chars, ""))).cast("double")
    punct = (F.length(t)
             - F.length(F.translate(t, ".,;:!?", ""))).cast("double")
    toks = _tokens(t)
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), en)).cast("double")
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    punct_penalty = F.when(n > 0, F.least(punct / n * 10.0, F.lit(1.0))).otherwise(F.lit(0.0))
    stop_score = F.least(stop_hits / F.lit(5.0), F.lit(1.0))
    score = (len_score * 0.3 + alpha_ratio * 0.3 + (1 - punct_penalty) * 0.1 + stop_score * 0.3)
    return df.withColumn(out_col, score.cast("double"))


def document_fingerprint(df: DataFrame, text_col: str = "text",
                         out_col: str = "fingerprint") -> DataFrame:
    """Stable 64-bit content fingerprint: xxhash64 of the
    whitespace-normalized lowercase text (order-sensitive rolling identity),
    plus a 128-bit md5 hex for cross-system comparison."""
    from wvlet_spark.ops.util import ensure_map_parallelism
    df = ensure_map_parallelism(df)
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return (
        df.withColumn(out_col, F.xxhash64(norm))
        .withColumn("fingerprint_md5", F.md5(norm))
    )


# PII patterns shared verbatim with the DuckDB oracle (RE2-safe subset:
# no backrefs or lookaround, identical semantics in Java regex and RE2)
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\d{3}[-.]\d{3}[-.]\d{4}",
    "ipv4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "url": r"https?://[^\s]+",
}


def pii_scan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII inventory + redacted text: counts of emails, phone
    numbers, IPv4 addresses, and URLs, plus the text with each match
    replaced by a typed tag.  Single-pass JVM regex column expressions —
    no UDF, map-only, the shape a 100 TB pre-training scrub pass needs.

    Redaction order is urls -> emails -> ipv4 -> phones so container
    patterns are consumed before their substrings (an URL may embed
    ip:port; an email embeds dots)."""
    from wvlet_spark.ops.util import ensure_map_parallelism

    df = ensure_map_parallelism(df)
    t = F.col(text_col)
    out = df
    for kind in ("email", "phone", "ipv4", "url"):
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(t, F.lit(PII_PATTERNS[kind]), F.lit(0))))
    red = t
    for kind in ("url", "email", "ipv4", "phone"):
        red = F.regexp_replace(red, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out.withColumn("redacted", red)


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Repetition filters for training corpora (the Gopher/MassiveText
    family: documents dominated by repeated fragments are low-quality and
    poison dedup/quality sampling):

    - dup_word_frac:  1 - distinct_words / words
    - top_word_frac:  occurrences of the most frequent word / words
    - dup_2gram_frac: 1 - distinct_2grams / 2grams

    The COUNTS (words, distinct words, top-word occurrences, 2-grams,
    distinct 2-grams) come from one Arrow-batched numpy pass over the
    JVM-split token array; the fractions — division and HALF_UP round —
    stay JVM column expressions over those integers, so every emitted
    double is bit-identical to the previous all-JVM form (equal integer
    inputs, equal IEEE ops).  The previous form computed top_word_frac
    with a nested interpreted higher-order filter — O(distinct * n)
    comparisons PER ROW (round-9 profile: 4.6 s at sf1, the third
    largest pool entry; np.unique is O(n log n) and measured ~5x).
    Map-only — survives 100 TB by construction.
    """
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    from wvlet_spark.ops.util import ensure_map_parallelism
    df = ensure_map_parallelism(df, wide=True)

    cnt_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("nd", T.LongType()),
        T.StructField("top", T.LongType()),
        T.StructField("ng", T.LongType()),
        T.StructField("ngd", T.LongType()),
    ])

    # NB: no type hints — the Series -> DataFrame struct-return signature
    # is not accepted by the hint parser; the bare form falls back to the
    # classic SCALAR pandas UDF, which supports struct returns
    @F.pandas_udf(cnt_schema)
    def _counts(w):
        rows = []
        for arr in w:
            if arr is None:
                # null text: the old expressions produced null stats (and
                # the ng>0 guard then yields 0.0) — null counts reproduce
                # exactly that through the same JVM arithmetic
                rows.append((None,) * 5)
                continue
            a = np.asarray(arr, dtype=object)
            n = len(a)
            if n == 0:
                rows.append((0, 0, None, 0, 0))
                continue
            u, inv, c = np.unique(a, return_inverse=True,
                                  return_counts=True)
            if n >= 2:
                # token pairs are equal iff code pairs are equal (tokens
                # never contain whitespace, so the old concat_ws(' ')
                # 2-gram key was injective too)
                pk = inv[:-1].astype(np.int64) * len(u) + inv[1:]
                ng, ngd = n - 1, len(np.unique(pk))
            else:
                ng, ngd = 0, 0
            rows.append((n, len(u), int(c.max()), ng, ngd))
        return pd.DataFrame(rows, columns=["n", "nd", "top", "ng", "ngd"])

    # one UDF evaluation per row (ExtractPythonUDFs stages the call in a
    # single ArrowEvalPython node; the field references below read its
    # output struct, they cannot re-trigger it)
    tmp = df.select(F.col(id_col),
                    _counts(_tokens(F.col(text_col))).alias("__c"))
    return tmp.select(
        F.col(id_col),
        F.round(1 - F.col("__c.nd") / F.col("__c.n"), 4)
        .alias("dup_word_frac"),
        F.round(F.col("__c.top") / F.col("__c.n"), 4)
        .alias("top_word_frac"),
        F.when(F.col("__c.ng") > 0,
               F.round(1 - F.col("__c.ngd") / F.col("__c.ng"), 4))
        .otherwise(0.0).alias("dup_2gram_frac"),
    )


def vocabulary_df(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", top_n: int | None = None,
                  approx_df: bool = False) -> DataFrame:
    """Corpus vocabulary with document frequency and IDF — the classic
    map-reduce over a training corpus (stopword discovery, tokenizer
    vocab candidates, TF-IDF weights).

    Returns (word, total_count, doc_freq, idf) where
    idf = ln(N / doc_freq), N = corpus document count.

    100 TB shape: one shuffle keyed on word with map-side partial
    aggregation (sum/count combine associatively, so stopword skew is
    absorbed in the combiners).  doc_freq is count(DISTINCT doc) —
    Spark rewrites that with an expand+two-phase plan; pass
    `approx_df=True` to use approx_count_distinct (one phase, ~2%
    error) when exact document frequencies don't matter."""
    n_docs = df.count()
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                          r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    dfreq = (F.approx_count_distinct(id_col) if approx_df
             else F.countDistinct(id_col))
    out = (words.groupBy("word")
           .agg(F.count(F.lit(1)).alias("total_count"),
                dfreq.alias("doc_freq"))
           .withColumn("idf", F.log(F.lit(float(n_docs))
                                    / F.col("doc_freq"))))
    if top_n:
        out = out.orderBy(F.col("total_count").desc(), "word").limit(top_n)
    return out


def remove_boilerplate_lines(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id",
                             min_docs: int = 2) -> DataFrame:
    """Corpus-level exact line dedup (boilerplate removal, the
    RefinedWeb/CCNet hygiene step): a line whose normalized form appears
    in >= `min_docs` DISTINCT documents is dropped from every document;
    blank lines are structural and always kept.

    100 TB shape: the line explode shuffles (id, idx, xxhash64) — 24
    bytes per line, line text stays map-side; the boilerplate-hash table
    is tiny (only repeated lines) so AQE broadcasts the anti-join; the
    reassembly reuses the ordered-collect shape (one groupBy on id,
    array sort inside the finished group)."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("__idx", "__line"))
    norm = F.trim(F.lower(F.col("__line")))
    keyed = lines.withColumn(
        "__h", F.when(norm != "", F.xxhash64(norm)))
    boiler = (keyed.filter(F.col("__h").isNotNull())
              .select("__h", id_col).distinct()
              .groupBy("__h").count()
              .filter(F.col("count") >= min_docs)
              .select("__h"))
    kept = keyed.join(boiler, "__h", "left_anti")
    reassembled = (kept
                   .groupBy(id_col)
                   .agg(F.array_join(
                       F.transform(
                           F.array_sort(F.collect_list(
                               F.struct(F.col("__idx").alias("i"),
                                        F.col("__line").alias("l")))),
                           lambda s: s.l),
                       "\n").alias(text_col)))
    return (df.drop(text_col)
            .join(reassembled, id_col, "left")
            .withColumn(text_col, F.coalesce(text_col, F.lit(""))))


def tfidf_top_terms(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document — the classic featurizer
    (keyword extraction, nearest-neighbor features, topic seeds):
    weight = tf * ln(N / doc_freq).

    100 TB shape: term frequencies are one (id, word)-keyed aggregation
    with map-side combine; the vocabulary (word, doc_freq) table is tiny
    relative to the corpus (vocabularies grow ~log of corpus size), so
    AQE broadcasts the weight join; the per-doc top-k is one window over
    the (id, word, weight) rows — documents themselves never shuffle."""
    from pyspark.sql import Window

    n_docs = df.count()
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                          r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    # one explode+shuffle builds tf; doc_freq falls out of the SAME
    # aggregate ((id, word) rows are already distinct), so the corpus is
    # never exploded twice — tf is materialized because both the vocab
    # aggregate and the weight join consume it.
    # The shuffle is keyed by id ALONE (round 9, guide §2.4 "two
    # operations keyed the same way share one exchange"):
    # HashPartitioning(id) satisfies the (id, word) aggregate's
    # clustering AND the top-k window's partitionBy(id), and the
    # localCheckpoint preserves it, so the window below reads the tf
    # table exchange-free — the previous hash(id, word) keying forced a
    # second full shuffle+sort of the tf table.  Trade measured at sf1:
    # the id-keyed exchange carries raw exploded tokens (no map-side
    # (id, word) combine) but deletes the window exchange — warm noop
    # 5.1 -> 1.7 s, rows identical; id cardinality = corpus documents,
    # so the keyed repartition cannot skew at any scale.
    from wvlet_spark.ops.util import materialize_if_big
    tf = materialize_if_big(
        words.repartition(id_col)
        .groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("tf")),
        df)
    vocab = tf.groupBy("word").agg(F.count(F.lit(1)).alias("doc_freq"))
    weighted = (tf.join(vocab, "word")
                .withColumn("weight",
                            F.round(F.col("tf")
                                    * F.log(F.lit(float(n_docs))
                                            / F.col("doc_freq")), 6)))
    w = Window.partitionBy(id_col).orderBy(
        F.col("weight").desc(), F.col("word"))
    return (weighted.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(id_col, "word", "tf", "weight", "rn"))


def chunk_documents(df: "DataFrame", chunk_tokens: int = 100,
                    overlap: int = 20, text_col: str = "text",
                    id_col: str = "doc_id") -> "DataFrame":
    """Sliding-window document chunking (pretraining / RAG prep): split
    each doc's whitespace tokens into windows of `chunk_tokens` that
    advance by `chunk_tokens - overlap`.  Pure JVM array expressions —
    split once, explode the window starts, slice per chunk; map-only with
    a bounded xK row amplification (K = ceil(tokens / step)), so the
    oracle can mirror the exact same list algebra."""
    step = chunk_tokens - overlap
    if step <= 0:
        raise ValueError("chunk_tokens must exceed overlap")
    words = F.split(F.col(text_col), r"\s+")
    starts = F.sequence(F.lit(0),
                        F.greatest(F.size(words) - 1, F.lit(0)),
                        F.lit(step))
    exploded = (df.select(F.col(id_col), words.alias("__w"),
                          F.posexplode(starts).alias("chunk_idx", "__s")))
    chunk_words = F.slice(F.col("__w"), F.col("__s") + 1, chunk_tokens)
    return (exploded.select(
        id_col, "chunk_idx",
        F.array_join(chunk_words, " ").alias("chunk_text"),
        F.size(chunk_words).cast("long").alias("n_tokens"))
        .filter(F.col("n_tokens") > 0))


def unigram_lm_logprob(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-document average unigram log-probability under a language model
    trained on the corpus itself — the classic cheap perplexity-style
    quality filter for training-data pipelines (docs full of rare/garbled
    tokens score low; boilerplate scores high).  KenLM-style n-gram LMs
    add context but the unigram form is fully relational, which keeps the
    whole op inside codegen and gives it an exact SQL oracle.

    Returns (doc_id, n_tokens, avg_logp) where
    avg_logp = sum_w tf(w) * log10 p(w) / n_tokens and
    p(w) = corpus_count(w) / corpus_total.

    100 TB shape: one explode -> (doc, word) tf aggregate (map-side
    combine absorbs stopword skew), vocab = word-keyed re-aggregate of tf
    (never re-reads the corpus), tf-vocab join is word-keyed; the corpus
    total joins in as a broadcast single-row aggregate — no driver
    collect, no second scan of the documents."""
    tf = (df.select(F.col(id_col),
                    F.explode(_tokens(F.col(text_col))).alias("w"))
          .filter(F.col("w") != "")
          .groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("tf")))
    from wvlet_spark.ops.util import materialize_if_big
    tf = materialize_if_big(tf, df)  # feeds vocab AND the scoring join
    vocab = tf.groupBy("w").agg(F.sum("tf").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    scored = (tf.join(vocab, on="w")
              .crossJoin(F.broadcast(total))
              .groupBy(id_col)
              .agg(F.sum("tf").alias("n_tokens"),
                   (F.sum(F.col("tf") * (F.log10("cnt") - F.log10("total")))
                    / F.sum("tf")).alias("avg_logp")))
    return scored


def corpus_profile(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   group_col: str = "source") -> DataFrame:
    """Per-source corpus statistics — the "data card" builder run before
    mixing a training corpus: document and token counts, length
    distribution (median via exact percentile), duplicate-text rate and
    mean quality proxies per group.

    Returns one row per group:
      (group, n_docs, n_tokens, median_tokens, distinct_texts, dup_rate,
       mean_alpha_ratio)

    100 TB shape: one pass computing per-doc features map-side, then a
    single groupBy(source) aggregate — percentile over doc-level token
    counts shuffles only (group, n_tok) pairs; duplicate detection reuses
    the md5-of-normalized-text trick from exact_dedup, counted with
    count(DISTINCT hash) inside the same aggregate (no second scan)."""
    toks = _tokens(F.col(text_col))
    norm_hash = F.md5(F.lower(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    alpha_ratio = (F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
                   / F.greatest(F.length(F.col(text_col)), F.lit(1)))
    per_doc = df.select(
        F.col(group_col).alias("grp"),
        F.size(F.filter(toks, lambda w: w != "")).alias("__ntok"),
        norm_hash.alias("__h"),
        alpha_ratio.alias("__alpha"),
    )
    return (per_doc.groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("__ntok").alias("n_tokens"),
                 F.expr("percentile(__ntok, 0.5)").alias("median_tokens"),
                 F.countDistinct("__h").alias("distinct_texts"),
                 (1.0 - F.countDistinct("__h") / F.count(F.lit(1)))
                 .alias("dup_rate"),
                 F.avg("__alpha").alias("mean_alpha_ratio"))
            .withColumnRenamed("grp", group_col))


def _adjacent_pairs(d: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) for every adjacent token pair — derived from the token
    ARRAY with transform+sequence, entirely map-side.  The earlier
    posexplode + lead() window form shuffled and SORTED every token by
    (doc, pos) — measured 33-39 s at sf10 (100 M tokens) vs map-only here;
    at cluster scale the window version is a full-corpus sort for data
    that is already in document order inside each row."""
    w = F.filter(_tokens(F.col(text_col)), lambda x: x != "")
    n = F.size(w)
    # arrays_zip of two slices: every argument evaluates ONCE per row.
    # The transform(sequence, i -> element_at(w, i)) form re-evaluates
    # the whole split+filter PER ELEMENT (the repo's documented
    # higher-order-function trap) — measured 3x SLOWER than even the
    # window version at sf10; this form is ~8x faster than the window
    pair_arr = F.when(n >= 2, F.arrays_zip(
        F.slice(w, 1, n - 1).alias("w1"),
        F.slice(w, 2, n - 1).alias("w2"))).otherwise(F.array())
    return (d.select(F.col(id_col), F.explode(pair_arr).alias("p"))
            .select(id_col, F.col("p.w1").alias("w1"),
                    F.col("p.w2").alias("w2")))


def bigram_lm_logprob(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      train_df: DataFrame | None = None,
                      backoff: float = 0.4) -> DataFrame:
    """Per-document average bigram log-probability with stupid backoff
    (Brants et al. 2007 — the standard web-scale smoothing: no
    normalization pass, so the whole model stays relational):

        score(w2|w1) = c(w1 w2)/c(w1 .)          if the bigram was seen
                       backoff * c(w2)/total     otherwise

    Trained on `train_df` (default: the scored corpus itself) and scored
    over `df` — with a held-out training split the backoff branch fires
    on unseen bigrams, which is the production shape (score incoming docs
    against a trusted-corpus model).  Sharper than unigram_lm_logprob:
    garbled word ORDER scores low even when the words are common.

    Returns (doc_id, n_bigrams, avg_logp).

    100 TB shape: map-only pair derivation per side (no
    global shuffle), (w1,w2)/w1/w2-keyed combines for the model counts,
    scoring via LEFT joins keyed on the bigram then the unigram —
    map-side combine absorbs the Zipf head; the corpus total broadcasts."""
    def _pairs(d):
        return _adjacent_pairs(d, text_col, id_col)

    train = _pairs(train_df if train_df is not None else df)
    from wvlet_spark.ops.util import materialize_if_big
    train = materialize_if_big(
        train, train_df if train_df is not None else df)  # model + scoring
    # every model table derives from the COMPACT (w1, w2, c12) aggregate:
    # c(w1 .) = sum of c12 over w2 (identical value to counting the raw
    # pairs), so the unigram/total passes re-aggregate distinct-bigram
    # rows instead of re-shuffling every token position — at corpus scale
    # the raw pair table is tokens-sized while the bigram-type table is
    # Zipf-compact (guide §2.3 "aggregate before you shuffle")
    big = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    big = materialize_if_big(
        big, train_df if train_df is not None else df)  # 4 consumers
    uni = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    w2tot = big.groupBy("w2").agg(F.sum("c12").alias("c2"))
    total = big.agg(F.coalesce(F.sum("c12"), F.lit(0)).alias("total"))
    score = _pairs(df) if train_df is not None else train
    scored = (score.join(big, on=["w1", "w2"], how="left")
              .join(uni, on="w1", how="left")
              .join(w2tot, on="w2", how="left")
              .crossJoin(F.broadcast(total)))
    logp = F.when(F.col("c12").isNotNull(),
                  F.log10(F.col("c12") / F.col("c1")))         .otherwise(F.log10(F.lit(backoff)
                           * F.coalesce(F.col("c2"), F.lit(0.5))
                           / F.col("total")))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.avg(logp).alias("avg_logp")))


def collocations_pmi(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", min_count: int = 5,
                     top_k: int = 50) -> DataFrame:
    """Top collocations (adjacent word pairs) by pointwise mutual
    information: PMI(w1,w2) = log10( p(w1,w2) / (p(w1) p(w2)) ) with
    p from corpus bigram/unigram counts — the classic collocation
    extractor (Church & Hanks 1990), used in pipelines to find
    multi-word units worth preserving in tokenization and to spot
    templated/boilerplate phrases.

    Returns (w1, w2, pair_count, pmi), top_k rows by (pmi, pair) among
    pairs seen >= min_count times.

    100 TB shape: map-only pair derivation (_adjacent_pairs), one
    (w1,w2) combine and one w combine, two word-keyed hash joins; the
    min_count filter prunes the long tail BEFORE the joins, and the
    final top-k is a TakeOrdered, not a global sort."""
    pairs = _adjacent_pairs(df, text_col, id_col).select("w1", "w2")
    # ONE shuffle of the token-sized pair stream builds the compact
    # (w1, w2, pair_count) table; the unigram-position counts and the
    # total derive from IT by re-aggregation (sum of pair_count grouped
    # by w1 is exactly the count of positions with that left word), so
    # the raw pairs are exploded and shuffled once instead of four times
    # (guide §2.3) — the probabilities are unchanged by construction
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    from wvlet_spark.ops.util import materialize_if_big
    pc = materialize_if_big(pc, df)  # filter + both unigram sides + total
    big = pc.filter(F.col("pair_count") >= min_count)
    uni1 = pc.groupBy("w1").agg(F.sum("pair_count").alias("c1"))
    uni2 = pc.groupBy("w2").agg(F.sum("pair_count").alias("c2"))
    total = pc.agg(F.coalesce(F.sum("pair_count"), F.lit(0)).alias("total"))
    pmi = F.log10((F.col("pair_count") * F.col("total"))
                  / (F.col("c1") * F.col("c2")))
    return (big.join(uni1, on="w1").join(uni2, on="w2")
            .crossJoin(F.broadcast(total))
            .select("w1", "w2", "pair_count", pmi.alias("pmi"))
            .orderBy(F.col("pmi").desc(), "w1", "w2")
            .limit(top_k))


def length_histogram(df: DataFrame, value_col: str = "n_chars",
                     group_col: str | None = "lang",
                     n_buckets: int = 16,
                     lo: float | None = None,
                     hi: float | None = None) -> DataFrame:
    """Fixed-width histogram of a numeric column, optionally per group —
    the length-distribution panel of a data card (spotting truncation
    spikes, boilerplate walls, or length filters that bit too hard).

    Bucketing uses `width_bucket(v, lo, hi, n)` (identical in Spark and
    DuckDB: bucket 0 = underflow, n+1 = overflow), so a DuckDB oracle can
    re-derive the exact counts.  When lo/hi are not given they come from
    one tiny global min/max aggregate (two scalars to the driver — bounds,
    not data).  The histogram itself is one map-side-combinable groupBy
    over at most groups x (n_buckets+2) cells: fully scalable.
    """
    from wvlet_spark.ops.util import ensure_map_parallelism

    df = ensure_map_parallelism(df)
    if lo is None or hi is None:
        row = df.agg(F.min(value_col).alias("lo"),
                     F.max(value_col).alias("hi")).collect()[0]
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    if hi <= lo:
        hi = lo + 1.0
    b = F.width_bucket(F.col(value_col).cast("double"),
                       F.lit(lo), F.lit(hi), F.lit(n_buckets))
    keys = ([F.col(group_col)] if group_col else []) + [b.alias("bucket")]
    out = (df.groupBy(*keys).agg(F.count("*").alias("n"))
           .withColumn("bucket_lo",
                       F.lit(lo) + (F.col("bucket") - 1)
                       * ((F.lit(hi) - F.lit(lo)) / n_buckets)))
    return out


def ngram_diversity(df: DataFrame, text_col: str = "text",
                    group_col: str = "source",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-group n-gram diversity (bigram type/token ratio): distinct
    adjacent word pairs over total pairs, plus the unigram ratio — the
    standard corpus-diversity panel for spotting templated or
    over-duplicated sources before training (low ratio = repetitive).

    100 TB path: pairs derive map-only from each row's token array
    (_adjacent_pairs — no corpus sort), and both distinct counts are
    group-keyed aggregates with map-side partial combine; output is one
    row per source."""
    toks = (df.select(F.col(group_col).alias("grp"),
                      F.explode(F.filter(_tokens(F.col(text_col)),
                                         lambda x: x != "")).alias("w")))
    uni = toks.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_unigrams"),
        F.countDistinct("w").alias("d_unigrams"))
    pairs = (_adjacent_pairs(df.withColumnRenamed(group_col, "__grp"),
                             text_col, "__grp")
             .select(F.col("__grp").alias("grp"),
                     F.concat_ws(" ", "w1", "w2").alias("g")))
    bi = pairs.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.countDistinct("g").alias("d_bigrams"))
    out = uni.join(bi, "grp", "left")
    return (out.select(
        F.col("grp").alias(group_col),
        "n_unigrams", "d_unigrams",
        (F.col("d_unigrams") / F.col("n_unigrams")).alias("unigram_ttr"),
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("d_bigrams", F.lit(0)).alias("d_bigrams"),
        (F.coalesce("d_bigrams", F.lit(0))
         / F.greatest(F.coalesce("n_bigrams", F.lit(0)), F.lit(1)))
        .alias("bigram_ttr")))


def length_ntile_bins(df: DataFrame, value_col: str = "n_chars",
                      group_col: str = "source", id_col: str = "doc_id",
                      n_bins: int = 8) -> DataFrame:
    """Equi-depth length binning per group (curriculum / bucketed-batching
    prep): ntile over a TOTAL order (value, id — deterministic under
    ties, so every engine derives identical bins), then per-bin count and
    value bounds.

    100 TB path: one shuffle on group_col with a per-group sort (the
    operation's semantics); bins then aggregate with map-side combine.
    For skewed single groups the same panel can run on the width_bucket
    histogram (length_histogram) instead — documented tradeoff, not a
    hidden cap."""
    from pyspark.sql import Window

    w = (Window.partitionBy(group_col)
         .orderBy(F.col(value_col).asc(), F.col(id_col).asc()))
    binned = df.withColumn("bin", F.ntile(int(n_bins)).over(w))
    return (binned.groupBy(group_col, "bin")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min(value_col).alias("lo"),
                 F.max(value_col).alias("hi"),
                 F.avg(value_col).alias("mean_len")))
