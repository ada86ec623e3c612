"""Driver-contract entries for the extension operators.

Each query is a (spark, sf_dir) -> DataFrame callable over the testdata
`documents` / `embeddings` tables.  Where the computation is expressible in
portable SQL, a hand-written DuckDB oracle accompanies it; hash-based ops
(xxhash64 signatures) have no DuckDB equivalent and get the driver's
weaker rows-only check — their row counts are deterministic.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd  # module-level: pandas_udf type hints must resolve
from pyspark.sql import functions as F

from wvlet_spark.ops.util import sort_once

# The driver's correctness gate runs Spark + DuckDB side-by-side at
# sf=0.01 (TESTDATA.md).  Data-dependent oracle constants — the seeded
# k-means centroid matrix and the query vector — are derived from the
# SAME parquet at oracle-build time (pyarrow read, sorted by vec_id; the
# Spark side trains on the orderBy(vec_id)-limited sample, so the inputs
# are row-identical) and inlined as SQL literals, the pattern the
# hyperplane-LSH oracle below already uses for its seeded planes.
_ORACLE_SF_DIR = os.environ.get("WVLET_SPARK_ORACLE_SF_DIR",
                                "/root/testdata/sf0.01")
_ORACLE_NP_CACHE: dict[str, tuple] = {}


def _oracle_embeddings_np() -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, X) from the oracle-scale embeddings parquet, vec_id-sorted."""
    hit = _ORACLE_NP_CACHE.get(_ORACLE_SF_DIR)
    if hit is None:
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(_ORACLE_SF_DIR, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
        d = t.to_pydict()
        order = np.argsort(np.asarray(d["vec_id"]), kind="stable")
        ids = np.asarray(d["vec_id"])[order]
        X = np.array([d["embedding"][i] for i in order], dtype=np.float64)
        hit = (ids, X)
        _ORACLE_NP_CACHE[_ORACLE_SF_DIR] = hit
    return hit


def _centroid_values_sql(C: np.ndarray) -> str:
    """k-means centroid matrix as DuckDB VALUES rows (i, [coeffs...])."""
    return ",\n    ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in C[i])}])"
        for i in range(len(C)))


def _vec_literal(v: np.ndarray) -> str:
    return "[" + ", ".join(repr(float(x)) for x in v) + "]"


def _docs(spark, sf_dir):
    from wvlet_spark.session import read_parquet_robust

    return read_parquet_robust(spark, f"{sf_dir}/documents.parquet")


def _embs(spark, sf_dir):
    from wvlet_spark.session import read_parquet_robust

    return read_parquet_robust(spark, f"{sf_dir}/embeddings.parquet")


# (application id, sf_dir) -> first embedding vector.  Both ANN entries use
# the same query vector; fetching it is a real one-row job, so pay it once
# per (application, dataset) instead of once per query invocation.
_QV_CACHE: dict[tuple[str, str], list[float]] = {}


def _query_vec(spark, sf_dir) -> list[float]:
    key = (spark.sparkContext.applicationId, sf_dir)
    qv = _QV_CACHE.get(key)
    if qv is None:
        emb = _embs(spark, sf_dir)
        qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
        _QV_CACHE[key] = qv
    return qv


# ---------------------------------------------------------------------------


def q_exact_dedup(spark, sf_dir):
    from wvlet_spark.ops.dedup import exact_dedup

    out = exact_dedup(_docs(spark, sf_dir))
    return out.select("doc_id", "dup_count", "lang", "source").transform(sort_once, "doc_id", checkpoint=False)


O_EXACT_DEDUP = r"""
WITH h AS (
  SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS hh,
         min(doc_id) AS doc_id, count(*) AS dup_count
  FROM documents GROUP BY 1
)
SELECT h.doc_id, h.dup_count, d.lang, d.source
FROM h JOIN documents d ON h.doc_id = d.doc_id
ORDER BY h.doc_id
"""


def q_minhash_pairs(spark, sf_dir):
    from wvlet_spark.ops.dedup import minhash_near_dup_pairs

    out = minhash_near_dup_pairs(_docs(spark, sf_dir), threshold=0.5)
    return out.select("id_a", "id_b", F.round("est_jaccard", 4).alias("est_jaccard")) \
        .transform(sort_once, "id_a", "id_b")


def q_simhash_pairs(spark, sf_dir):
    from wvlet_spark.ops.dedup import simhash_near_dup_pairs

    out = simhash_near_dup_pairs(_docs(spark, sf_dir))
    return out.filter(F.col("hamming") <= 6).transform(sort_once, "id_a", "id_b")


def q_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard over LSH-bounded candidates (the scale path:
    minhash banding proposes, exact Jaccard verifies — candidate count is
    bounded by bucket collisions, never n²).  The DuckDB oracle computes
    the full all-pairs Jaccard; equality holds because banding recall at
    the corpus's near-dup similarity (j >= 0.9) is ~1."""
    from wvlet_spark.ops.dedup import minhash_near_dup_pairs, ngram_jaccard_pairs

    docs = _docs(spark, sf_dir)
    cands = minhash_near_dup_pairs(docs, threshold=0.2)
    out = ngram_jaccard_pairs(docs, n=3, candidates=cands, threshold=0.5)
    return out.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard")) \
        .transform(sort_once, "id_a", "id_b", checkpoint=False)


O_NGRAM_JACCARD = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents
), g AS (
  SELECT doc_id, CASE WHEN len(w) >= 3 THEN
      list_distinct(list_transform(generate_series(1, len(w)-2),
                    i -> concat_ws(' ', w[i], w[i+1], w[i+2])))
    ELSE [array_to_string(w, ' ')] END AS grams
  FROM t
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / len(list_distinct(list_concat(a.grams, b.grams))), 4) AS jaccard
FROM g a JOIN g b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5
ORDER BY id_a, id_b
"""


def q_dup_clusters(spark, sf_dir):
    """Duplicate clusters: LSH-bounded n-gram Jaccard pairs -> connected
    components -> every document labeled with its cluster representative.
    The DuckDB oracle recomputes the same Jaccard edge set all-pairs and
    derives components with a recursive transitive-closure CTE, so the
    iterative Spark label propagation is verified against an independent
    formulation."""
    from wvlet_spark.ops.dedup import minhash_near_dup_pairs, ngram_jaccard_pairs
    from wvlet_spark.ops.graph import duplicate_clusters

    docs = _docs(spark, sf_dir)
    cands = minhash_near_dup_pairs(docs, threshold=0.2)
    pairs = ngram_jaccard_pairs(docs, n=3, candidates=cands, threshold=0.5)
    return duplicate_clusters(docs, pairs).transform(sort_once, "doc_id")


O_DUP_CLUSTERS = r"""
WITH RECURSIVE t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents
), g AS (
  SELECT doc_id, CASE WHEN len(w) >= 3 THEN
      list_distinct(list_transform(generate_series(1, len(w)-2),
                    i -> concat_ws(' ', w[i], w[i+1], w[i+2])))
    ELSE [array_to_string(w, ' ')] END AS grams
  FROM t
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM g a JOIN g b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), walk(a, b) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT w.a, e.b FROM walk w JOIN edges e ON w.b = e.a
)
SELECT a AS doc_id, min(b) AS cluster_id, a = min(b) AS is_canonical
FROM walk GROUP BY a ORDER BY doc_id
"""


def q_ivf_topk(spark, sf_dir):
    """IVF approximate top-k against the first vector (seeded k-means
    lists, nprobe nearest lists probed, exact cosine inside).  The DuckDB
    oracle (_ivf_topk_oracle) re-derives assignment + probes from the
    inlined trained centroids; recall vs brute force is pytest-checked."""
    from wvlet_spark.ops.similarity import ivf_topk

    emb = _embs(spark, sf_dir)
    qv = _query_vec(spark, sf_dir)
    out = ivf_topk(emb, qv, k=10, n_clusters=8, nprobe=3)
    return out.select("vec_id", F.round("cosine", 5).alias("cosine"))


def q_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k against the all-ones query vector
    (cosine(v, ones) = sum(v) / (|v| * sqrt(dim)), so the oracle needs no
    literal array and the query is dimension-free — no extra job to read
    the dim).  numpy over Arrow batches; scan + TakeOrdered, no shuffle."""
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def _ones_cos(v: pd.Series) -> pd.Series:
        from wvlet_spark.ops.similarity import _mat

        M = _mat(v)
        if M.shape[0] == 0:
            return pd.Series(np.zeros(0))
        norms = np.sqrt(np.einsum("ij,ij->i", M, M)) * np.sqrt(M.shape[1])
        norms[norms == 0.0] = 1.0
        return pd.Series(M.sum(axis=1) / norms)

    emb = _embs(spark, sf_dir)
    return (
        emb.select("vec_id", F.round(_ones_cos(F.col("embedding")), 5).alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )


O_COSINE_TOPK = """
SELECT vec_id,
       round(list_sum(CAST(embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                * sqrt(CAST(len(embedding) AS DOUBLE))), 5) AS cosine
FROM embeddings
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


def q_embedding_dedup(spark, sf_dir):
    """Embedding-cosine near-dup pairs via the LSH bucket-equi-join (the
    100 TB path: only same-bucket pairs pay a dot product — never n²).
    The oracle recomputes the SAME deterministic hyperplane buckets from
    literal coefficients in DuckDB, so the full LSH semantics — bucketing
    included — are independently verified, not just the final cosine.
    The exact all-pairs baseline stays as a pytest recall oracle
    (tests assert LSH pairs ⊆ exact pairs)."""
    from wvlet_spark.ops.similarity import embedding_near_dup_pairs

    return embedding_near_dup_pairs(
        _embs(spark, sf_dir), threshold=0.3, use_lsh=True, planes=8,
    ).transform(sort_once, "id_a", "id_b")


def _embedding_dedup_lsh_oracle(dim: int = 64, planes: int = 8) -> str:
    """DuckDB SQL recomputing the rp_lsh_buckets assignment from the same
    seeded hyperplanes, then same-bucket pairs + exact cosine >= 0.3."""
    from wvlet_spark.ops.similarity import _hyperplanes

    H = _hyperplanes(dim, planes, seed=42)
    rows = ",\n    ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in H[i])}])"
        for i in range(planes)
    )
    return f"""
WITH hp(i, h) AS (VALUES
    {rows}
),
b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sum(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), hp.h) >= 0
                  THEN (1::BIGINT << hp.i) ELSE 0 END) AS bucket
  FROM embeddings, hp
  GROUP BY vec_id, embedding
)
SELECT a.vec_id AS id_a, c.vec_id AS id_b,
       round(list_dot_product(a.v, c.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))), 4) AS cosine
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
WHERE round(list_dot_product(a.v, c.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))), 4) >= 0.3
ORDER BY id_a, id_b
"""


def q_lsh_topk(spark, sf_dir):
    from wvlet_spark.ops.similarity import lsh_bucket_topk

    emb = _embs(spark, sf_dir)
    qv = _query_vec(spark, sf_dir)
    out = lsh_bucket_topk(emb, qv, k=10, planes=6, multiprobe=3)
    return out.select("vec_id", F.round("cosine", 5).alias("cosine"))


def q_language_id(spark, sf_dir):
    from wvlet_spark.ops.text import language_id

    out = language_id(_docs(spark, sf_dir))
    return out.groupBy("lang_pred").agg(F.count("*").alias("n")).transform(sort_once, "lang_pred", checkpoint=False)


def _stop_sql(lang: str) -> str:
    from wvlet_spark.ops.text import STOPWORDS

    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


def _langid_oracle() -> str:
    score = (
        "len(list_intersect(list_distinct("
        "string_split_regex(lower(trim(text)), '\\s+')), {lst}))"
    )
    s_en = score.format(lst=_stop_sql("en"))
    s_de = score.format(lst=_stop_sql("de"))
    s_fr = score.format(lst=_stop_sql("fr"))
    s_es = score.format(lst=_stop_sql("es"))
    return f"""
WITH scored AS (
  SELECT {s_en} AS s_en, {s_de} AS s_de, {s_fr} AS s_fr, {s_es} AS s_es
  FROM documents
), labeled AS (
  SELECT CASE
    WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'unknown'
    WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
    WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
    WHEN s_fr >= s_es THEN 'fr'
    ELSE 'es' END AS lang_pred
  FROM scored
)
SELECT lang_pred, count(*) AS n FROM labeled GROUP BY lang_pred ORDER BY lang_pred
"""


def q_token_stats(spark, sf_dir):
    from wvlet_spark.ops.text import token_stats

    out = token_stats(_docs(spark, sf_dir))
    return out.select(
        "doc_id", "n_tokens", "n_chars_computed", "n_bpeish",
        F.round("avg_word_len", 5).alias("avg_word_len"),
    ).transform(sort_once, "doc_id")


O_TOKEN_STATS = r"""
SELECT doc_id,
       len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
       length(text) AS n_chars_computed,
       len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^\sA-Za-z0-9]', 0)) AS n_bpeish,
       round(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
             / len(string_split_regex(lower(trim(text)), '\s+')), 5) AS avg_word_len
FROM documents
ORDER BY doc_id
"""


def q_quality_score(spark, sf_dir):
    from wvlet_spark.ops.text import quality_score

    out = quality_score(_docs(spark, sf_dir))
    return out.select("doc_id", F.round("quality", 5).alias("quality")).transform(sort_once, "doc_id")


def _quality_oracle() -> str:
    en = _stop_sql("en")
    return rf"""
WITH t AS (
  SELECT doc_id,
    CAST(length(text) AS DOUBLE) AS n,
    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS punct,
    CAST(len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\s+')), {en})) AS DOUBLE) AS stop_hits
  FROM documents
)
SELECT doc_id,
  round(
    least(n / 500.0, 1.0) * 0.3
    + (CASE WHEN n > 0 THEN alpha / n ELSE 0.0 END) * 0.3
    + (1 - (CASE WHEN n > 0 THEN least(punct / n * 10.0, 1.0) ELSE 0.0 END)) * 0.1
    + least(stop_hits / 5.0, 1.0) * 0.3, 5) AS quality
FROM t
ORDER BY doc_id
"""


def q_fingerprint(spark, sf_dir):
    from wvlet_spark.ops.text import document_fingerprint

    out = document_fingerprint(_docs(spark, sf_dir))
    return out.select("doc_id", "fingerprint_md5").transform(sort_once, "doc_id")


O_FINGERPRINT = r"""
SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fingerprint_md5
FROM documents
ORDER BY doc_id
"""


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling: rebalance the corpus to
    per-language keep rates decided by key hash (reproducible across
    engines and partitionings — the oracle recomputes membership with the
    same md5-prefix comparison in DuckDB)."""
    from wvlet_spark.ops.sampling import stratified_deterministic_sample

    fr = {"en": 0.5, "de": 0.9, "fr": 0.9, "es": 0.9}
    out = stratified_deterministic_sample(
        _docs(spark, sf_dir), fr, strata_col="lang", default_fraction=0.25)
    return out.select("doc_id", "lang").transform(sort_once, "doc_id", checkpoint=False)


def _stratified_sample_oracle() -> str:
    from wvlet_spark.ops.sampling import _threshold_hex

    return f"""
SELECT doc_id, lang FROM documents
WHERE substring(md5('wv' || CAST(doc_id AS VARCHAR)), 1, 8) <
      CASE lang
        WHEN 'en' THEN '{_threshold_hex(0.5)}'
        WHEN 'de' THEN '{_threshold_hex(0.9)}'
        WHEN 'fr' THEN '{_threshold_hex(0.9)}'
        WHEN 'es' THEN '{_threshold_hex(0.9)}'
        ELSE '{_threshold_hex(0.25)}' END
ORDER BY doc_id
"""


def q_mixture(spark, sf_dir):
    """Target-mixture sampling: keep the largest subsample matching
    {src0: 0.5, src1: 0.3, src2: 0.2}.  The oracle re-derives the whole
    computation in SQL — per-source counts, T = min(n/w), per-source
    fractions (including the fraction=1.0 edge), md5 thresholds, and
    membership — not just the final row set."""
    from wvlet_spark.ops.sampling import mixture_sample

    out = mixture_sample(_docs(spark, sf_dir),
                         {"src0": 0.5, "src1": 0.3, "src2": 0.2})
    return out.select("doc_id", "source").transform(sort_once, "doc_id", checkpoint=False)


O_MIXTURE = """
WITH w(source, wt) AS (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)),
c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
t AS (SELECT min(n / wt) AS t FROM c JOIN w USING (source)),
fr AS (
  SELECT c.source, least(1.0, (SELECT t FROM t) * wt / n) AS frac
  FROM c JOIN w USING (source)
),
thr AS (
  SELECT source,
         CASE WHEN CAST(round(frac * 4294967296) AS BIGINT) >= 4294967296
              THEN 'gggggggg'
              ELSE printf('%08x', CAST(round(frac * 4294967296) AS BIGINT))
         END AS th
  FROM fr
)
SELECT d.doc_id, d.source
FROM documents d JOIN thr ON d.source = thr.source
WHERE substring(md5('wv' || CAST(d.doc_id AS VARCHAR)), 1, 8) < th
ORDER BY d.doc_id
"""


def q_epoch_shuffle(spark, sf_dir):
    """Deterministic per-epoch training-order shuffle: position derived
    from an engine-portable md5 of (salt, epoch, doc_id), so the exact
    permutation — not just the row set — is oracle-checkable.  Epoch 2
    pinned; a pytest asserts epochs differ and reruns agree."""
    from wvlet_spark.ops.sampling import epoch_shuffle

    out = epoch_shuffle(_docs(spark, sf_dir).select("doc_id", "source"),
                        epoch=2)
    return (out.select("position", "doc_id", "source")
            .orderBy("position").limit(5000))


O_EPOCH_SHUFFLE = """
SELECT CAST(row_number() OVER (
         ORDER BY md5('wv:2:' || CAST(doc_id AS VARCHAR)), doc_id)
       AS INTEGER) AS position,
       doc_id, source
FROM documents
ORDER BY position
LIMIT 5000
"""


def q_chunking(spark, sf_dir):
    """Sliding-window chunking of the documents table (120-token chunks,
    24-token overlap); the oracle mirrors the identical window starts and
    list slicing in DuckDB."""
    from wvlet_spark.ops.text import chunk_documents

    out = chunk_documents(_docs(spark, sf_dir), chunk_tokens=120,
                          overlap=24)
    return (out.select("doc_id", "chunk_idx",
                       F.md5("chunk_text").alias("chunk_md5"), "n_tokens")
            .transform(sort_once, "doc_id", "chunk_idx"))


O_CHUNKING = r"""
WITH d AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
),
s AS (
  SELECT doc_id, w,
         unnest(range(0, greatest(len(w), 1), 96)) AS start
  FROM d
),
ch AS (
  SELECT doc_id, CAST(start // 96 AS INT) AS chunk_idx,
         list_slice(w, start + 1, start + 120) AS cw
  FROM s
)
SELECT doc_id, chunk_idx,
       md5(array_to_string(cw, ' ')) AS chunk_md5,
       CAST(len(cw) AS BIGINT) AS n_tokens
FROM ch
WHERE len(cw) > 0
ORDER BY doc_id, chunk_idx
"""


def q_pii_scan(spark, sf_dir):
    """PII scrub pass: deterministic PII is planted per doc_id (the corpus
    has none naturally), then counted and redacted with shared RE2-safe
    regexes.  The oracle rebuilds the identical augmented text in DuckDB
    and recomputes counts + redaction independently."""
    from wvlet_spark.ops.text import pii_scan

    d = F.col("doc_id")
    s = d.cast("string")
    planted = _docs(spark, sf_dir).select("doc_id", "text").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(d % 3 == 0, F.concat(F.lit(" contact u"), s,
                                        F.lit("@example.com")))
             .otherwise(F.lit("")),
            F.when(d % 4 == 0, F.lit(" call 555-123-4567"))
             .otherwise(F.lit("")),
            F.when(d % 5 == 0, F.concat(F.lit(" via http://s"), s,
                                        F.lit(".example/page")))
             .otherwise(F.lit("")),
            F.when(d % 7 == 0, F.concat(F.lit(" host 10.0.0."),
                                        (d % 256).cast("string")))
             .otherwise(F.lit("")),
        ))
    out = pii_scan(planted)
    return out.select("doc_id", "n_email", "n_phone", "n_ipv4", "n_url",
                      "redacted").transform(sort_once, "doc_id")


def _pii_oracle() -> str:
    from wvlet_spark.ops.text import PII_PATTERNS

    e, p, i, u = (PII_PATTERNS[k] for k in ("email", "phone", "ipv4", "url"))
    return f"""
WITH aug AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 3 = 0
            THEN ' contact u' || doc_id || '@example.com' ELSE '' END
    || CASE WHEN doc_id % 4 = 0 THEN ' call 555-123-4567' ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' via http://s' || doc_id || '.example/page' ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN ' host 10.0.0.' || (doc_id % 256) ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
  len(regexp_extract_all(text, '{e}', 0)) AS n_email,
  len(regexp_extract_all(text, '{p}', 0)) AS n_phone,
  len(regexp_extract_all(text, '{i}', 0)) AS n_ipv4,
  len(regexp_extract_all(text, '{u}', 0)) AS n_url,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    text, '{u}', '<URL>', 'g'), '{e}', '<EMAIL>', 'g'),
    '{i}', '<IPV4>', 'g'), '{p}', '<PHONE>', 'g') AS redacted
FROM aug
ORDER BY doc_id
"""


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization of the events table (the batch twin of the
    applyInPandasWithState streaming operator; same session boundaries)."""
    from wvlet_spark.session import read_parquet_robust
    from wvlet_spark.streaming import sessionize_batch

    ev = read_parquet_robust(spark, f"{sf_dir}/events.parquet")
    out = sessionize_batch(ev.select("user_id", "ts"), "user_id", "ts",
                           gap_seconds=6 * 3600)
    return out.transform(sort_once, "user_id", "session_start", checkpoint=False)


O_SESSIONIZE = """
WITH s AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts) > 21600000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), t AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM t GROUP BY user_id, sid ORDER BY user_id, session_start
"""


def q_multimodal_decode(spark, sf_dir):
    """Real PNG round trip: synthesize a deterministic constant-valued
    greyscale PNG per doc (pure-Python encoder), decode it with the real
    pure-Python PNG decoder (zlib inflate + filter reconstruction), and
    emit metadata + pixel mean.  The oracle predicts every column from
    doc_id alone, independently verifying the codec path end to end."""
    from wvlet_spark.ops.multimodal import decode_image_features, with_png_payload

    df = with_png_payload(_docs(spark, sf_dir).select("doc_id"))
    out = decode_image_features(df)
    return out.select(
        "doc_id", "format", "width", "height", "channels", "bit_depth",
        F.round("px_mean", 4).alias("px_mean"),
    ).transform(sort_once, "doc_id")


O_MULTIMODAL = """
SELECT doc_id,
       'image/png' AS format,
       CAST(doc_id % 16 + 1 AS BIGINT) AS width,
       CAST(doc_id % 8 + 1 AS BIGINT) AS height,
       CAST(1 AS BIGINT) AS channels,
       CAST(8 AS BIGINT) AS bit_depth,
       round(CAST(doc_id % 256 AS DOUBLE), 4) AS px_mean
FROM documents
ORDER BY doc_id
"""


def q_image_resize(spark, sf_dir):
    """Full image pipeline round trip: synthesize PNG -> nearest-neighbor
    resize to 8x5 (real decode, numpy index resize, real re-encode) ->
    decode the RESIZED payload with the real decoder.  Constant-valued
    source images make every output column a pure function of doc_id, so
    the oracle independently verifies both codec passes and the resize."""
    from wvlet_spark.ops.multimodal import (decode_image_features,
                                            resize_images, with_png_payload)

    df = with_png_payload(_docs(spark, sf_dir).select("doc_id"))
    resized = resize_images(df, target_w=8, target_h=5)
    out = decode_image_features(resized)
    return (out.select("doc_id", "width", "height",
                       F.round("px_mean", 4).alias("px_mean"))
            .transform(sort_once, "doc_id"))


O_IMAGE_RESIZE = """
SELECT doc_id,
       CAST(8 AS BIGINT) AS width,
       CAST(5 AS BIGINT) AS height,
       round(CAST(doc_id % 256 AS DOUBLE), 4) AS px_mean
FROM documents
ORDER BY doc_id
"""


def q_approx_distinct(spark, sf_dir):
    """HLL approximate distinct per group with an exact-tolerance
    verdict.  The raw estimates are estimator-specific, so the graded
    columns are the EXACT count and the boolean |approx-exact| <= 5% —
    a contract both engines' HLLs meet, making the approximate operator
    hash-gradeable without pretending the estimates match."""
    from wvlet_spark.ops.sketches import approx_distinct_by
    from wvlet_spark.session import read_parquet_robust

    ev = read_parquet_robust(spark, f"{sf_dir}/events.parquet")
    out = approx_distinct_by(ev, ["event_type"], "user_id")
    return (out.select("event_type", "n_exact", "within_tol")
            .transform(sort_once, "event_type", checkpoint=False))


O_APPROX_DISTINCT = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
         <= count(DISTINCT user_id) * 0.05 AS within_tol
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q_boilerplate(spark, sf_dir):
    """Corpus-level boilerplate line removal (RefinedWeb/CCNet hygiene):
    lines whose normalized form appears in >= 2 distinct docs are dropped
    from every doc.  The oracle re-derives the repeated-line set and the
    positional reassembly in DuckDB over the same corpus."""
    from wvlet_spark.ops.text import remove_boilerplate_lines

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    out = remove_boilerplate_lines(docs, min_docs=2)
    return (out.select("doc_id", "lang", "text",
                       F.length("text").cast("long").alias("n_chars"))
            .transform(sort_once, "doc_id", checkpoint=False))


O_BOILERPLATE = """
WITH d AS (
  SELECT doc_id, lang, string_split(text, chr(10)) AS ls FROM documents
),
l AS (
  SELECT doc_id, unnest(generate_series(1, len(ls))) AS i, ls FROM d
),
norm AS (
  SELECT doc_id, i, ls[i] AS ln, lower(trim(ls[i])) AS nl FROM l
),
boiler AS (
  SELECT nl FROM (SELECT DISTINCT nl, doc_id FROM norm WHERE nl <> '')
  GROUP BY nl HAVING count(*) >= 2
),
kept AS (
  SELECT doc_id, i, ln FROM norm
  WHERE nl = '' OR nl NOT IN (SELECT nl FROM boiler)
),
re AS (
  SELECT doc_id, string_agg(ln, chr(10) ORDER BY i) AS text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, d.lang, coalesce(re.text, '') AS text,
       CAST(length(coalesce(re.text, '')) AS BIGINT) AS n_chars
FROM d LEFT JOIN re ON d.doc_id = re.doc_id
ORDER BY d.doc_id
"""


def q_video_frames(spark, sf_dir):
    """Video frame-sampling plumbing (decode stubbed, Spark-side fan-out
    real): deterministic fake container per doc -> mapInPandas explodes
    each row into 4 (frame_idx, offset_ms, frame_payload) rows.  The
    oracle predicts frame count, offsets, slice length, and the actual
    first payload byte from doc_id alone, so the row-amplification shape
    and the byte plumbing are both independently verified."""
    from wvlet_spark.ops.multimodal import (sample_video_frames,
                                            with_video_payload)

    df = with_video_payload(_docs(spark, sf_dir).select("doc_id"))
    frames = sample_video_frames(df, n_frames=4)
    return (frames.select(
        "doc_id", "frame_idx", "offset_ms",
        F.length("frame_payload").cast("long").alias("frame_len"),
        F.conv(F.hex(F.expr("substring(frame_payload, 1, 1)")), 16, 10)
         .cast("long").alias("first_byte"))
        .transform(sort_once, "doc_id", "frame_idx"))


O_VIDEO_FRAMES = """
SELECT doc_id,
       r.range AS frame_idx,
       r.range * 2500 AS offset_ms,
       CAST((1000 + doc_id % 977) // 4 AS BIGINT) AS frame_len,
       CAST(doc_id % 251 AS BIGINT) AS first_byte
FROM documents, range(4) r
ORDER BY doc_id, frame_idx
"""


def q_audio_decode(spark, sf_dir):
    """Real WAV round trip: synthesize deterministic constant PCM16 clips,
    decode with the pure-Python RIFF/PCM16 decoder, emit per-clip stats;
    the oracle predicts everything from doc_id."""
    from wvlet_spark.ops.multimodal import decode_audio_features, with_wav_payload

    df = with_wav_payload(_docs(spark, sf_dir).select("doc_id"))
    out = decode_audio_features(df)
    return out.select(
        "doc_id", "format", "channels", "sample_rate", "n_samples",
        F.round("amp_mean", 4).alias("amp_mean"),
    ).transform(sort_once, "doc_id")


O_AUDIO_DECODE = """
SELECT doc_id,
       'audio/wav' AS format,
       CAST(1 + doc_id % 2 AS BIGINT) AS channels,
       CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
       CAST(64 + doc_id % 32 AS BIGINT) AS n_samples,
       round(CAST((doc_id % 2000) - 1000 AS DOUBLE), 4) AS amp_mean
FROM documents
ORDER BY doc_id
"""


def q_windowed_agg(spark, sf_dir):
    """Tumbling-window aggregate over events (the batch twin of the
    stateful Structured-Streaming incremental aggregate in
    streaming.windowed_agg_stream — identical window keys/values,
    parity-tested in tests/test_streaming.py)."""
    from wvlet_spark.session import read_parquet_robust
    from wvlet_spark.streaming import windowed_agg_batch

    ev = read_parquet_robust(spark, f"{sf_dir}/events.parquet")
    out = windowed_agg_batch(ev.select("ts", "event_type", "value"),
                             ts_col="ts", window="1 day",
                             group_cols=["event_type"], value_col="value")
    return (out.withColumn("total_value", F.round("total_value", 2))
            .transform(sort_once, "window_start", "event_type", checkpoint=False))


# Spark's window('1 day') aligns tumbling windows to the unix epoch —
# DuckDB's time_bucket does the same for day buckets.
O_WINDOWED_AGG = """
SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
       time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS window_end,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
"""


def q_stream_enrich(spark, sf_dir):
    """Stream-static enrichment aggregate, graded via its batch twin
    (streaming.enriched_agg_batch — identical window keys and join; the
    stream-vs-batch parity is pytest-asserted in tests/test_streaming.py,
    same pattern as ext_windowed_agg): events broadcast-joined to the
    customer dimension, tumbling 1-day windows per market segment."""
    from wvlet_spark.session import read_parquet_robust
    from wvlet_spark.streaming import enriched_agg_batch

    ev = read_parquet_robust(spark, f"{sf_dir}/events.parquet")
    cust = read_parquet_robust(spark, f"{sf_dir}/customer.parquet")
    out = enriched_agg_batch(ev.select("user_id", "ts", "value"), cust)
    return (out.withColumn("total_value", F.round("total_value", 2))
            .transform(sort_once, "window_start", "c_mktsegment"))


O_STREAM_ENRICH = """
SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
       time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS window_end,
       c_mktsegment,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2, 3
ORDER BY window_start, c_mktsegment
"""


def q_repetition(spark, sf_dir):
    """Gopher-style repetition filters (dup-word / top-word / dup-2gram
    fractions) — map-only column expressions; the oracle mirrors the same
    list algebra in DuckDB."""
    from wvlet_spark.ops.text import repetition_stats

    return repetition_stats(_docs(spark, sf_dir)).transform(sort_once, "doc_id")


O_REPETITION = """
WITH t AS (
  SELECT doc_id,
         string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM documents
), g AS (
  SELECT doc_id, w, len(w) AS n, len(list_distinct(w)) AS nd,
         CASE WHEN len(w) >= 2 THEN
           [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]
         ELSE [] END AS grams,
         list_max([len(list_filter(w, x -> x = u))
                   FOR u IN list_distinct(w)]) AS topc
  FROM t
)
SELECT doc_id,
       round(1 - nd / CAST(n AS DOUBLE), 4) AS dup_word_frac,
       round(topc / CAST(n AS DOUBLE), 4) AS top_word_frac,
       CASE WHEN len(grams) > 0
            THEN round(1 - len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE), 4)
            ELSE 0.0 END AS dup_2gram_frac
FROM g ORDER BY doc_id
"""


def q_sequence_pack(spark, sf_dir):
    """Concat-and-chunk sequence packing placement: per-shard running
    token cumsum -> (bin, offset).  Window/aggregate SQL only — oracle
    runs the identical algebra."""
    from wvlet_spark.ops.packing import pack_sequences

    out = pack_sequences(_docs(spark, sf_dir), capacity=512, n_shards=8)
    return out.transform(sort_once, "doc_id", checkpoint=False)


O_SEQUENCE_PACK = """
WITH t AS (
  SELECT doc_id,
         CAST(doc_id % 8 AS INT) AS shard,
         len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tok
  FROM t
)
SELECT doc_id, shard, n_tokens,
       CAST(floor(start_tok / 512) AS BIGINT) AS bin_id,
       CAST(start_tok % 512 AS BIGINT) AS bin_offset
FROM c ORDER BY doc_id
"""


def q_dedup_against_ref(spark, sf_dir):
    """Cross-snapshot dedup: drop documents whose text already exists in a
    reference slice (docs with doc_id < 250 stand in for 'yesterday's
    corpus').  Anti-join on md5 keys; Spark's runtime bloom-filter
    injection is the at-scale prefilter."""
    from wvlet_spark.ops.dedup import dedup_against_reference

    docs = _docs(spark, sf_dir)
    ref = docs.filter(F.col("doc_id") < 250)
    new = docs.filter(F.col("doc_id") >= 250)
    out = dedup_against_reference(new, ref)
    return out.select("doc_id", "lang", "source").transform(sort_once, "doc_id")


O_DEDUP_AGAINST_REF = """
WITH k AS (
  SELECT doc_id, lang, source,
         md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS h
  FROM documents
)
SELECT doc_id, lang, source FROM k
WHERE doc_id >= 250
  AND h NOT IN (SELECT h FROM k WHERE doc_id < 250)
ORDER BY doc_id
"""


def q_quantize(spark, sf_dir):
    """int8 scalar quantization of the embeddings table (the 4x-storage
    path for ANN at scale) — pure column expressions; the oracle runs the
    identical arithmetic over DuckDB lists.  The int8 vector is projected
    through to_json so the driver's pandas canonicalizer (which hashes
    rows and cannot hash Python lists) gets a flat comparable string."""
    from wvlet_spark.ops.similarity import quantize_embeddings

    out = quantize_embeddings(_embs(spark, sf_dir))
    return (out.select("vec_id",
                       F.to_json(F.col("q8")).alias("q8"),
                       "scale", "max_abs_err")
            .transform(sort_once, "vec_id"))


O_QUANTIZE = """
WITH t AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc
  FROM t
), q AS (
  SELECT vec_id, v, sc,
         list_transform(v, x -> CAST(round(x / sc) AS INT)) AS q8
  FROM s
)
SELECT vec_id, to_json(q8) AS q8, round(sc, 8) AS scale,
       round(list_max(list_transform(range(1, len(v) + 1),
             i -> abs(v[i] - q8[i] * sc))), 6) AS max_abs_err
FROM q ORDER BY vec_id
"""


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: docs with doc_id % 20 == 0 stand in for
    the evaluation set; every other document is scored by 3-gram overlap
    with it.  The DuckDB oracle recomputes grams, the distinct benchmark
    gram set, and the per-doc overlap independently (strings, not the
    Spark side's xxhash64 keys)."""
    from wvlet_spark.ops.dedup import decontaminate

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    out = decontaminate(train, bench, n=3, threshold=0.2)
    return (out.select("doc_id", "n_grams", "n_contaminated",
                       "contamination", "is_contaminated")
            .transform(sort_once, "doc_id", checkpoint=False))


O_DECONTAMINATE = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
  FROM documents
), g AS (
  SELECT doc_id, CASE WHEN len(w) >= 3 THEN
      list_distinct(list_transform(generate_series(1, len(w)-2),
                    i -> concat_ws(' ', w[i], w[i+1], w[i+2])))
    ELSE [array_to_string(w, ' ')] END AS grams
  FROM t
), bench AS (
  SELECT DISTINCT unnest(grams) AS bg FROM g WHERE doc_id % 20 = 0
), doc_g AS (
  SELECT doc_id, unnest(grams) AS dg FROM g WHERE doc_id % 20 <> 0
), stats AS (
  SELECT doc_id,
         count(*) AS n_grams,
         count(b.bg) AS n_contaminated
  FROM doc_g LEFT JOIN bench b ON doc_g.dg = b.bg
  GROUP BY doc_id
)
SELECT doc_id, n_grams, n_contaminated,
       CASE WHEN n_grams > 0
            THEN CAST(n_contaminated AS DOUBLE) / n_grams
            ELSE 0.0 END AS contamination,
       (CASE WHEN n_grams > 0
             THEN CAST(n_contaminated AS DOUBLE) / n_grams
             ELSE 0.0 END) >= 0.2 AS is_contaminated
FROM stats
ORDER BY doc_id
"""


def q_canonical_docs(spark, sf_dir):
    """Keep-the-best-copy: duplicate clusters (same pipeline as
    ext_dup_clusters) reduced to one representative per cluster — longest
    text wins, lowest id breaks ties.  Oracle re-derives the clusters via
    the recursive transitive closure and the argmax with a window."""
    from wvlet_spark.ops.dedup import minhash_near_dup_pairs, ngram_jaccard_pairs
    from wvlet_spark.ops.graph import canonical_representatives, duplicate_clusters

    docs = _docs(spark, sf_dir)
    cands = minhash_near_dup_pairs(docs, threshold=0.2)
    pairs = ngram_jaccard_pairs(docs, n=3, candidates=cands, threshold=0.5)
    clustered = duplicate_clusters(docs, pairs)
    return (canonical_representatives(
                clustered, docs, F.length("text").cast("long"))
            .transform(sort_once, "cluster_id", checkpoint=False))


O_CANONICAL_DOCS = O_DUP_CLUSTERS.replace(
    "SELECT a AS doc_id, min(b) AS cluster_id, a = min(b) AS is_canonical\n"
    "FROM walk GROUP BY a ORDER BY doc_id",
    """SELECT cluster_id, canonical_id, score FROM (
  SELECT c.cluster_id, c.doc_id AS canonical_id,
         CAST(length(d.text) AS BIGINT) AS score,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY length(d.text) DESC, c.doc_id) AS rn
  FROM (SELECT a AS doc_id, min(b) AS cluster_id FROM walk GROUP BY a) c
  JOIN documents d USING (doc_id)
) WHERE rn = 1 ORDER BY cluster_id""")


def q_tfidf_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document (flat rows; oracle mirrors via
    unnest + window in DuckDB)."""
    from wvlet_spark.ops.text import tfidf_top_terms

    docs = _docs(spark, sf_dir)
    return tfidf_top_terms(docs, k=3).transform(sort_once, "doc_id", "rn", checkpoint=False)


O_TFIDF_TERMS = r"""
WITH w AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
  FROM documents
), wnz AS (
  SELECT * FROM w WHERE word <> ''
), tf AS (
  SELECT doc_id, word, count(*) AS tf FROM wnz GROUP BY doc_id, word
), vocab AS (
  SELECT word, count(DISTINCT doc_id) AS doc_freq FROM wnz GROUP BY word
), weighted AS (
  SELECT tf.doc_id, tf.word, tf.tf,
         round(tf.tf * ln((SELECT count(*) FROM documents)::DOUBLE
                          / vocab.doc_freq), 6) AS weight
  FROM tf JOIN vocab USING (word)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY weight DESC, word) AS rn
  FROM weighted
)
SELECT doc_id, word, tf, weight, rn FROM ranked
WHERE rn <= 3 ORDER BY doc_id, rn
"""


def q_dup_spans(spark, sf_dir):
    """Exact duplicated-substring spans (word-level, k=5): maximal runs
    of positions whose 5-grams repeat anywhere in the corpus.  Oracle
    recomputes with gram STRINGS + the same run-merge window in DuckDB."""
    from wvlet_spark.ops.dedup import duplicate_substring_spans

    docs = _docs(spark, sf_dir)
    return duplicate_substring_spans(docs, k=5)


O_DUP_SPANS = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
  FROM documents
), g AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(list_slice(w, i, i + 4), ' ') AS gram
  FROM t, UNNEST(generate_series(1, len(w) - 4)) AS s(i)
  WHERE len(w) >= 5
), duph AS (
  SELECT gram FROM g GROUP BY gram HAVING count(*) > 1
), d AS (
  SELECT doc_id, pos FROM g JOIN duph USING (gram)
), runs AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM d
)
SELECT doc_id, min(pos) AS span_start, max(pos) + 4 AS span_end,
       max(pos) + 5 - min(pos) AS span_words
FROM runs GROUP BY doc_id, grp
ORDER BY doc_id, span_start
"""


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup over the embeddings table (k-means
    blocking -> within-cluster cosine >= 0.4 drops; the synthetic corpus
    plants near-dups at ~0.4-0.5 cosine, same threshold as
    ext_embedding_dedup).  The DuckDB oracle (_semantic_dedup_oracle)
    re-derives the seeded k-means assignment from the inlined trained
    centroids; the planted-pair pytest (test_semantic_dedup) checks the
    algorithmic outcome independently."""
    from wvlet_spark.ops.similarity import semantic_dedup

    embs = _embs(spark, sf_dir)
    return semantic_dedup(embs, n_clusters=8, threshold=0.4)


def q_semantic_dedup_grouped(spark, sf_dir):
    """The scale path of SemDeDup (pair_strategy='grouped': one corpus
    shuffle + per-cluster blocked matmul instead of exploded pairs),
    graded against the SAME strategy-agnostic DuckDB oracle as the join
    path — the round-8 ask: the 2M-vector path carries its own
    CORRECTNESS row, not just pytest parity."""
    from wvlet_spark.ops.similarity import semantic_dedup

    embs = _embs(spark, sf_dir)
    return semantic_dedup(embs, n_clusters=8, threshold=0.4,
                          pair_strategy="grouped")


def _semantic_dedup_oracle(n_clusters: int = 8,
                           threshold: float = 0.4) -> str:
    """DuckDB oracle for SemDeDup: re-derive the seeded k-means assignment
    from the INLINED trained centroid matrix (kmeans_np on the identical
    vec_id-sorted sample), then within-cluster lower-id cosine drops —
    the full algorithm re-verified independently, not just the cosines."""
    from wvlet_spark.ops.similarity import kmeans_np

    _ids, X = _oracle_embeddings_np()
    C = kmeans_np(X, n_clusters, iters=8, seed=42)
    return f"""
WITH cent(i, c) AS (VALUES
    {_centroid_values_sql(C)}
),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
a AS (
  SELECT vec_id, v,
         CAST(arg_min(i, list_dot_product(c, c)
                         - 2 * list_dot_product(v, c)) AS BIGINT) AS sem_cluster
  FROM v, cent
  GROUP BY vec_id, v
),
e AS (
  SELECT r.vec_id AS vec_id, min(l.vec_id) AS dup_of
  FROM a l JOIN a r ON l.sem_cluster = r.sem_cluster AND l.vec_id < r.vec_id
  WHERE round(list_dot_product(l.v, r.v)
              / (sqrt(list_dot_product(l.v, l.v))
                 * sqrt(list_dot_product(r.v, r.v))), 6) >= {threshold}
  GROUP BY r.vec_id
)
SELECT a.vec_id, a.sem_cluster, e.dup_of, e.dup_of IS NULL AS keep
FROM a LEFT JOIN e ON a.vec_id = e.vec_id
ORDER BY a.vec_id
"""


def _ivf_topk_oracle(n_clusters: int = 8, nprobe: int = 3,
                     k: int = 10) -> str:
    """DuckDB oracle for IVF top-k: inlined trained centroids, nearest-
    centroid assignment re-derived in SQL, probe set computed from the
    same centroid/query math as ivf_topk, exact cosine inside the probed
    lists.  Ordered by the UNROUNDED cosine (as the Spark side does) so
    the k-boundary selection matches."""
    from wvlet_spark.ops.similarity import kmeans_np

    _ids, X = _oracle_embeddings_np()
    C = kmeans_np(X, n_clusters, iters=8, seed=42)
    q = X[0]  # vec_id-sorted -> the _query_vec row (min vec_id)
    d = np.einsum("ij,ij->i", C, C) - 2 * (C @ q)
    probes = [int(i) for i in np.argsort(d)[:nprobe]]
    qn = float(np.sqrt(q @ q)) or 1.0
    return f"""
WITH cent(i, c) AS (VALUES
    {_centroid_values_sql(C)}
),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
a AS (
  SELECT vec_id, v,
         arg_min(i, list_dot_product(c, c)
                    - 2 * list_dot_product(v, c)) AS cl
  FROM v, cent
  GROUP BY vec_id, v
),
s AS (
  SELECT vec_id,
         list_dot_product(v, {_vec_literal(q)})
           / (sqrt(list_dot_product(v, v)) * {qn!r}) AS cos_raw
  FROM a
  WHERE cl IN ({", ".join(map(str, probes))})
)
SELECT vec_id, round(cos_raw, 5) AS cosine
FROM s ORDER BY cos_raw DESC, vec_id LIMIT {k}
"""


def _lsh_topk_oracle(planes: int = 6, multiprobe: int = 3,
                     k: int = 10) -> str:
    """DuckDB oracle for multiprobe LSH top-k: seeded hyperplanes inlined
    (same pattern as _embedding_dedup_lsh_oracle), per-row bucket
    re-derived in SQL, the probe set computed by the SAME
    lsh_probe_buckets helper the Spark path uses, exact cosine inside."""
    from wvlet_spark.ops.similarity import _hyperplanes, lsh_probe_buckets

    _ids, X = _oracle_embeddings_np()
    q = X[0]
    dim = X.shape[1]
    H = _hyperplanes(dim, planes, seed=42)
    probes = lsh_probe_buckets([float(x) for x in q], planes, multiprobe,
                               seed=42)
    qn = float(np.sqrt(q @ q)) or 1.0
    hp_rows = ",\n    ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in H[i])}])"
        for i in range(planes))
    return f"""
WITH hp(i, h) AS (VALUES
    {hp_rows}
),
b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sum(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), hp.h) >= 0
                  THEN (1::BIGINT << hp.i) ELSE 0 END) AS bucket
  FROM embeddings, hp
  GROUP BY vec_id, embedding
),
s AS (
  SELECT vec_id,
         list_dot_product(v, {_vec_literal(q)})
           / (sqrt(list_dot_product(v, v)) * {qn!r}) AS cos_raw
  FROM b
  WHERE bucket IN ({", ".join(map(str, probes))})
)
SELECT vec_id, round(cos_raw, 5) AS cosine
FROM s ORDER BY cos_raw DESC, vec_id LIMIT {k}
"""


def q_bigram_lm(spark, sf_dir):
    """Bigram LM with stupid backoff: model trained on the even-doc_id
    half of the corpus, the odd half scored against it — unseen bigrams
    exercise the backoff branch.  Exact DuckDB oracle."""
    from wvlet_spark.ops.text import bigram_lm_logprob

    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    score = docs.filter(F.col("doc_id") % 2 == 1)
    out = bigram_lm_logprob(score, train_df=train)
    return (out.select("doc_id", F.col("n_bigrams").cast("long"),
                       F.round("avg_logp", 4).alias("avg_logp"))
            .transform(sort_once, "doc_id", checkpoint=False))


O_BIGRAM_LM = r"""
WITH ws AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                     w -> w <> '') AS w
  FROM documents
),
pr AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
  FROM ws, UNNEST(range(1, len(w))) AS t(i)
),
train AS (SELECT * FROM pr WHERE doc_id % 2 = 0),
score AS (SELECT * FROM pr WHERE doc_id % 2 = 1),
big AS (SELECT w1, w2, count(*) AS c12 FROM train GROUP BY w1, w2),
uni AS (SELECT w1, count(*) AS c1 FROM train GROUP BY w1),
w2t AS (SELECT w2, count(*) AS c2 FROM train GROUP BY w2),
tot AS (SELECT count(*) AS total FROM train)
SELECT s.doc_id, count(*)::BIGINT AS n_bigrams,
       round(avg(CASE WHEN b.c12 IS NOT NULL
                      THEN log10(b.c12::DOUBLE / u.c1)
                      ELSE log10(0.4 * coalesce(t2.c2, 0.5) / tot.total)
                 END), 4) AS avg_logp
FROM score s
LEFT JOIN big b ON s.w1 = b.w1 AND s.w2 = b.w2
LEFT JOIN uni u ON s.w1 = u.w1
LEFT JOIN w2t t2 ON s.w2 = t2.w2, tot
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


def q_pca_project(spark, sf_dir):
    """PCA projection (trained on the deterministic bounded sample),
    exploded to atomic (vec_id, dim, value) rows.  The oracle re-derives
    the projection from the inlined trained mean + components via
    (x - m) . w = x . w - m . w."""
    from wvlet_spark.ops.similarity import pca_project

    out = pca_project(_embs(spark, sf_dir), out_dim=4)
    return (out.select("vec_id", F.posexplode("pca").alias("dim", "value"))
            .select("vec_id", "dim", F.round("value", 5).alias("value"))
            .transform(sort_once, "vec_id", "dim"))


def _pca_project_oracle(out_dim: int = 4) -> str:
    """DuckDB SQL recomputing pca_project from the model trained on the
    same deterministic sample (inlined-constants pattern: pca_np over the
    vec_id-sorted oracle embeddings = pca_train's Spark-side sample)."""
    from wvlet_spark.ops.similarity import pca_np

    _ids, X = _oracle_embeddings_np()
    mean, W = pca_np(X, out_dim)
    rows = ",\n    ".join(
        f"({i}, {_vec_literal(W[i])}, {float(mean @ W[i])!r})"
        for i in range(out_dim))
    return f"""
WITH m(dim, w, mdotw) AS (VALUES
    {rows}
)
SELECT vec_id, m.dim AS dim,
       round(list_dot_product(CAST(embedding AS DOUBLE[]), m.w) - m.mdotw,
             5) AS value
FROM embeddings, m
ORDER BY vec_id, dim
"""


def q_collocations(spark, sf_dir):
    """Top collocations by PMI over adjacent word pairs.  Exact DuckDB
    oracle (same pair population, counts, and log ratio)."""
    from wvlet_spark.ops.text import collocations_pmi

    out = collocations_pmi(_docs(spark, sf_dir), min_count=5, top_k=10_000)
    # graded boundary must be float-robust: re-rank by the ROUNDED pmi
    # with lexical tie-breaks so both engines cut the same top 50
    return (out.select("w1", "w2", F.col("pair_count").cast("long"),
                       F.round("pmi", 4).alias("pmi"))
            .orderBy(F.col("pmi").desc(), "w1", "w2").limit(50))


O_COLLOCATIONS = r"""
WITH ws AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                     w -> w <> '') AS w
  FROM documents
),
pr AS (
  SELECT w[i] AS w1, w[i+1] AS w2
  FROM ws, UNNEST(range(1, len(w))) AS t(i)
),
big AS (
  SELECT w1, w2, count(*) AS pair_count FROM pr GROUP BY w1, w2
  HAVING count(*) >= 5
),
u1 AS (SELECT w1, count(*) AS c1 FROM pr GROUP BY w1),
u2 AS (SELECT w2, count(*) AS c2 FROM pr GROUP BY w2),
tot AS (SELECT count(*) AS total FROM pr)
SELECT b.w1, b.w2, b.pair_count::BIGINT AS pair_count,
       round(log10((b.pair_count * tot.total)::DOUBLE / (u1.c1 * u2.c2)),
             4) AS pmi
FROM big b JOIN u1 ON b.w1 = u1.w1 JOIN u2 ON b.w2 = u2.w2, tot
ORDER BY pmi DESC, b.w1, b.w2
LIMIT 50
"""


def q_corpus_profile(spark, sf_dir):
    """Per-source corpus statistics (the data-card builder): doc/token
    counts, median length, duplicate rate, alpha ratio.  Exact DuckDB
    oracle."""
    from wvlet_spark.ops.text import corpus_profile

    out = corpus_profile(_docs(spark, sf_dir))
    return (out.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("median_tokens", 1).alias("median_tokens"),
        F.col("distinct_texts").cast("long").alias("distinct_texts"),
        F.round("dup_rate", 5).alias("dup_rate"),
        F.round("mean_alpha_ratio", 5).alias("mean_alpha_ratio"),
    ).transform(sort_once, "source", checkpoint=False))


O_CORPUS_PROFILE = r"""
WITH per_doc AS (
  SELECT source,
         len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                         w -> w <> '')) AS ntok,
         md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS h,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS alpha
  FROM documents
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       CAST(sum(ntok) AS BIGINT) AS n_tokens,
       round(quantile_cont(ntok, 0.5), 1) AS median_tokens,
       count(DISTINCT h)::BIGINT AS distinct_texts,
       round(1.0 - count(DISTINCT h) / count(*), 5) AS dup_rate,
       round(avg(alpha), 5) AS mean_alpha_ratio
FROM per_doc
GROUP BY source
ORDER BY source
"""


def q_minhash_portable(spark, sf_dir):
    """MinHash+LSH near-dup pairs on the engine-portable hash family
    (md5-60bit shingle hash, affine permutations mod 2^31-1, concat band
    buckets) — the DuckDB oracle below recomputes the ENTIRE pipeline
    (shingling, signatures, banding, candidate join, verify) from the same
    inlined coefficients, so the LSH semantics are independently verified
    end-to-end.  The default xxhash64 family keeps the perf path
    (ext_minhash_pairs, rows-only + pytest recall oracle)."""
    from wvlet_spark.ops.dedup import minhash_near_dup_pairs

    out = minhash_near_dup_pairs(
        _docs(spark, sf_dir), num_hashes=16, bands=8, shingle_k=5,
        threshold=0.5, portable=True)
    return (out.select("id_a", "id_b",
                       F.round("est_jaccard", 4).alias("est_jaccard"))
            .transform(sort_once, "id_a", "id_b", checkpoint=False))


def _minhash_banded_with(num_hashes: int, bands: int,
                         shingle_k: int) -> str:
    """Shared WITH-clause prefix re-deriving the portable MinHash band
    table in DuckDB (tokens -> shingles -> md5-60bit -> inlined affine
    permutations -> concat band buckets).  Used by both the pair oracle
    and the dedup-on-ingest oracle."""
    from wvlet_spark.ops.dedup import _MH_P, _mh_coeffs

    a_co, b_co = _mh_coeffs(num_hashes)
    r = num_hashes // bands
    mins = ",\n         ".join(
        f"min(({a_co[j]} * h + {b_co[j]}) % {_MH_P}) AS s{j}"
        for j in range(num_hashes))
    sig_cols = ", ".join(f"s{j}" for j in range(num_hashes))
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band, "
        + " || '_' || ".join(f"CAST(s{b * r + j} AS VARCHAR)"
                             for j in range(r))
        + f" AS bucket, {sig_cols} FROM sig"
        for b in range(bands))
    return f"""
WITH ws AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
  FROM documents
),
sh AS (
  SELECT doc_id, array_to_string(w[i:i+{shingle_k - 1}], ' ') AS s
  FROM ws, UNNEST(range(1, len(w) - {shingle_k} + 2)) AS t(i)
  WHERE len(w) >= {shingle_k}
  UNION ALL
  SELECT doc_id, array_to_string(w, ' ') AS s FROM ws WHERE len(w) < {shingle_k}
),
h AS (
  SELECT doc_id,
         ('0x' || substr(md5(s), 1, 15))::UBIGINT::BIGINT % {_MH_P} AS h
  FROM sh
),
sig AS (
  SELECT doc_id,
         {mins}
  FROM h GROUP BY doc_id
),
banded AS (
{band_selects}
)"""


def _minhash_portable_oracle(num_hashes: int = 16, bands: int = 8,
                             shingle_k: int = 5,
                             threshold: float = 0.5) -> str:
    """DuckDB SQL recomputing minhash_near_dup_pairs(portable=True) from
    scratch: same tokens, shingles, md5-60bit base hash, affine
    permutation coefficients (inlined), band buckets, and est-Jaccard
    verify."""
    matches = " + ".join(
        f"(CASE WHEN a.s{j} = c.s{j} THEN 1 ELSE 0 END)"
        for j in range(num_hashes))
    return _minhash_banded_with(num_hashes, bands, shingle_k) + f""",
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         ({matches}) / {float(num_hashes)} AS est
  FROM banded a JOIN banded c
    ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id
)
SELECT id_a, id_b, round(est, 4) AS est_jaccard
FROM pairs WHERE est >= {threshold}
ORDER BY id_a, id_b
"""


def q_stream_neardup(spark, sf_dir):
    """Dedup-on-ingest (batch twin): drop any document that shares a
    portable-MinHash band bucket with a smaller-id document.  The rule is
    order-independent, so the micro-batched streaming form
    (streaming.near_dup_filter_stream: band store of all seen docs +
    in-batch smaller-id check) computes exactly this set — parity-tested
    in tests/test_streaming.py; the oracle re-derives banding + the
    NOT-EXISTS drop rule in DuckDB."""
    from wvlet_spark.streaming import near_dup_filter_batch

    out = near_dup_filter_batch(_docs(spark, sf_dir), family="portable")
    return (out.select("doc_id", "lang", "source",
                       F.col("n_chars").cast("long").alias("n_chars"))
            .transform(sort_once, "doc_id"))


def _stream_neardup_oracle(num_hashes: int = 16, bands: int = 8,
                           shingle_k: int = 5) -> str:
    return _minhash_banded_with(num_hashes, bands, shingle_k) + """
SELECT d.doc_id, d.lang, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d
WHERE NOT EXISTS (
  SELECT 1 FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND b.doc_id < a.doc_id
  WHERE a.doc_id = d.doc_id)
ORDER BY doc_id
"""


def q_simhash_portable(spark, sf_dir):
    """32-bit portable-simhash near-dup pairs with EXACT-recall banding
    (bands > max_hamming: pigeonhole guarantees every qualifying pair
    shares an untouched band) — so the all-pairs DuckDB oracle must agree
    exactly, verifying signature construction AND the LSH recall claim."""
    from wvlet_spark.ops.dedup import simhash_near_dup_pairs_portable

    out = simhash_near_dup_pairs_portable(
        _docs(spark, sf_dir), bits=32, bands=4, max_hamming=3)
    return (out.select("id_a", "id_b",
                       F.col("hamming").cast("int").alias("hamming"))
            .transform(sort_once, "id_a", "id_b", checkpoint=False))


def _simhash_portable_oracle(bits: int = 32, max_hamming: int = 3) -> str:
    """DuckDB SQL recomputing simhash_portable signatures (md5-60bit token
    hash, tf-weighted majority vote per bit) and the hamming filter over
    ALL pairs — equal to the banded Spark result by the pigeonhole
    argument in simhash_near_dup_pairs_portable."""
    votes = ",\n         ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS c{j}"
        for j in range(bits))
    pack = " + ".join(
        f"(CASE WHEN c{j} > 0 THEN (1::BIGINT << {j}) ELSE 0 END)"
        for j in range(bits))
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
  FROM documents
),
th AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::UBIGINT::BIGINT AS h
  FROM tok
),
cnt AS (
  SELECT doc_id,
         {votes}
  FROM th GROUP BY doc_id
),
sig AS (
  SELECT doc_id, ({pack}) AS s FROM cnt
)
SELECT a.doc_id AS id_a, c.doc_id AS id_b,
       CAST(bit_count(xor(a.s, c.s)) AS INTEGER) AS hamming
FROM sig a JOIN sig c ON a.doc_id < c.doc_id
WHERE bit_count(xor(a.s, c.s)) <= {max_hamming}
ORDER BY id_a, id_b
"""


def q_bloom_build(spark, sf_dir):
    """Engine-portable Bloom filter over document content keys: the
    ingest-dedup artifact as data (word_idx, bits).  The oracle derives
    the identical filter in DuckDB from the same md5 position family —
    a bit-exact check of a probabilistic structure."""
    from wvlet_spark.ops.sketches import bloom_build

    out = bloom_build(_docs(spark, sf_dir), m_bits=1 << 16, k=4)
    return (out.select(F.col("word_idx").cast("long").alias("word_idx"),
                       F.col("bits").cast("long").alias("bits"))
            .transform(sort_once, "word_idx", checkpoint=False))


O_BLOOM_BUILD = r"""
WITH keys AS (
  SELECT DISTINCT md5(lower(trim(text))) AS h FROM documents
),
pos AS (
  SELECT (('0x' || substr(md5(h || ':' || j), 1, 15))::UBIGINT::BIGINT)
           % 65536 AS pos
  FROM keys, UNNEST(['0', '1', '2', '3']) AS t(j)
)
SELECT (pos // 32)::BIGINT AS word_idx,
       bit_or(1::BIGINT << CAST(pos % 32 AS INTEGER))::BIGINT AS bits
FROM pos GROUP BY 1 ORDER BY word_idx
"""


def q_length_bins(spark, sf_dir):
    """Equi-depth length bins per source (ntile over the deterministic
    (value, id) total order — both engines implement SQL ntile
    identically, so the oracle is exact)."""
    from wvlet_spark.ops.text import length_ntile_bins

    out = length_ntile_bins(_docs(spark, sf_dir), n_bins=8)
    return (out.select(
        "source", F.col("bin").cast("long").alias("bin"),
        F.col("n").cast("long").alias("n"),
        F.col("lo").cast("long").alias("lo"),
        F.col("hi").cast("long").alias("hi"),
        F.round("mean_len", 4).alias("mean_len"),
    ).transform(sort_once, "source", "bin"))


O_LENGTH_BINS = """
WITH b AS (
  SELECT source, n_chars,
         ntile(8) OVER (PARTITION BY source
                        ORDER BY n_chars, doc_id) AS bin
  FROM documents
)
SELECT source, bin::BIGINT AS bin, count(*)::BIGINT AS n,
       min(n_chars)::BIGINT AS lo, max(n_chars)::BIGINT AS hi,
       round(avg(n_chars), 4) AS mean_len
FROM b GROUP BY source, bin
ORDER BY source, bin
"""


def q_hard_negatives(spark, sf_dir):
    """Contrastive hard-negative mining: per anchor the top-5 nearest
    different-label vectors, ranked on the 5-decimal-rounded cosine with
    id tiebreak (rank stability across engines).  Exact DuckDB oracle —
    same anchors, same pairs, same rounding, same window."""
    from wvlet_spark.ops.similarity import hard_negative_mining

    out = hard_negative_mining(_embs(spark, sf_dir), k=5, anchor_mod=25)
    return (out.select("anchor_id", "neg_id",
                       F.col("neg_label").cast("long").alias("neg_label"),
                       "cosine",
                       F.col("rank").cast("long").alias("rank"))
            .transform(sort_once, "anchor_id", "rank", checkpoint=False))


O_HARD_NEGATIVES = """
WITH a AS (
  SELECT vec_id AS anchor_id, label AS al,
         CAST(embedding AS DOUBLE[]) AS av
  FROM embeddings WHERE vec_id % 25 = 0
),
c AS (
  SELECT vec_id AS neg_id, label AS neg_label,
         CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings
),
p AS (
  SELECT anchor_id, neg_id, neg_label,
         round(list_dot_product(av, cv)
               / (sqrt(list_dot_product(av, av))
                  * sqrt(list_dot_product(cv, cv))), 5) AS cosine
  FROM a JOIN c ON neg_label <> al
),
r AS (
  SELECT anchor_id, neg_id, neg_label::BIGINT AS neg_label, cosine,
         row_number() OVER (PARTITION BY anchor_id
                            ORDER BY cosine DESC, neg_id) AS rank
  FROM p
)
SELECT anchor_id, neg_id, neg_label, cosine, rank::BIGINT AS rank
FROM r WHERE rank <= 5
ORDER BY anchor_id, rank
"""


def q_gap_fill(spark, sf_dir):
    """Dense per-user daily series with zero-filled gap days and LOCF
    value carry-forward (time-series regularization for feature
    pipelines).  Calendar generated per user from its own span
    (sequence+explode), LOCF window partitioned per user."""
    from wvlet_spark.ops.analytics import gap_fill_daily
    from wvlet_spark.session import read_parquet_robust

    ev = read_parquet_robust(spark, f"{sf_dir}/events.parquet")
    return (gap_fill_daily(ev.filter("user_id < 40"))
            .transform(sort_once, "user_id", "day", checkpoint=False))


O_GAP_FILL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events,
         round(sum(value), 4) AS day_value
  FROM events WHERE user_id < 40 GROUP BY 1, 2),
span AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0,
                max(CAST(ts AS DATE)) AS d1
         FROM events WHERE user_id < 40 GROUP BY 1),
cal AS (SELECT user_id,
               CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        FROM span)
SELECT c.user_id, c.day, coalesce(d.n_events, CAST(0 AS BIGINT)) AS n_events,
       last_value(d.day_value IGNORE NULLS) OVER (
           PARTITION BY c.user_id ORDER BY c.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
FROM cal c LEFT JOIN daily d USING (user_id, day)
ORDER BY user_id, day
"""


def q_retention(spark, sf_dir):
    """Weekly cohort retention: users grouped by the Monday-start week
    of their first event, counted in every (cohort_week, weeks-since)
    cell they were active in."""
    from wvlet_spark.ops.analytics import retention_weekly
    from wvlet_spark.session import read_parquet_robust

    ev = read_parquet_robust(spark, f"{sf_dir}/events.parquet")
    return retention_weekly(ev)


O_RETENTION = """
WITH active AS (SELECT DISTINCT user_id,
                       CAST(date_trunc('week', ts) AS DATE) AS week
                FROM events),
cohort AS (SELECT user_id, min(week) AS cohort_week FROM active
           GROUP BY user_id)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS week_n,
       count(*) AS users
FROM active JOIN cohort USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_fuzzy_pairs(spark, sf_dir):
    """Record linkage by edit distance with prefix blocking (near-dup
    record detection on a name/title column): candidate pairs share a
    16-char prefix block and sit within 1 Levenshtein edit.  The
    self-join shuffles on the block key only; levenshtein is codegen."""
    from wvlet_spark.ops.dedup import fuzzy_name_pairs
    from wvlet_spark.session import read_parquet_robust

    cust = read_parquet_robust(spark, f"{sf_dir}/customer.parquet")
    return (fuzzy_name_pairs(cust.filter("c_custkey <= 300"),
                             "c_custkey", "c_name")
            .transform(sort_once, "id1", "id2", checkpoint=False))


O_FUZZY_PAIRS = """
WITH c AS (SELECT c_custkey AS id, c_name AS name,
                  substr(c_name, 1, 16) AS blk
           FROM customer WHERE c_custkey <= 300)
SELECT a.id AS id1, b.id AS id2,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id
WHERE levenshtein(a.name, b.name) <= 1
ORDER BY id1, id2
"""


def q_skew_report(spark, sf_dir):
    """Shuffle-key skew diagnostic: top-k heaviest composite keys with
    row counts and table share — the pre-flight for salting / AQE skew
    decisions on a big join."""
    from wvlet_spark.ops.sketches import skew_report
    from wvlet_spark.session import read_parquet_robust

    od = read_parquet_robust(spark, f"{sf_dir}/orders.parquet")
    return skew_report(od, ["o_orderstatus", "o_orderpriority"], top_k=10)


O_SKEW_REPORT = """
WITH c AS (
  SELECT concat_ws('|', CAST(o_orderstatus AS VARCHAR),
                   CAST(o_orderpriority AS VARCHAR)) AS key,
         count(*) AS n
  FROM orders GROUP BY 1),
r AS (SELECT key, n, round(n * 1.0 / sum(n) OVER (), 6) AS share,
             row_number() OVER (ORDER BY n DESC, key) AS rank
      FROM c)
SELECT key, n, share, rank FROM r WHERE rank <= 10 ORDER BY rank
"""


def q_profile_numeric(spark, sf_dir):
    """Single-pass numeric column profiler (data-card describe panel):
    count / nulls / exact distinct / min / max / mean per column from
    ONE aggregation over the table."""
    from wvlet_spark.ops.sketches import profile_numeric
    from wvlet_spark.session import read_parquet_robust

    ev = read_parquet_robust(spark, f"{sf_dir}/events.parquet")
    return profile_numeric(ev, ["value", "user_id", "event_id"])


O_PROFILE_NUMERIC = """
SELECT 'event_id' AS col_name, count(CAST(event_id AS DOUBLE)) AS n,
       CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
       count(DISTINCT event_id) AS n_distinct,
       round(min(CAST(event_id AS DOUBLE)), 4) AS min_v,
       round(max(CAST(event_id AS DOUBLE)), 4) AS max_v,
       round(avg(CAST(event_id AS DOUBLE)), 4) AS mean_v FROM events
UNION ALL
SELECT 'user_id', count(CAST(user_id AS DOUBLE)),
       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT user_id),
       round(min(CAST(user_id AS DOUBLE)), 4),
       round(max(CAST(user_id AS DOUBLE)), 4),
       round(avg(CAST(user_id AS DOUBLE)), 4) FROM events
UNION ALL
SELECT 'value', count(CAST(value AS DOUBLE)),
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT value),
       round(min(CAST(value AS DOUBLE)), 4),
       round(max(CAST(value AS DOUBLE)), 4),
       round(avg(CAST(value AS DOUBLE)), 4) FROM events
ORDER BY col_name
"""


def q_funnel_latency(spark, sf_dir):
    """Funnel time-to-convert: per step, users reaching it plus mean and
    median (continuous-interpolation) seconds from their step-1
    timestamp.  Latency aggregates run over per-user step timestamps,
    never over the event log."""
    from wvlet_spark.ops.analytics import funnel_latency
    from wvlet_spark.session import read_parquet_robust

    ev = read_parquet_robust(spark, f"{sf_dir}/events.parquet")
    return funnel_latency(ev, ["view", "click", "purchase"],
                          within_seconds=86400)


O_FUNNEL_LATENCY = """
WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
       JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND e.ts > s1.t
         AND e.ts <= s1.t + INTERVAL 86400 SECOND GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
       JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t
         AND e.ts <= s2.t + INTERVAL 86400 SECOND GROUP BY e.user_id),
lat AS (
  SELECT 1 AS step_idx, 'view' AS step,
         (epoch_us(s.t) - epoch_us(f.t)) / 1000000.0 AS s
  FROM s1 s JOIN s1 f USING (user_id)
  UNION ALL SELECT 2, 'click', (epoch_us(s.t) - epoch_us(f.t)) / 1000000.0
  FROM s2 s JOIN s1 f ON s.user_id = f.user_id
  UNION ALL SELECT 3, 'purchase',
         (epoch_us(s.t) - epoch_us(f.t)) / 1000000.0
  FROM s3 s JOIN s1 f ON s.user_id = f.user_id)
SELECT CAST(step_idx AS BIGINT) AS step_idx, step, count(*) AS users,
       round(avg(s), 2) AS avg_secs,
       round(quantile_cont(s, 0.5), 2) AS p50_secs
FROM lat GROUP BY 1, 2 ORDER BY 1
"""


def entry_queries() -> dict:
    return {
        "ext_exact_dedup": q_exact_dedup,
        "ext_minhash_pairs": q_minhash_pairs,
        "ext_simhash_pairs": q_simhash_pairs,
        "ext_minhash_portable": q_minhash_portable,
        "ext_simhash_portable": q_simhash_portable,
        "ext_stream_neardup": q_stream_neardup,
        "ext_bigram_lm": q_bigram_lm,
        "ext_collocations": q_collocations,
        "ext_corpus_profile": q_corpus_profile,
        "ext_pca_project": q_pca_project,
        "ext_ngram_jaccard": q_ngram_jaccard,
        "ext_dup_clusters": q_dup_clusters,
        "ext_cosine_topk": q_cosine_topk,
        "ext_ivf_topk": q_ivf_topk,
        "ext_embedding_dedup": q_embedding_dedup,
        "ext_lsh_topk": q_lsh_topk,
        "ext_language_id": q_language_id,
        "ext_token_stats": q_token_stats,
        "ext_quality_score": q_quality_score,
        "ext_fingerprint": q_fingerprint,
        "ext_stratified_sample": q_stratified_sample,
        "ext_pii_scan": q_pii_scan,
        "ext_sessionize": q_sessionize,
        "ext_multimodal_decode": q_multimodal_decode,
        "ext_audio_decode": q_audio_decode,
        "ext_video_frames": q_video_frames,
        "ext_image_resize": q_image_resize,
        "ext_boilerplate": q_boilerplate,
        "ext_approx_distinct": q_approx_distinct,
        "ext_stream_enrich": q_stream_enrich,
        "ext_mixture": q_mixture,
        "ext_epoch_shuffle": q_epoch_shuffle,
        "ext_chunking": q_chunking,
        "ext_windowed_agg": q_windowed_agg,
        "ext_repetition": q_repetition,
        "ext_sequence_pack": q_sequence_pack,
        "ext_dedup_against_ref": q_dedup_against_ref,
        "ext_quantize": q_quantize,
        "ext_decontaminate": q_decontaminate,
        "ext_canonical_docs": q_canonical_docs,
        "ext_tfidf_terms": q_tfidf_terms,
        "ext_dup_spans": q_dup_spans,
        "ext_semantic_dedup": q_semantic_dedup,
        "ext_semdedup_grouped": q_semantic_dedup_grouped,
        "ext_bloom_build": q_bloom_build,
        "ext_length_bins": q_length_bins,
        "ext_hard_negatives": q_hard_negatives,
        "ext_gap_fill": q_gap_fill,
        "ext_retention": q_retention,
        "ext_fuzzy_pairs": q_fuzzy_pairs,
        "ext_skew_report": q_skew_report,
        "ext_profile_numeric": q_profile_numeric,
        "ext_funnel_latency": q_funnel_latency,
    }


def entry_oracles() -> dict:
    return {
        "ext_exact_dedup": O_EXACT_DEDUP,
        "ext_ngram_jaccard": O_NGRAM_JACCARD,
        "ext_dup_clusters": O_DUP_CLUSTERS,
        "ext_cosine_topk": O_COSINE_TOPK,
        "ext_embedding_dedup": _embedding_dedup_lsh_oracle(),
        "ext_language_id": _langid_oracle(),
        "ext_token_stats": O_TOKEN_STATS,
        "ext_quality_score": _quality_oracle(),
        "ext_fingerprint": O_FINGERPRINT,
        "ext_stratified_sample": _stratified_sample_oracle(),
        "ext_pii_scan": _pii_oracle(),
        "ext_sessionize": O_SESSIONIZE,
        "ext_windowed_agg": O_WINDOWED_AGG,
        "ext_repetition": O_REPETITION,
        "ext_sequence_pack": O_SEQUENCE_PACK,
        "ext_dedup_against_ref": O_DEDUP_AGAINST_REF,
        "ext_decontaminate": O_DECONTAMINATE,
        "ext_canonical_docs": O_CANONICAL_DOCS,
        "ext_tfidf_terms": O_TFIDF_TERMS,
        "ext_dup_spans": O_DUP_SPANS,
        "ext_quantize": O_QUANTIZE,
        "ext_multimodal_decode": O_MULTIMODAL,
        "ext_audio_decode": O_AUDIO_DECODE,
        "ext_video_frames": O_VIDEO_FRAMES,
        "ext_image_resize": O_IMAGE_RESIZE,
        "ext_boilerplate": O_BOILERPLATE,
        "ext_approx_distinct": O_APPROX_DISTINCT,
        "ext_stream_enrich": O_STREAM_ENRICH,
        "ext_mixture": O_MIXTURE,
        "ext_epoch_shuffle": O_EPOCH_SHUFFLE,
        "ext_chunking": O_CHUNKING,
        "ext_semantic_dedup": _semantic_dedup_oracle(),
        "ext_semdedup_grouped": _semantic_dedup_oracle(),
        "ext_ivf_topk": _ivf_topk_oracle(),
        "ext_lsh_topk": _lsh_topk_oracle(),
        # ext_minhash_pairs / ext_simhash_pairs: xxhash64 signatures have
        # no DuckDB equivalent — rows-only check (deterministic row
        # counts) + pytest oracles (recall vs brute force, LSH ⊆ exact);
        # the *_portable twins below carry the full independent oracle
        # for the same LSH pipeline shape
        "ext_minhash_portable": _minhash_portable_oracle(),
        "ext_simhash_portable": _simhash_portable_oracle(),
        "ext_stream_neardup": _stream_neardup_oracle(),
        "ext_bigram_lm": O_BIGRAM_LM,
        "ext_collocations": O_COLLOCATIONS,
        "ext_corpus_profile": O_CORPUS_PROFILE,
        "ext_pca_project": _pca_project_oracle(),
        "ext_bloom_build": O_BLOOM_BUILD,
        "ext_length_bins": O_LENGTH_BINS,
        "ext_hard_negatives": O_HARD_NEGATIVES,
        "ext_gap_fill": O_GAP_FILL,
        "ext_retention": O_RETENTION,
        "ext_fuzzy_pairs": O_FUZZY_PAIRS,
        "ext_skew_report": O_SKEW_REPORT,
        "ext_profile_numeric": O_PROFILE_NUMERIC,
        "ext_funnel_latency": O_FUNNEL_LATENCY,
    }
