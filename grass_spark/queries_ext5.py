"""Fifth wave of driver-contract queries: round-5 training-data
operators — tokenizer-accurate subword counts and the incremental
dedup store's delta-vs-from-scratch equality.

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.queries_ext import _SQL_SHINGLES, _t
from grass_spark.queries_ext3 import _SQL_CANDS

EXT5_QUERIES: dict = {}
EXT5_ORACLES: dict = {}


# ---------------------------------------------------------------------
# Tokenizer-accurate token counts (operators/textstats.py) — greedy
# longest-match subword tokenization, vocab compiled to ONE regex whose
# length-descending alternation makes leftmost-first == greedy-longest
# in java.util.regex and RE2 alike (bit-identical across engines).
# ---------------------------------------------------------------------


def q_subword_tokens(spark, sf_dir):
    """Per document: whitespace token count vs greedy-subword token
    count over the built-in vocab, plus the expansion ratio that
    mixture/packing budgets should use.  Pure scan-stage expressions —
    zero shuffles at any scale."""
    from grass_spark.operators.textstats import subword_token_counts

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    out = subword_token_counts(d)
    n_ws = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    return out.select(
        "doc_id",
        "lang",
        n_ws.alias("n_ws_tokens"),
        F.col("n_subword_tokens"),
        F.round(F.col("n_subword_tokens") / n_ws, 6).alias("subword_per_ws"),
    ).orderBy("doc_id")


def _subword_oracle() -> str:
    from grass_spark.operators.textstats import (
        DEFAULT_SUBWORDS,
        greedy_vocab_pattern,
    )

    pat = greedy_vocab_pattern(DEFAULT_SUBWORDS)
    # the default vocab is alphanumeric: the pattern embeds into a SQL
    # single-quoted literal with no escaping concerns
    return f"""
WITH t AS (
  SELECT doc_id, lang, text,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
  FROM documents
)
SELECT doc_id, lang,
       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
         AS n_ws_tokens,
       CAST(len(regexp_extract_all(norm, '{pat}')) AS BIGINT)
         AS n_subword_tokens,
       round(CAST(len(regexp_extract_all(norm, '{pat}')) AS DOUBLE)
             / len(regexp_split_to_array(trim(text), '\\s+')), 6)
         AS subword_per_ws
FROM t
ORDER BY doc_id
"""


EXT5_QUERIES["subword_tokens"] = q_subword_tokens
EXT5_ORACLES["subword_tokens"] = _subword_oracle()


# ---------------------------------------------------------------------
# Incremental dedup store (operators/dedup_store.py) — build a store on
# the first half of the corpus, ingest the second half as a delta, and
# the delta labels must equal a FROM-SCRATCH near-dedup over the whole
# corpus restricted to the delta ids.  The oracle is exactly that
# from-scratch run (same md5 signature/band/verify chain as
# near_dedup_keep) with the delta restriction.
# ---------------------------------------------------------------------


def q_delta_dedup(spark, sf_dir):
    """Delta dedup against a persisted store: (id, cluster_id, keep)
    for second-half docs, computed WITHOUT re-running LSH/CC over the
    first half (only the store's band index + candidate members are
    touched).  portable=True replays the oracle's md5 chain
    bit-for-bit; uncapped to match the oracle's capless candidates."""
    import shutil
    import tempfile

    from grass_spark.operators.dedup_store import DedupStore

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    split_id = d.agg(
        F.floor(F.max("doc_id") / 2).cast("long").alias("s")
    ).first()["s"]
    tmp = tempfile.mkdtemp(prefix="grass_spark_dedup_store_")
    try:
        store = DedupStore(
            tmp, portable=True, n_hashes=8, bands=4,
            jaccard_threshold=0.8, max_bucket_size=None,
        )
        store.build(d.filter(F.col("doc_id") <= split_id))
        out = store.ingest(spark, d.filter(F.col("doc_id") > split_id))
        # ingest(update=True) eagerly checkpoints its result, so the
        # store directory can be reclaimed before the driver collects
        return out.select(
            "doc_id",
            F.col("cluster_id").cast("long").alias("cluster_id"),
            "keep",
        ).orderBy("doc_id")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ORACLE_DELTA_DEDUP = f"""
WITH RECURSIVE {_SQL_SHINGLES},
{_SQL_CANDS}, verified AS (
  SELECT c.id_a, c.id_b
  FROM cands c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b
  WHERE CAST(len(list_intersect(sa.ls, sb.ls)) AS DOUBLE)
        / (len(sa.ls) + len(sb.ls) - len(list_intersect(sa.ls, sb.ls)))
        >= 0.8
), edges AS (
  SELECT id_a AS s, id_b AS d FROM verified
  UNION
  SELECT id_b AS s, id_a AS d FROM verified
), reach AS (
  SELECT s AS id, s AS r FROM edges
  UNION
  SELECT e.s AS id, reach.r AS r
  FROM edges e JOIN reach ON e.d = reach.id
), clusters AS (
  SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
)
SELECT d.doc_id,
       CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
       d.doc_id = coalesce(c.cluster_id, d.doc_id) AS keep
FROM documents d
LEFT JOIN clusters c ON c.id = d.doc_id
WHERE d.doc_id > (SELECT CAST(floor(max(doc_id) / 2) AS BIGINT)
                  FROM documents)
ORDER BY d.doc_id
"""

EXT5_QUERIES["delta_dedup"] = q_delta_dedup
EXT5_ORACLES["delta_dedup"] = ORACLE_DELTA_DEDUP


# ---------------------------------------------------------------------
# Per-source caps (operators/caps.py) — skew-safe exact top-cap per
# source by portable uniform hash.  The Spark plan never windows the
# full frame on the bare source key (salted two-stage selection); the
# oracle IS the naive single window, proving the composition exact.
# ---------------------------------------------------------------------


def q_source_cap(spark, sf_dir):
    """Cap every source at 10 docs (all 20 sf0.01 sources exceed it —
    the pure hot path); return the kept set with its selection hash."""
    from grass_spark.operators.caps import cap_per_group

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    out = cap_per_group(
        d, 10, group_col="source", id_col="doc_id", salt="cap",
        salts=4, keep_hash=True,
    )
    return out.select(
        "doc_id", "source", F.round("_u", 6).alias("u")
    ).orderBy("source", "doc_id")


ORACLE_SOURCE_CAP = """
WITH u AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(doc_id || ':cap'), 1, 8)) AS UBIGINT)
           / 4294967296.0 AS _u
  FROM documents
), r AS (
  SELECT doc_id, source, _u,
         row_number() OVER (PARTITION BY source ORDER BY _u, doc_id) AS rn
  FROM u
)
SELECT doc_id, source, round(_u, 6) AS u
FROM r WHERE rn <= 10
ORDER BY source, doc_id
"""

EXT5_QUERIES["source_cap"] = q_source_cap
EXT5_ORACLES["source_cap"] = ORACLE_SOURCE_CAP


# ---------------------------------------------------------------------
# Gopher quality rules (operators/quality.py) — scan-stage structural
# gates with first-fail reasons.  Thresholds tuned to the synthetic
# word-soup docs so both keeps and several reject reasons appear.
# ---------------------------------------------------------------------


def q_quality_filter(spark, sf_dir):
    from grass_spark.operators.quality import QualityRules, quality_filter

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    rules = QualityRules(min_words=30, max_words=90,
                         min_mean_word_len=3.5, min_stopwords=1)
    out = quality_filter(d, rules)
    return out.select(
        "doc_id",
        "source",
        "n_words",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("alpha_word_frac", 6).alias("alpha_word_frac"),
        F.col("n_stop_present"),
        "reject_reason",
        "keep",
    ).orderBy("doc_id")


ORACLE_QUALITY_FILTER = r"""
WITH t AS (
  SELECT doc_id, source, text,
         regexp_split_to_array(trim(text), '\s+') AS words,
         split(text, chr(10)) AS lines,
         ' ' || lower(text) || ' ' AS padded
  FROM documents
), m AS (
  SELECT doc_id, source,
    CAST(len(words) AS BIGINT) AS n_words,
    CAST(len(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
      / len(words) AS mean_word_len,
    (CAST(len(text) - len(replace(text, '#', '')) AS DOUBLE)
       + (len(text) - len(replace(text, '...', ''))) / 3.0)
      / len(words) AS symbol_ratio,
    CAST(len(list_filter(lines, x -> regexp_matches(x, '^\s*[-*•]')))
         AS DOUBLE) / len(lines) AS bullet_line_frac,
    CAST(len(list_filter(lines, x -> regexp_matches(x, '\.\.\.\s*$')))
         AS DOUBLE) / len(lines) AS ellipsis_line_frac,
    CAST(len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]')))
         AS DOUBLE) / len(words) AS alpha_word_frac,
    CAST((CASE WHEN position(' the '  IN padded) > 0 THEN 1 ELSE 0 END
        + CASE WHEN position(' be '   IN padded) > 0 THEN 1 ELSE 0 END
        + CASE WHEN position(' to '   IN padded) > 0 THEN 1 ELSE 0 END
        + CASE WHEN position(' of '   IN padded) > 0 THEN 1 ELSE 0 END
        + CASE WHEN position(' and '  IN padded) > 0 THEN 1 ELSE 0 END
        + CASE WHEN position(' that ' IN padded) > 0 THEN 1 ELSE 0 END
        + CASE WHEN position(' have ' IN padded) > 0 THEN 1 ELSE 0 END
        + CASE WHEN position(' with ' IN padded) > 0 THEN 1 ELSE 0 END)
      AS BIGINT) AS n_stop_present
  FROM t
), g AS (
  SELECT *,
    CASE
      WHEN n_words < 30 THEN 'n_words_low'
      WHEN n_words > 90 THEN 'n_words_high'
      WHEN mean_word_len < 3.5 OR mean_word_len > 10.0
        THEN 'mean_word_len'
      WHEN symbol_ratio > 0.1 THEN 'symbol_ratio'
      WHEN bullet_line_frac > 0.9 THEN 'bullet_lines'
      WHEN ellipsis_line_frac > 0.3 THEN 'ellipsis_lines'
      WHEN alpha_word_frac < 0.8 THEN 'alpha_words'
      WHEN n_stop_present < 1 THEN 'stopwords'
      ELSE 'keep'
    END AS reject_reason
  FROM m
)
SELECT doc_id, source, n_words,
       round(mean_word_len, 6) AS mean_word_len,
       round(alpha_word_frac, 6) AS alpha_word_frac,
       n_stop_present,
       reject_reason,
       reject_reason = 'keep' AS keep
FROM g
ORDER BY doc_id
"""

EXT5_QUERIES["quality_filter"] = q_quality_filter
EXT5_ORACLES["quality_filter"] = ORACLE_QUALITY_FILTER


# ---------------------------------------------------------------------
# Exact-substring duplicate spans (operators/spans.py) — Lee et al.
# ExactSubstr re-expressed as duplicated sliding windows + per-doc
# interval merge.  The Spark census is one combinable groupBy (count +
# first-occurrence election in a single min(struct) pass); the oracle
# is the naive window formulation, proving the composition exact.
# ---------------------------------------------------------------------

_SPAN_N = 6


def q_dup_spans(spark, sf_dir):
    """Per document: duplicated-window census, maximal removable spans
    (corpus-wide first occurrence protected), coverage fraction, and
    the md5 of the span-removed text."""
    from grass_spark.operators.spans import duplicate_spans

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = duplicate_spans(d, n=_SPAN_N)
    return out.select(
        "doc_id",
        "n_words",
        "n_windows",
        "n_dup_windows",
        "n_spans",
        "dup_words",
        F.round("dup_frac", 6).alias("dup_frac"),
        F.md5("clean_text").alias("clean_md5"),
    ).orderBy("doc_id")


ORACLE_DUP_SPANS = f"""
WITH t AS (
  SELECT doc_id,
         split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
           AS ws
  FROM documents
), base AS (
  SELECT doc_id, ws, len(ws) AS nw FROM t
), w AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         array_to_string(ws[i+1:i+{_SPAN_N}], ' ') AS gram
  FROM base, unnest(range(0, nw - {_SPAN_N} + 1)) AS u(i)
  WHERE nw >= {_SPAN_N}
), f AS (
  SELECT doc_id, pos,
         count(*) OVER (PARTITION BY gram) AS cnt,
         row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
  FROM w
), dupw AS (SELECT * FROM f WHERE cnt >= 2),
rem AS (SELECT doc_id, pos FROM dupw WHERE rn > 1),
m AS (
  SELECT doc_id, pos,
         CASE WHEN pos > coalesce(
                lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                  + {_SPAN_N}, -1)
              THEN 1 ELSE 0 END AS is_new
  FROM rem
), sid AS (
  SELECT doc_id, pos,
         sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
), spans AS (
  SELECT doc_id, sid, min(pos) AS s, max(pos) + {_SPAN_N} - 1 AS e
  FROM sid GROUP BY doc_id, sid
), perdoc AS (
  SELECT doc_id,
         count(*) AS n_spans,
         sum(e - s + 1) AS dup_words,
         list(struct_pack(s := s, e := e) ORDER BY s) AS sp
  FROM spans GROUP BY doc_id
), dcount AS (
  SELECT doc_id, count(*) AS n_dup FROM dupw GROUP BY doc_id
)
SELECT b.doc_id,
  CAST(b.nw AS BIGINT) AS n_words,
  CAST(CASE WHEN b.nw >= {_SPAN_N} THEN b.nw - {_SPAN_N} + 1 ELSE 0 END
       AS BIGINT) AS n_windows,
  CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup_windows,
  CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
  CAST(coalesce(p.dup_words, 0) AS BIGINT) AS dup_words,
  round(CAST(coalesce(p.dup_words, 0) AS DOUBLE) / b.nw, 6) AS dup_frac,
  CASE WHEN p.sp IS NULL THEN md5(array_to_string(b.ws, ' '))
       -- coalesce: DuckDB array_to_string([]) is NULL, Spark's is ''
       ELSE md5(coalesce(array_to_string(
              list_filter(b.ws, (x, i) ->
                len(list_filter(p.sp,
                                q -> i - 1 BETWEEN q.s AND q.e)) = 0),
              ' '), ''))
  END AS clean_md5
FROM base b
LEFT JOIN dcount d USING (doc_id)
LEFT JOIN perdoc p USING (doc_id)
ORDER BY b.doc_id
"""

EXT5_QUERIES["dup_spans"] = q_dup_spans
EXT5_ORACLES["dup_spans"] = ORACLE_DUP_SPANS


# ---------------------------------------------------------------------
# Corpus TF-IDF keywords (operators/keywords.py) — tf = groupBy(id,word),
# df = groupBy(word) (both map-side combinable), score = tf * ln(N/df)
# rounded to 6 dp, top-5 per doc by (score desc, word asc).  The rank
# window partitions on the DOC id — bounded by one document's distinct
# vocabulary, never corpus-hot.
# ---------------------------------------------------------------------


def q_tfidf_keywords(spark, sf_dir):
    """Top-5 TF-IDF keywords per document over the documents table."""
    from grass_spark.operators.keywords import tfidf_keywords

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return tfidf_keywords(d, top_k=5).orderBy("doc_id", "rank")


ORACLE_TFIDF = """
WITH words AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
  FROM documents
), tf AS (
  SELECT doc_id, word, count(*) AS tf FROM words GROUP BY 1, 2
), dfreq AS (
  SELECT word, count(*) AS df FROM tf GROUP BY 1
), n AS (
  SELECT count(*) AS n FROM documents
), scored AS (
  SELECT tf.doc_id, tf.word, tf.tf,
         round(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 6) AS score
  FROM tf JOIN dfreq USING (word) CROSS JOIN n
), ranked AS (
  SELECT doc_id, word, tf, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, word ASC) AS rank
  FROM scored
)
SELECT doc_id, word, CAST(tf AS BIGINT) AS tf, score,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
ORDER BY doc_id, rank
"""

EXT5_QUERIES["tfidf_keywords"] = q_tfidf_keywords
EXT5_ORACLES["tfidf_keywords"] = ORACLE_TFIDF


# ---------------------------------------------------------------------
# Hashed linear quality classifier (operators/classify.py) — fastText-
# style feature hashing: bucket = portable-md5(word) % D, model is a
# tiny (bucket, weight) table that BROADCASTS, score = one map-side-
# combinable groupBy(doc).  The synthetic weight table derives from the
# bucket ids' own md5 so DuckDB rebuilds the exact model.
# ---------------------------------------------------------------------

_CLF_BUCKETS = 1024


def q_quality_classifier(spark, sf_dir):
    """Per-document hashed-linear quality score + sigmoid prob."""
    from grass_spark.operators.classify import (
        linear_quality_score,
        synth_weights,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    w = synth_weights(spark, _CLF_BUCKETS)
    return linear_quality_score(
        d, w, n_buckets=_CLF_BUCKETS
    ).orderBy("doc_id")


ORACLE_CLASSIFIER = f"""
WITH weights AS (
  SELECT bucket,
         round(CAST('0x' || substr(md5(bucket || ':w'), 1, 8) AS UBIGINT)
               / 4294967296.0 * 2.0 - 1.0, 6) AS weight
  FROM (SELECT unnest(range({_CLF_BUCKETS})) AS bucket)
), toks AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(unnest(
               regexp_extract_all(lower(text), '[a-z0-9]+')) || ':'), 1, 8)
              AS UBIGINT) % {_CLF_BUCKETS} AS bucket
  FROM documents
), agg AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         round(sum(w.weight), 6) AS score
  FROM toks t JOIN weights w USING (bucket)
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, score,
       round(1.0 / (1.0 + exp(-(score / n_tokens))), 6) AS prob
FROM agg ORDER BY doc_id
"""

EXT5_QUERIES["quality_classifier"] = q_quality_classifier
EXT5_ORACLES["quality_classifier"] = ORACLE_CLASSIFIER


# ---------------------------------------------------------------------
# Sliding-window chunking (operators/chunks.py) — RAG / context-window
# prep: one Generate per doc, zero shuffles; trailing partial window
# emitted iff it starts inside the text.
# ---------------------------------------------------------------------

_CHUNK_SIZE, _CHUNK_STRIDE = 32, 16


def q_doc_chunks(spark, sf_dir):
    """Overlapping 32-word windows at stride 16 over every document;
    chunk text hashed so the row stays narrow."""
    from grass_spark.operators.chunks import chunk_documents

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = chunk_documents(d, size=_CHUNK_SIZE, stride=_CHUNK_STRIDE)
    return out.select(
        "doc_id", "chunk_idx", "chunk_start", "n_chunk_words",
        F.md5("chunk_text").alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


ORACLE_CHUNKS = f"""
WITH base AS (
  SELECT doc_id,
         regexp_split_to_array(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
  FROM documents
), live AS (
  SELECT doc_id, ws, len(ws) AS n
  FROM base WHERE array_to_string(ws, '') <> ''
), starts AS (
  SELECT doc_id, ws,
         unnest(range(0, CAST(floor((n - 1) / {_CHUNK_STRIDE}) AS BIGINT)
                         * {_CHUNK_STRIDE} + 1, {_CHUNK_STRIDE})) AS s
  FROM live
), chunks AS (
  SELECT doc_id,
         CAST(s / {_CHUNK_STRIDE} AS INT) AS chunk_idx,
         CAST(s AS INT) AS chunk_start,
         list_slice(ws, s + 1, s + {_CHUNK_SIZE}) AS cw
  FROM starts
)
SELECT doc_id, chunk_idx, chunk_start,
       CAST(len(cw) AS INT) AS n_chunk_words,
       md5(array_to_string(cw, ' ')) AS chunk_md5
FROM chunks ORDER BY doc_id, chunk_idx
"""

EXT5_QUERIES["doc_chunks"] = q_doc_chunks
EXT5_ORACLES["doc_chunks"] = ORACLE_CHUNKS


# ---------------------------------------------------------------------
# Int8 embedding quantization (operators/quantize.py) — per-vector
# symmetric scalar quantization for ANN storage: scale = max|x|/127
# (round 6), q_i = round(x_i / scale); pure scan-stage HOFs, zero
# shuffle.  The qvec is md5'd through a canonical string so the row
# stays narrow; the per-vector mean |x - q*scale| audits the error.
# ---------------------------------------------------------------------


def q_quantize_embeddings(spark, sf_dir):
    """Quantize every embedding vector; hash the int8 vector."""
    from grass_spark.operators.quantize import quantize_embeddings

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = quantize_embeddings(e)
    return out.select(
        "vec_id", "dims", "scale",
        F.md5(F.array_join(F.col("qvec").cast("array<string>"), ","))
            .alias("qvec_md5"),
        "mean_abs_err",
    ).orderBy("vec_id")


ORACLE_QUANTIZE = """
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
  FROM embeddings
), scaled AS (
  SELECT vec_id, xs,
         round(list_max(list_transform(xs, x -> abs(x))) / 127.0, 6)
           AS scale
  FROM base
), q AS (
  SELECT vec_id, xs, scale,
         list_transform(xs, x -> CASE WHEN scale = 0 THEN 0
                                      ELSE CAST(round(x / scale) AS INT)
                                 END) AS qvec
  FROM scaled
)
SELECT vec_id,
       CAST(len(xs) AS INT) AS dims,
       scale,
       md5(array_to_string(qvec, ',')) AS qvec_md5,
       round(list_sum(list_transform(range(1, len(xs) + 1),
               i -> abs(xs[i] - qvec[i] * scale))) / len(xs), 6)
         AS mean_abs_err
FROM q ORDER BY vec_id
"""

EXT5_QUERIES["quantize_embeddings"] = q_quantize_embeddings
EXT5_ORACLES["quantize_embeddings"] = ORACLE_QUANTIZE


# ---------------------------------------------------------------------
# BPE vocabulary training (operators/bpe.py) — the corpus is scanned
# once (word-frequency groupBy); merge rounds run on the vocab-sized
# frame.  The per-round argmax is iterative — not one SQL query — so
# this entry is rows-only by design (same class as infer_granularity).
# ---------------------------------------------------------------------


def q_bpe_merges(spark, sf_dir):
    """First 12 BPE merges learned from the documents corpus, in merge
    order — deterministic replay (freq ties break lexicographically)."""
    from grass_spark.operators.bpe import learn_bpe

    d = _t(spark, sf_dir, "documents").select("text")
    merges = learn_bpe(d, 12)
    rows = [(i, a, b, a + b, n) for i, (a, b, n) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "merge_idx int, left string, right string, piece string, freq bigint"
    ).orderBy("merge_idx")


EXT5_QUERIES["bpe_merges"] = q_bpe_merges
# no oracle entry: iterative per-round argmax (rows-only driver check)


# ---------------------------------------------------------------------
# Semantic decontamination (operators/semdecon.py) — embedding-space
# benchmark leakage: bench set broadcasts, corpus streams through a
# scoring pass, ONE groupBy(id) max.  Parity: threshold compares the
# 6-dp-rounded max cosine in both engines.
# ---------------------------------------------------------------------

# random near-orthogonal sf embeddings: max-cos median ~0.24,
# p90 ~0.33 — 0.3 makes the flag column discriminate
_SEMDECON_T = 0.3


def q_semantic_contamination(spark, sf_dir):
    """Max benchmark cosine per corpus vector (bench = vec_id < 25,
    corpus = the rest) + the keep/drop flag at the 0.3 threshold."""
    from grass_spark.operators.semdecon import semantic_contamination

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = e.filter(F.col("vec_id") >= 25)
    bench = e.filter(F.col("vec_id") < 25)
    out = semantic_contamination(corpus, bench)
    return out.select(
        "vec_id", "max_bench_cos",
        (F.col("max_bench_cos") >= F.lit(_SEMDECON_T)).alias("contaminated"),
    ).orderBy("vec_id")


ORACLE_SEMDECON = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), pairs AS (
  SELECT c.vec_id,
         list_sum(list_transform(range(1, len(c.v) + 1),
                                 i -> c.v[i] * b.v[i]))
         / (sqrt(list_sum(list_transform(c.v, x -> x * x)))
            * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cos
  FROM e c CROSS JOIN e b
  WHERE c.vec_id >= 25 AND b.vec_id < 25
)
SELECT vec_id, round(max(cos), 6) AS max_bench_cos,
       round(max(cos), 6) >= {_SEMDECON_T} AS contaminated
FROM pairs GROUP BY vec_id ORDER BY vec_id
"""

EXT5_QUERIES["semantic_contamination"] = q_semantic_contamination
EXT5_ORACLES["semantic_contamination"] = ORACLE_SEMDECON


# ---------------------------------------------------------------------
# Corpus drift (operators/divergence.py) — smoothed KL/JS + vocab
# overlap between two snapshot halves.  Two corpus scans; everything
# after is vocabulary-sized.
# ---------------------------------------------------------------------


def q_corpus_divergence(spark, sf_dir):
    """One summary row: token totals, vocab overlap, KL(a||b), JS
    between the even-id and odd-id document halves."""
    from grass_spark.operators.divergence import corpus_divergence

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    a = d.filter(F.col("doc_id") % 2 == 0)
    b = d.filter(F.col("doc_id") % 2 == 1)
    return corpus_divergence(a, b)


ORACLE_DIVERGENCE = """
WITH wa AS (
  SELECT word, count(*) AS fa FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
    FROM documents WHERE doc_id % 2 = 0) GROUP BY 1
), wb AS (
  SELECT word, count(*) AS fb FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
    FROM documents WHERE doc_id % 2 = 1) GROUP BY 1
), j AS (
  SELECT coalesce(wa.word, wb.word) AS word,
         coalesce(fa, 0) AS fa, coalesce(fb, 0) AS fb
  FROM wa FULL OUTER JOIN wb ON wa.word = wb.word
), tot AS (
  SELECT CAST(sum(fa) AS BIGINT) AS na, CAST(sum(fb) AS BIGINT) AS nb,
         CAST(count(*) AS BIGINT) AS v,
         CAST(sum(CASE WHEN fa > 0 THEN 1 ELSE 0 END) AS BIGINT) AS va,
         CAST(sum(CASE WHEN fb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vb,
         CAST(sum(CASE WHEN fa > 0 AND fb > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS vboth
  FROM j
), terms AS (
  SELECT na, nb, v, va, vb, vboth,
         (fa + 0.5) / (na + 0.5 * v) AS p,
         (fb + 0.5) / (nb + 0.5 * v) AS q
  FROM j CROSS JOIN tot
)
SELECT na AS tokens_a, nb AS tokens_b, v AS vocab_union,
       va AS vocab_a, vb AS vocab_b, vboth AS vocab_both,
       round(CAST(vboth AS DOUBLE) / v, 6) AS vocab_overlap,
       round(sum(p * ln(p / q)), 6) AS kl_ab,
       round(sum(0.5 * p * ln(p / ((p + q) / 2))
               + 0.5 * q * ln(q / ((p + q) / 2))), 6) AS js
FROM terms GROUP BY na, nb, v, va, vb, vboth
"""

EXT5_QUERIES["corpus_divergence"] = q_corpus_divergence
EXT5_ORACLES["corpus_divergence"] = ORACLE_DIVERGENCE

# ---------------------------------------------------------------------
# Boilerplate strip (operators/segdedup.py strip_boilerplate) — the
# RefinedWeb/MassiveText frequency rule: a segment present in more
# than max_docs distinct documents is dropped EVERYWHERE (unlike
# chunk_dedup's first-occurrence election).  Census = two combinable
# groupBys; the hot-segment list is boilerplate-vocabulary-sized.
# ---------------------------------------------------------------------


def q_boilerplate_strip(spark, sf_dir):
    """Per-document boilerplate report: non-overlapping 10-word chunks,
    any chunk appearing in >1 distinct documents removed from every
    document, cleaned text reconstructed in order."""
    from grass_spark.operators.segdedup import (
        segments_by_words,
        strip_boilerplate,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return strip_boilerplate(
        segments_by_words(d, "text", 10), max_docs=1
    ).select("doc_id", "n_segments", "n_kept", "dedup_text")


ORACLE_BOILERPLATE_STRIP = """
WITH sel AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                      ' ') AS ws
  FROM documents
), chunks AS (
  SELECT doc_id, CAST((g.s - 1) // 10 AS BIGINT) AS seg_idx,
         array_to_string(ws[g.s:g.s+9], ' ') AS seg
  FROM sel, unnest(generate_series(1, len(ws), 10)) AS g(s)
), nz AS (
  SELECT * FROM chunks WHERE seg <> ''
), census AS (
  SELECT seg, count(DISTINCT doc_id) AS nd FROM nz GROUP BY seg
), flagged AS (
  SELECT nz.*, CASE WHEN census.nd > 1 THEN 0 ELSE 1 END AS keep
  FROM nz JOIN census USING (seg)
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(keep) AS BIGINT) AS n_kept,
       coalesce(string_agg(CASE WHEN keep = 1 THEN seg END, ' '
                           ORDER BY seg_idx), '') AS dedup_text
FROM flagged GROUP BY doc_id
"""

EXT5_QUERIES["boilerplate_strip"] = q_boilerplate_strip
EXT5_ORACLES["boilerplate_strip"] = ORACLE_BOILERPLATE_STRIP

# ---------------------------------------------------------------------
# Keep-best representative election (operators/dedup.py
# elect_representatives) — same clustering as near_dedup_keep, but the
# survivor is the LONGEST member (max n_chars, ties -> smallest id)
# instead of the smallest id.  Oracled against the DuckDB recursive
# closure + argmax.
# ---------------------------------------------------------------------


def q_dedup_best_keep(spark, sf_dir):
    """Keep decisions where each duplicate cluster keeps its highest-
    n_chars member: md5-LSH -> Jaccard verify (>= 0.8) -> connected
    components -> argmax-score election (ties -> smallest id)."""
    from grass_spark.operators.dedup import (
        dedup_clusters,
        elect_representatives,
        ngram_jaccard_pairs,
        with_shingles,
    )
    from grass_spark.queries_ext3 import _md5_cands

    d = _t(spark, sf_dir, "documents")
    sh = with_shingles(d, "text", 3).select("doc_id", "sh_arr").localCheckpoint()
    verified = ngram_jaccard_pairs(
        d, _md5_cands(sh), shingle_n=3, shingles=sh
    ).filter(F.col("jaccard") >= 0.8)
    clusters = dedup_clusters(verified)
    labeled = d.select("doc_id", "n_chars").join(
        clusters.withColumnRenamed("id", "doc_id"), on="doc_id", how="left"
    ).withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id")))
    out = elect_representatives(labeled, score_col="n_chars")
    return out.select(
        "doc_id",
        F.col("cluster_id").cast("long").alias("cluster_id"),
        "keep",
    ).orderBy("doc_id")


ORACLE_DEDUP_BEST_KEEP = f"""
WITH RECURSIVE {_SQL_SHINGLES},
{_SQL_CANDS}, verified AS (
  SELECT c.id_a, c.id_b
  FROM cands c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b
  WHERE CAST(len(list_intersect(sa.ls, sb.ls)) AS DOUBLE)
        / (len(sa.ls) + len(sb.ls) - len(list_intersect(sa.ls, sb.ls)))
        >= 0.8
), edges AS (
  SELECT id_a AS s, id_b AS d FROM verified
  UNION
  SELECT id_b AS s, id_a AS d FROM verified
), reach AS (
  SELECT s AS id, s AS r FROM edges
  UNION
  SELECT e.s AS id, reach.r AS r
  FROM edges e JOIN reach ON e.d = reach.id
), clusters AS (
  SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
), lab AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id,
         d.n_chars
  FROM documents d LEFT JOIN clusters c ON c.id = d.doc_id
), best AS (
  SELECT cluster_id, max(n_chars) AS b FROM lab GROUP BY cluster_id
), win AS (
  SELECT l.cluster_id, min(l.doc_id) AS keep_id
  FROM lab l JOIN best ON l.cluster_id = best.cluster_id
                      AND l.n_chars = best.b
  GROUP BY l.cluster_id
)
SELECT l.doc_id, CAST(l.cluster_id AS BIGINT) AS cluster_id,
       l.doc_id = w.keep_id AS keep
FROM lab l JOIN win w USING (cluster_id)
ORDER BY l.doc_id
"""

EXT5_QUERIES["dedup_best_keep"] = q_dedup_best_keep
EXT5_ORACLES["dedup_best_keep"] = ORACLE_DEDUP_BEST_KEEP


# ---------------------------------------------------------------------
# CCNet perplexity buckets (operators/lm.py) — per-language
# head/middle/tail strata over the self-trained bigram LM.  Thresholds
# are exact HF7 quantiles of the 6-dp-ROUNDED perplexities (Spark
# percentile == DuckDB quantile_cont), rounded again before the bucket
# comparison so JVM-vs-libm log/pow last-ulp drift can't flip a label.
# ---------------------------------------------------------------------


def q_perplexity_buckets(spark, sf_dir):
    """One row per doc with >= 1 bigram: perplexity, its language's
    head/middle cuts, and the CCNet bucket.  The |langs|-row threshold
    frame broadcasts; the corpus shuffles only in lm_score's groupBy."""
    from grass_spark.operators.lm import perplexity_buckets

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return perplexity_buckets(d)


ORACLE_PERPLEXITY_BUCKETS = """
WITH w AS (
  SELECT doc_id, lang,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                      ' ') AS ws
  FROM documents
), pos AS (
  SELECT doc_id, ws[g.i] AS w1, ws[g.i + 1] AS w2
  FROM w, unnest(generate_series(1, len(ws) - 1)) AS g(i)
  WHERE len(ws) >= 2
), big AS (
  SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c12 FROM pos GROUP BY w1, w2
), uni AS (
  SELECT w1, CAST(sum(c12) AS DOUBLE) AS c1 FROM big GROUP BY w1
), voc AS (
  SELECT CAST(count(DISTINCT wrd) AS DOUBLE) AS v
  FROM (SELECT unnest(ws) AS wrd FROM w)
), sc AS (
  SELECT p.doc_id,
         -log2((coalesce(b.c12, 0) + 0.5)
               / (coalesce(u.c1, 0) + 0.5 * voc.v)) AS nlp
  FROM pos p
  LEFT JOIN big b USING (w1, w2)
  LEFT JOIN uni u USING (w1)
  CROSS JOIN voc
), ppl AS (
  SELECT sc.doc_id, w.lang,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         round(pow(2.0, avg(nlp)), 6) AS perplexity
  FROM sc JOIN w USING (doc_id)
  GROUP BY sc.doc_id, w.lang
), thr AS (
  SELECT lang,
         round(CAST(quantile_cont(perplexity, 1.0/3.0) AS DOUBLE), 6)
           AS ppl_head_cut,
         round(CAST(quantile_cont(perplexity, 2.0/3.0) AS DOUBLE), 6)
           AS ppl_middle_cut
  FROM ppl GROUP BY lang
)
SELECT ppl.doc_id, ppl.lang, ppl.n_bigrams, ppl.perplexity,
       thr.ppl_head_cut, thr.ppl_middle_cut,
       CASE WHEN ppl.perplexity <= thr.ppl_head_cut THEN 'head'
            WHEN ppl.perplexity <= thr.ppl_middle_cut THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ppl JOIN thr USING (lang)
ORDER BY ppl.doc_id
"""

EXT5_QUERIES["perplexity_buckets"] = q_perplexity_buckets
EXT5_ORACLES["perplexity_buckets"] = ORACLE_PERPLEXITY_BUCKETS


# ---------------------------------------------------------------------
# DSIR importance resampling (operators/dsir.py) — hashed-ngram
# likelihood-ratio weights against a target subcorpus, and the
# deterministic Gumbel-top-k sample.  Buckets and the Gumbel uniform
# are the portable md5 recipe; ln() differs JVM-vs-libm in the last
# ulp so sums and keys round to 6 dp in both engines.
# ---------------------------------------------------------------------

_DSIR_B = 1000


def q_dsir_weights(spark, sf_dir):
    """Per-doc DSIR log importance weight: target = the English
    subcorpus, raw = everything.  Featurization is two scan-stage
    Generates; the dense 1000-row log-ratio table broadcasts; one
    combinable groupBy(doc) sums the weight."""
    from grass_spark.operators.dsir import dsir_weights

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    target = d.filter(F.col("lang") == "en")
    return dsir_weights(d, target, n_buckets=_DSIR_B)


def q_dsir_sample(spark, sf_dir):
    """Gumbel-top-k DSIR sample (k=50) — reproduces bit-for-bit on any
    engine: the noise is md5-derived, the selection a TakeOrdered."""
    from grass_spark.operators.dsir import dsir_sample

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    target = d.filter(F.col("lang") == "en")
    return dsir_sample(d, target, 50, n_buckets=_DSIR_B)


_SQL_DSIR_COMMON = """
WITH w AS (
  SELECT doc_id, lang,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                      ' ') AS ws
  FROM documents
), uni AS (
  SELECT doc_id, g
  FROM (SELECT doc_id, unnest(ws) AS g FROM w)
  WHERE g <> ''
), bi AS (
  SELECT doc_id, ws[t.i] || ' ' || ws[t.i + 1] AS g
  FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 2
), grams AS (
  SELECT doc_id,
         CAST(CAST('0x' || substr(md5(g), 1, 8) AS UBIGINT) % 1000
              AS BIGINT) AS bucket
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
), ct AS (
  SELECT g.bucket, CAST(count(*) AS DOUBLE) AS c
  FROM grams g JOIN documents d USING (doc_id)
  WHERE d.lang = 'en' GROUP BY g.bucket
), cr AS (
  SELECT bucket, CAST(count(*) AS DOUBLE) AS c FROM grams GROUP BY bucket
), nt AS (SELECT sum(c) AS n FROM ct),
   nr AS (SELECT sum(c) AS n FROM cr),
dense AS (
  SELECT CAST(range AS BIGINT) AS bucket FROM range(1000)
), lam AS (
  SELECT dense.bucket,
         ln((coalesce(ct.c, 0) + 1.0) / (nt.n + 1.0 * 1000))
         - ln((coalesce(cr.c, 0) + 1.0) / (nr.n + 1.0 * 1000)) AS lam
  FROM dense
  LEFT JOIN ct USING (bucket)
  LEFT JOIN cr USING (bucket)
  CROSS JOIN nt CROSS JOIN nr
), wsum AS (
  SELECT doc_id, round(sum(lam), 6) AS logw
  FROM grams JOIN lam USING (bucket) GROUP BY doc_id
), allw AS (
  SELECT d.doc_id, coalesce(wsum.logw, 0.0) AS logw
  FROM documents d LEFT JOIN wsum USING (doc_id)
)
"""

ORACLE_DSIR_WEIGHTS = (
    _SQL_DSIR_COMMON + "SELECT doc_id, logw FROM allw ORDER BY doc_id"
)

ORACLE_DSIR_SAMPLE = _SQL_DSIR_COMMON + """
SELECT doc_id, logw,
       round(logw + (-ln(-ln(
         (CAST('0x' || substr(md5(doc_id || ':'), 1, 8) AS UBIGINT) + 0.5)
         / 4294967296.0))), 6) AS key
FROM allw
ORDER BY key DESC, doc_id
LIMIT 50
"""

EXT5_QUERIES["dsir_weights"] = q_dsir_weights
EXT5_ORACLES["dsir_weights"] = ORACLE_DSIR_WEIGHTS
EXT5_QUERIES["dsir_sample"] = q_dsir_sample
EXT5_ORACLES["dsir_sample"] = ORACLE_DSIR_SAMPLE


# ---------------------------------------------------------------------
# Cluster-balanced diversity sampling (operators/semdedup.py
# diversity_sample) — assign_clusters x cap_per_group composition:
# at most `cap` vectors per semantic cluster, deterministic md5 draw.
# The DuckDB twin replays the seeded argmax assignment (same
# (sim desc, c_id asc) tie-break as the semantic_dedup oracle) and
# the naive single-window cap.
# ---------------------------------------------------------------------


def q_diversity_sample(spark, sf_dir):
    """Keep <= 10 embeddings per seeded cluster (16 centroids = the 16
    smallest vec_ids).  The hot-cluster draw goes through the salted
    two-stage window; exactness does not depend on salts."""
    from grass_spark.operators.semdedup import diversity_sample

    emb = _t(spark, sf_dir, "embeddings")
    return diversity_sample(
        emb, 10, k=16, salt="div", salts=4
    ).orderBy("vec_id")


ORACLE_DIVERSITY_SAMPLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), cent AS (
  SELECT vec_id AS c_id, e AS ce FROM e ORDER BY vec_id LIMIT 16
), sims AS (
  SELECT e.vec_id, cent.c_id,
         round(list_inner_product(e.e, cent.ce)
               / (sqrt(list_inner_product(e.e, e.e))
                  * sqrt(list_inner_product(cent.ce, cent.ce))), 6) AS sim
  FROM e CROSS JOIN cent
), assign AS (
  SELECT vec_id, c_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY sim DESC, c_id ASC) AS rn
    FROM sims
  ) WHERE rn = 1
), u AS (
  SELECT vec_id, c_id,
         CAST(('0x' || substr(md5(vec_id || ':div'), 1, 8)) AS UBIGINT)
           / 4294967296.0 AS _u
  FROM assign
), r AS (
  SELECT vec_id, c_id, _u,
         row_number() OVER (PARTITION BY c_id ORDER BY _u, vec_id) AS rn
  FROM u
)
SELECT vec_id, CAST(c_id AS BIGINT) AS cluster_id, round(_u, 6) AS u
FROM r WHERE rn <= 10
ORDER BY vec_id
"""

EXT5_QUERIES["diversity_sample"] = q_diversity_sample
EXT5_ORACLES["diversity_sample"] = ORACLE_DIVERSITY_SAMPLE


# ---------------------------------------------------------------------
# Dedup telemetry report (operators/dedup.py dedup_report) — per-source
# duplicate statistics over the near-dedup keep decisions: the
# monitoring surface a recurring ingest watches (a dup_rate spike on
# one source is the mirror-site signature).
# ---------------------------------------------------------------------


def q_dedup_report(spark, sf_dir):
    """Per-source dedup stats from the same md5-LSH -> Jaccard-verify
    (>= 0.8) -> CC chain near_dedup_keep gates; one bounded-cardinality
    groupBy(source) on top."""
    from grass_spark.operators.dedup import (
        dedup_clusters,
        dedup_report,
        ngram_jaccard_pairs,
        with_shingles,
    )
    from grass_spark.queries_ext3 import _md5_cands

    d = _t(spark, sf_dir, "documents")
    sh = with_shingles(d, "text", 3).select("doc_id", "sh_arr").localCheckpoint()
    verified = ngram_jaccard_pairs(
        d, _md5_cands(sh), shingle_n=3, shingles=sh
    ).filter(F.col("jaccard") >= 0.8)
    clusters = dedup_clusters(verified)
    decisions = d.select("doc_id").join(
        clusters.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    ).select(
        "doc_id",
        F.col("cluster_id").cast("long").alias("cluster_id"),
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )
    return dedup_report(decisions, d).orderBy("source")


ORACLE_DEDUP_REPORT = f"""
WITH RECURSIVE {{shingles}},
{{cands}}, verified AS (
  SELECT c.id_a, c.id_b
  FROM cands c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b
  WHERE CAST(len(list_intersect(sa.ls, sb.ls)) AS DOUBLE)
        / (len(sa.ls) + len(sb.ls) - len(list_intersect(sa.ls, sb.ls)))
        >= 0.8
), edges AS (
  SELECT id_a AS s, id_b AS d FROM verified
  UNION
  SELECT id_b AS s, id_a AS d FROM verified
), reach AS (
  SELECT s AS id, s AS r FROM edges
  UNION
  SELECT e.s AS id, reach.r AS r
  FROM edges e JOIN reach ON e.d = reach.id
), clusters AS (
  SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
), decisions AS (
  SELECT d.doc_id, d.source,
         CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
         d.doc_id = coalesce(c.cluster_id, d.doc_id) AS keep
  FROM documents d
  LEFT JOIN clusters c ON c.id = d.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(count(*) - sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       round(CAST(count(*) - sum(CASE WHEN keep THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS dup_rate,
       CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters
FROM decisions
GROUP BY source
ORDER BY source
""".format(shingles=_SQL_SHINGLES, cands=_SQL_CANDS)

EXT5_QUERIES["dedup_report"] = q_dedup_report
EXT5_ORACLES["dedup_report"] = ORACLE_DEDUP_REPORT
