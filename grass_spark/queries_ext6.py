"""Sixth wave of driver-contract queries: round-5 closing operators —
line-level document cleaning (C4/RefinedWeb rules).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.queries_ext import _t

EXT6_QUERIES: dict = {}
EXT6_ORACLES: dict = {}


# ---------------------------------------------------------------------
# Line-level cleaning (operators/linefilter.py) — the synthetic docs
# are single-line word soup, so the query first wraps them into 7-word
# pseudo-lines with ONE portable regexp_replace (both engines consume
# matches non-overlapping left-to-right) and uppercases every 5th doc
# to light up the mainly-uppercase rule; 'customer' is a vocab word so
# the phrase rule discriminates.  The operator itself is a pure
# scan-stage projection (plan-pinned zero-Exchange in tests).
# ---------------------------------------------------------------------

_WRAP_PAT = r"((?:\S+ ){6}\S+) "


def q_line_filter(spark, sf_dir):
    """Per-document line-cleaning report: line census, cleaned-text
    hash, removed-character share, doc keep with first-fail reason."""
    from grass_spark.operators.linefilter import LineRules, line_filter

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    wrapped = F.regexp_replace(norm, _WRAP_PAT, "$1\n")
    text2 = F.when(F.col("doc_id") % 5 == 0, F.upper(wrapped)).otherwise(
        wrapped
    )
    rules = LineRules(
        min_line_words=4,
        require_terminal_punct=False,
        drop_phrases=("customer",),
        min_kept_lines=3,
        max_removed_frac=0.35,
    )
    out = line_filter(d.select("doc_id", text2.alias("text")), rules)
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept_lines",
        F.round("removed_char_frac", 6).alias("removed_char_frac"),
        "reject_reason",
        "keep",
        F.md5("clean_text").alias("clean_md5"),
    ).orderBy("doc_id")


ORACLE_LINE_FILTER = f"""
WITH t AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
           '{_WRAP_PAT}', '\\1' || chr(10), 'g') AS wrapped
  FROM documents
), t2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN upper(wrapped)
              ELSE wrapped END AS text
  FROM t
), k AS (
  SELECT doc_id, text, string_split(text, chr(10)) AS lines,
         list_filter(string_split(text, chr(10)), ln ->
           len(list_filter(regexp_split_to_array(ln, '\\s+'),
                           w -> w <> '')) >= 4
           AND NOT contains(lower(ln), 'customer')
           AND (len(regexp_replace(ln, '[^A-Za-z]', '', 'g')) = 0 OR
                CAST(len(regexp_replace(ln, '[^A-Z]', '', 'g')) AS DOUBLE)
                  / len(regexp_replace(ln, '[^A-Za-z]', '', 'g')) <= 0.6)
           AND CAST(len(regexp_replace(ln, '[^0-9]', '', 'g')) AS DOUBLE)
                 / greatest(len(ln), 1) <= 0.5
         ) AS kept
  FROM t2
), m AS (
  SELECT doc_id, text,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(kept) AS BIGINT) AS n_kept_lines,
         -- DuckDB array_to_string([]) is NULL where Spark's is ''
         coalesce(array_to_string(kept, chr(10)), '') AS clean
  FROM k
), g AS (
  SELECT *,
         CAST(len(text) - len(clean) AS DOUBLE) / greatest(len(text), 1)
           AS rf,
         CASE WHEN contains(lower(text), 'lorem ipsum') THEN 'lorem_ipsum'
              WHEN contains(text, '{{') THEN 'curly_brace'
              WHEN n_kept_lines < 3 THEN 'too_few_lines'
              WHEN CAST(len(text) - len(clean) AS DOUBLE)
                     / greatest(len(text), 1) > 0.35 THEN 'removed_frac'
              ELSE 'keep' END AS reject_reason
  FROM m
)
SELECT doc_id, n_lines, n_kept_lines,
       round(rf, 6) AS removed_char_frac,
       reject_reason,
       reject_reason = 'keep' AS keep,
       md5(clean) AS clean_md5
FROM g ORDER BY doc_id
"""

EXT6_QUERIES["line_filter"] = q_line_filter
EXT6_ORACLES["line_filter"] = ORACLE_LINE_FILTER


# ---------------------------------------------------------------------
# Subword encode (operators/textstats.py subword_encode) — the token-ID
# sequence a trainer consumes.  Ids are canonical-vocab positions (the
# same length-desc order that makes the regex greedy), OOV chars map to
# len(vocab)+codepoint; both engines replay the identical pattern and
# id assignment, so the md5 of the id sequence hash-gates the whole
# encode path bit-for-bit.
# ---------------------------------------------------------------------


def q_subword_encode(spark, sf_dir):
    """Per document: token count, id-sequence md5, and the first/last
    token ids (spot-checkable without a wide row)."""
    from grass_spark.operators.textstats import subword_encode

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = subword_encode(d)
    ids = F.col("token_ids")
    return out.select(
        "doc_id",
        "n_tokens",
        F.element_at(ids, 1).alias("first_id"),
        F.element_at(ids, -1).alias("last_id"),
        F.md5(F.array_join(ids.cast("array<string>"), ",")).alias("ids_md5"),
    ).orderBy("doc_id")


def _subword_encode_oracle() -> str:
    from grass_spark.operators.textstats import (
        DEFAULT_SUBWORDS,
        canonical_vocab,
        greedy_vocab_pattern,
    )

    pat = greedy_vocab_pattern(DEFAULT_SUBWORDS)
    vocab = canonical_vocab(DEFAULT_SUBWORDS)
    vlit = "[" + ",".join(f"'{p}'" for p in vocab) + "]"
    return f"""
WITH t AS (
  SELECT doc_id,
         regexp_extract_all(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
           '{pat}') AS pieces
  FROM documents
), ids AS (
  SELECT doc_id,
         list_transform(pieces, p ->
           CASE WHEN list_position({vlit}, p) > 0
                THEN list_position({vlit}, p) - 1
                ELSE ascii(p) + {len(vocab)} END) AS ids
  FROM t
)
SELECT doc_id,
       CAST(len(ids) AS BIGINT) AS n_tokens,
       CAST(ids[1] AS INT) AS first_id,
       CAST(ids[-1] AS INT) AS last_id,
       md5(coalesce(array_to_string(ids, ','), '')) AS ids_md5
FROM ids ORDER BY doc_id
"""


EXT6_QUERIES["subword_encode"] = q_subword_encode
EXT6_ORACLES["subword_encode"] = _subword_encode_oracle()


# ---------------------------------------------------------------------
# Product quantization (operators/pq.py) — m=8 subspaces x k=16 seeded
# centroids over the 64-d embeddings.  Codes hash-gate the full
# argmin chain (distances are pure IEEE *,-,+ folds in identical
# left-to-right order, rounded 6 dp before the argmin — bit-identical
# across engines); recon_err sums the chosen distances in subspace
# order (DuckDB list(ORDER BY j) -> list_sum replays Spark's chain).
# ---------------------------------------------------------------------

_PQ_M, _PQ_K = 8, 16


def q_pq_codes(spark, sf_dir):
    """PQ-encode every embedding: the m-code vector (hashed) plus the
    per-vector quantization distortion."""
    from grass_spark.operators.pq import pq_codebook, pq_encode

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cb = pq_codebook(e, _PQ_M, _PQ_K)
    out = pq_encode(e, cb, with_err=True)
    return out.select(
        "vec_id",
        F.md5(F.array_join(F.col("codes").cast("array<string>"), ","))
            .alias("codes_md5"),
        "recon_err",
    ).orderBy("vec_id")


_PQ_SUB = 64 // _PQ_M

#: shared PQ chain: e (double vectors), centn (seeded codebook rows),
#: sub/csub (subvectors), best (per (vec, j) argmin), codes (+ recon)
_SQL_PQ_COMMON = f"""e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), centn AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {_PQ_K})
), js AS (SELECT unnest(range({_PQ_M})) AS j),
sub AS (
  SELECT e.vec_id, js.j,
         e.v[js.j * {_PQ_SUB} + 1 : js.j * {_PQ_SUB} + {_PQ_SUB}] AS sv
  FROM e CROSS JOIN js
), csub AS (
  SELECT centn.c, js.j,
         centn.v[js.j * {_PQ_SUB} + 1 : js.j * {_PQ_SUB} + {_PQ_SUB}] AS cv
  FROM centn CROSS JOIN js
), d AS (
  SELECT sub.vec_id, sub.j, csub.c,
         round(list_sum(list_transform(range(1, {_PQ_SUB} + 1),
             t -> (sub.sv[t] - csub.cv[t]) * (sub.sv[t] - csub.cv[t]))), 6)
           AS dist
  FROM sub JOIN csub USING (j)
), best AS (
  SELECT vec_id, j, c, dist,
         row_number() OVER (PARTITION BY vec_id, j
                            ORDER BY dist, c) AS rn
  FROM d
), codes AS (
  SELECT vec_id,
         list(c ORDER BY j) AS codes,
         round(list_sum(list(dist ORDER BY j)), 6) AS recon_err
  FROM best WHERE rn = 1 GROUP BY vec_id
)"""

ORACLE_PQ_CODES = f"""
WITH {_SQL_PQ_COMMON}
SELECT vec_id,
       md5(array_to_string(codes, ',')) AS codes_md5,
       recon_err
FROM codes ORDER BY vec_id
"""

EXT6_QUERIES["pq_codes"] = q_pq_codes
EXT6_ORACLES["pq_codes"] = ORACLE_PQ_CODES


# ---------------------------------------------------------------------
# IVF x PQ composed search (operators/pq.py ivf_pq_topk) — the whole
# billion-scale retrieval path hash-gated end to end: seeded IVF cells
# (argmax of dot - |c|^2/2, pure IEEE fold — bit-identical unrounded),
# per-query ADC tables, code-only candidate scoring, shortlist, exact
# cosine re-rank.  Tie-break parity pinned per expression: cell argmax
# breaks ties to the SMALLEST ordinal (array_max of (s, -i)) while the
# query's probe ranking breaks to the LARGEST (reverse(array_sort) on
# (s, i)) — the oracle replays each exactly.
# ---------------------------------------------------------------------

_IVF_K, _NPROBE, _SHORTLIST, _TOPK = 8, 3, 40, 10


def q_ivf_pq_search(spark, sf_dir):
    """Top-10 by exact cosine within the ADC shortlist of the 3 probed
    IVF cells, for the 5 smallest-id query vectors over the full
    embeddings table."""
    from grass_spark.operators.pq import ivf_pq_topk, pq_codebook

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in e.orderBy("vec_id").limit(_IVF_K).collect()
    ]
    cb = pq_codebook(e, _PQ_M, _PQ_K)
    q = e.filter(F.col("vec_id") < 5)
    return ivf_pq_topk(
        e, q, cents, cb, k=_TOPK, nprobe=_NPROBE, shortlist=_SHORTLIST
    ).orderBy("q_id", "rank")


ORACLE_IVF_PQ = f"""
WITH {_SQL_PQ_COMMON}, ivfc AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v AS cv
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {_IVF_K})
), cellscore AS (
  SELECT e.vec_id, ivfc.c,
         list_sum(list_transform(range(1, len(e.v) + 1),
                                 i -> e.v[i] * ivfc.cv[i]))
         - list_sum(list_transform(ivfc.cv, x -> x * x)) / 2.0 AS s
  FROM e CROSS JOIN ivfc
), cell AS (
  SELECT vec_id, c AS cell FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY s DESC, c ASC) AS rn
    FROM cellscore) WHERE rn = 1
), probes AS (
  -- query-side probe ranking ties break to the LARGER cell id
  -- (reverse(array_sort) on (s, i) structs)
  SELECT vec_id AS q_id, c AS cell FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY s DESC, c DESC) AS rn
    FROM cellscore WHERE vec_id < 5) WHERE rn <= {_NPROBE}
), qtab AS (
  -- per-query ADC table: T[j][c] = round(||q_sub_j - centroid_jc||^2, 6)
  SELECT q.vec_id AS q_id, csub.j, csub.c,
         round(list_sum(list_transform(range(1, {_PQ_SUB} + 1),
             t -> (q.v[csub.j * {_PQ_SUB} + t] - csub.cv[t])
                  * (q.v[csub.j * {_PQ_SUB} + t] - csub.cv[t]))), 6) AS t
  FROM (SELECT * FROM e WHERE vec_id < 5) q CROSS JOIN csub
), cand AS (
  SELECT p.q_id, cell.vec_id AS n_id
  FROM probes p JOIN cell ON cell.cell = p.cell
  WHERE cell.vec_id <> p.q_id
), cc AS (
  SELECT vec_id, CAST(g.j - 1 AS BIGINT) AS j, codes[g.j] AS code
  FROM codes, unnest(generate_series(1, {_PQ_M})) AS g(j)
), adct AS (
  SELECT cand.q_id, cand.n_id,
         round(list_sum(list(T.t ORDER BY T.j)), 6) AS adc
  FROM cand
  JOIN cc ON cc.vec_id = cand.n_id
  JOIN qtab T ON T.q_id = cand.q_id AND T.j = cc.j AND T.c = cc.code
  GROUP BY cand.q_id, cand.n_id
), short AS (
  SELECT q_id, n_id, adc FROM (
    SELECT q_id, n_id, adc,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY adc, n_id) AS rn
    FROM adct) WHERE rn <= {_SHORTLIST}
), rescored AS (
  SELECT s.q_id, s.n_id, s.adc,
         round(list_sum(list_transform(range(1, len(qe.v) + 1),
                                       i -> qe.v[i] * ne.v[i]))
               / (sqrt(list_sum(list_transform(qe.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(ne.v, x -> x * x)))), 6)
           AS cosine
  FROM short s
  JOIN e qe ON qe.vec_id = s.q_id
  JOIN e ne ON ne.vec_id = s.n_id
)
SELECT q_id, n_id AS neighbor_id, adc, cosine,
       CAST(rank AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cosine DESC, n_id ASC) AS rank
  FROM rescored) WHERE rank <= {_TOPK}
ORDER BY q_id, rank
"""

EXT6_QUERIES["ivf_pq_search"] = q_ivf_pq_search
EXT6_ORACLES["ivf_pq_search"] = ORACLE_IVF_PQ


# ---------------------------------------------------------------------
# Temperature mixture sampling (operators/sampling.py
# temperature_rates) — share_g ∝ tokens_g^alpha, the XLM-R/mT5
# multilingual rule.  pow is libm so the share rounds to 6 dp before
# the rate arithmetic; the md5 draw after that is exact in both
# engines, so the SAMPLE ITSELF is the gated artifact.
# ---------------------------------------------------------------------

_TEMP_ALPHA, _TEMP_BUDGET = 0.3, 25000


def q_temperature_sample(spark, sf_dir):
    """End-to-end temperature-flattened sampling (alpha=0.3, char
    budget 25k, weights = n_chars): the kept (doc_id, lang) set."""
    from grass_spark.operators.sampling import hash_sample, temperature_rates

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    rates = temperature_rates(
        d, _TEMP_ALPHA, _TEMP_BUDGET, weight_col="n_chars"
    )
    return hash_sample(d, rates, salt="temp1").select(
        "doc_id", "lang"
    ).orderBy("doc_id")


ORACLE_TEMPERATURE_SAMPLE = f"""
WITH g AS (
  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS tokens,
         pow(CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE), {_TEMP_ALPHA})
           AS p
  FROM documents GROUP BY lang
), t AS (SELECT sum(p) AS tp FROM g),
r AS (
  SELECT lang,
         least(1.0, round(p / tp, 6) * {_TEMP_BUDGET} / tokens)
           AS keep_rate
  FROM g CROSS JOIN t
)
SELECT d.doc_id, d.lang
FROM documents d JOIN r USING (lang)
WHERE CAST(('0x' || substr(md5(d.doc_id || ':temp1'), 1, 8)) AS UBIGINT)
      / 4294967296.0 < r.keep_rate
ORDER BY d.doc_id
"""

EXT6_QUERIES["temperature_sample"] = q_temperature_sample
EXT6_ORACLES["temperature_sample"] = ORACLE_TEMPERATURE_SAMPLE


# ---------------------------------------------------------------------
# Text normalization (operators/textstats.py normalize_text) — the
# canonical pre-dedup cleanup.  The synthetic docs are plain ASCII, so
# the query first INJECTS the typographic zoo (curly quotes, em dash,
# NBSP, ellipsis, a control char, doubled spaces) as a literal suffix
# — identical bytes in both engines — then hash-gates the normalized
# result.
# ---------------------------------------------------------------------

_NORM_SUFFIX = "  “Quoted” — ‘stressed’… END\x07 tail   spaces"


def q_normalize_text(spark, sf_dir):
    """md5 of the normalized (text + typographic-zoo suffix), plus the
    char delta the cleanup removed."""
    from grass_spark.operators.textstats import normalize_text

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    messy = d.select(
        "doc_id", F.concat(F.col("text"), F.lit(_NORM_SUFFIX)).alias("text")
    )
    out = normalize_text(messy)
    return out.select(
        "doc_id",
        F.length("text").alias("n_raw_chars"),
        F.length("norm_text").alias("n_norm_chars"),
        F.md5("norm_text").alias("norm_md5"),
    ).orderBy("doc_id")


ORACLE_NORMALIZE_TEXT = """
WITH messy AS (
  SELECT doc_id,
         text || '  “Quoted” — ‘stressed’…' || chr(160) || 'END'
              || chr(7) || ' tail   spaces' AS text
  FROM documents
), norm AS (
  SELECT doc_id, text,
    lower(trim(regexp_replace(
      regexp_replace(
        replace(replace(replace(replace(replace(replace(replace(replace(
          replace(text, '“', '"'), '”', '"'), '„', '"'),
          '‘', chr(39)), '’', chr(39)), '–', '-'), '—', '-'),
          '…', '...'), chr(160), ' '),
        '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),
      '\\s+', ' ', 'g'))) AS norm_text
  FROM messy
)
SELECT doc_id,
       CAST(len(text) AS INT) AS n_raw_chars,
       CAST(len(norm_text) AS INT) AS n_norm_chars,
       md5(norm_text) AS norm_md5
FROM norm ORDER BY doc_id
"""

EXT6_QUERIES["normalize_text"] = q_normalize_text
EXT6_ORACLES["normalize_text"] = ORACLE_NORMALIZE_TEXT
