"""Eighth wave of driver-contract queries: preference-pair assembly
and epoch upsampling (operators/preference.py).

Both derive deterministic inputs from the ``documents`` table with
engine-portable expressions (md5-bucket prompt ids, md5-uniform
scores) so the DuckDB oracle rebuilds the identical lattice.

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.preference import preference_pairs, upsample_epochs
from grass_spark.operators.sampling import uniform_hash
from grass_spark.queries_ext import _t

EXT8_QUERIES: dict = {}
EXT8_ORACLES: dict = {}


# portable md5-uniform in both engines (see operators/sampling.py)
_DUCK_HASH = (
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || '{salt}'),"
    " 1, 8) AS UBIGINT)"
)


# ---------------------------------------------------------------------
# preference pairs — best-of-N election per md5-bucketed prompt
# ---------------------------------------------------------------------

def _scored_completions(spark, sf_dir):
    """documents as scored completions: 64 md5-bucket prompts, an
    md5-uniform score — deterministic and DuckDB-replayable."""
    docs = _t(spark, sf_dir, "documents")
    prompt = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit("prompt"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 64
    )
    return docs.select(
        prompt.alias("prompt_id"),
        "doc_id",
        "text",
        uniform_hash(F.col("doc_id"), "score").alias("score"),
    )


def q_preference_pairs(spark, sf_dir):
    pairs = preference_pairs(
        _scored_completions(spark, sf_dir),
        prompt_col="prompt_id",
        id_col="doc_id",
        text_col="text",
        score_col="score",
        min_margin=0.05,
    )
    return pairs.orderBy("prompt_id")


ORACLE_PREFERENCE_PAIRS = f"""
WITH s AS (
  SELECT CAST({_DUCK_HASH.format(salt='prompt')} % 64 AS BIGINT) AS prompt_id,
         doc_id, text,
         round({_DUCK_HASH.format(salt='score')} / 4294967296.0, 6) AS s
  FROM documents
),
ranked AS (
  SELECT prompt_id, doc_id, text, s,
         row_number() OVER (PARTITION BY prompt_id
                            ORDER BY s DESC, doc_id DESC) AS rc,
         row_number() OVER (PARTITION BY prompt_id
                            ORDER BY s ASC, doc_id ASC) AS rr,
         count(*) OVER (PARTITION BY prompt_id) AS n
  FROM s
)
SELECT c.prompt_id,
       c.doc_id AS chosen_id, c.text AS chosen_text,
       r.doc_id AS rejected_id, r.text AS rejected_text,
       round(c.s - r.s, 6) AS margin,
       c.n AS n_completions
FROM ranked c
JOIN ranked r ON c.prompt_id = r.prompt_id AND r.rr = 1
WHERE c.rc = 1 AND c.n >= 2 AND round(c.s - r.s, 6) >= 0.05
ORDER BY c.prompt_id
"""

EXT8_QUERIES["preference_pairs"] = q_preference_pairs
EXT8_ORACLES["preference_pairs"] = ORACLE_PREFERENCE_PAIRS


# ---------------------------------------------------------------------
# epoch upsampling — mixture weights above 1 (LLaMA-style repeats)
# ---------------------------------------------------------------------

_EPOCH_WEIGHTS = {"src0": 2.5, "src1": 1.75, "src2": 1.0, "src3": 0.4, "src4": 0.0}


def q_upsample_epochs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = upsample_epochs(
        docs,
        _EPOCH_WEIGHTS,
        group_col="source",
        id_col="doc_id",
        default_weight=1.0,
        salt="epoch",
    )
    return out.select(
        "doc_id", "source", F.col("epoch").cast("int").alias("epoch")
    ).orderBy("doc_id", "epoch")


ORACLE_UPSAMPLE_EPOCHS = f"""
WITH w(source, wt) AS (
  VALUES ('src0', 2.5), ('src1', 1.75), ('src2', 1.0),
         ('src3', 0.4), ('src4', 0.0)
),
j AS (
  SELECT d.doc_id, d.source,
         round(CAST(coalesce(w.wt, 1.0) AS DOUBLE), 6) AS wt,
         {_DUCK_HASH.format(salt='epoch')} / 4294967296.0 AS h
  FROM documents d LEFT JOIN w ON d.source = w.source
),
fan AS (
  SELECT doc_id, source, wt, h,
         unnest(generate_series(0, CAST(ceil(wt) AS BIGINT) - 1)) AS epoch
  FROM j
)
SELECT doc_id, source, CAST(epoch AS INTEGER) AS epoch
FROM fan
WHERE epoch < floor(wt) OR h < round(wt - floor(wt), 6)
ORDER BY doc_id, epoch
"""

EXT8_QUERIES["upsample_epochs"] = q_upsample_epochs
EXT8_ORACLES["upsample_epochs"] = ORACLE_UPSAMPLE_EPOCHS


# ---------------------------------------------------------------------
# length-bucketed batches — the padding dataloader's packing twin
# ---------------------------------------------------------------------

def q_length_batches(spark, sf_dir):
    from grass_spark.operators.pack import length_batches

    docs = _t(spark, sf_dir, "documents")
    out = length_batches(
        docs.select("source", "doc_id", "n_chars"),
        8,
        group_col="source",
        id_col="doc_id",
        tokens_col="n_chars",
    )
    return out.select(
        "source", "doc_id", "batch_idx", "padded_to", "pad_waste"
    ).orderBy("source", "batch_idx", "doc_id")


ORACLE_LENGTH_BATCHES = """
WITH b AS (
  SELECT source, doc_id, n_chars,
         CAST(floor((row_number() OVER (PARTITION BY source
                                        ORDER BY n_chars, doc_id) - 1)
                    / 8) AS BIGINT) AS batch_idx
  FROM documents
)
SELECT source, doc_id, batch_idx,
       max(n_chars) OVER (PARTITION BY source, batch_idx) AS padded_to,
       max(n_chars) OVER (PARTITION BY source, batch_idx) - n_chars
         AS pad_waste
FROM b
ORDER BY source, batch_idx, doc_id
"""

EXT8_QUERIES["length_batches"] = q_length_batches
EXT8_ORACLES["length_batches"] = ORACLE_LENGTH_BATCHES


# ---------------------------------------------------------------------
# DPO JSONL lines — preference pairs through the shard-line serializer
# (gates the byte format end-to-end: escapes, compact separators)
# ---------------------------------------------------------------------

def q_dpo_jsonl(spark, sf_dir):
    from grass_spark.operators.sft import sft_jsonl_lines

    pairs = preference_pairs(
        _scored_completions(spark, sf_dir),
        prompt_col="prompt_id",
        id_col="doc_id",
        text_col="text",
        score_col="score",
        min_margin=0.05,
    )
    out = sft_jsonl_lines(
        pairs, conv_col="prompt_id", fields=("chosen_text", "rejected_text")
    )
    return out.select(
        "prompt_id",
        F.length("line").alias("n_line_chars"),
        F.md5("line").alias("line_md5"),
    ).orderBy("prompt_id")


_ORACLE_PAIRS_CTE = f"""
s AS (
  SELECT CAST({_DUCK_HASH.format(salt='prompt')} % 64 AS BIGINT) AS prompt_id,
         doc_id, text,
         round({_DUCK_HASH.format(salt='score')} / 4294967296.0, 6) AS s
  FROM documents
),
ranked AS (
  SELECT prompt_id, doc_id, text, s,
         row_number() OVER (PARTITION BY prompt_id
                            ORDER BY s DESC, doc_id DESC) AS rc,
         row_number() OVER (PARTITION BY prompt_id
                            ORDER BY s ASC, doc_id ASC) AS rr,
         count(*) OVER (PARTITION BY prompt_id) AS n
  FROM s
),
pairs AS (
  SELECT c.prompt_id,
         c.text AS chosen_text, r.text AS rejected_text
  FROM ranked c
  JOIN ranked r ON c.prompt_id = r.prompt_id AND r.rr = 1
  WHERE c.rc = 1 AND c.n >= 2 AND round(c.s - r.s, 6) >= 0.05
)
"""

ORACLE_DPO_JSONL = f"""
WITH {_ORACLE_PAIRS_CTE},
lines AS (
  SELECT prompt_id,
         to_json(struct_pack(
           prompt_id := prompt_id,
           chosen_text := chosen_text,
           rejected_text := rejected_text
         )) AS line
  FROM pairs
)
SELECT prompt_id, CAST(len(line) AS INT) AS n_line_chars,
       md5(line) AS line_md5
FROM lines
ORDER BY prompt_id
"""

EXT8_QUERIES["dpo_jsonl"] = q_dpo_jsonl
EXT8_ORACLES["dpo_jsonl"] = ORACLE_DPO_JSONL
