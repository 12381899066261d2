"""Corpus BM25 retrieval scoring — rank documents against a small set
of query strings with Okapi BM25 (Robertson–Spärck Jones; the Lucene
``k1``/``b`` variant with the +1-smoothed idf, so scores are never
negative).

Training-data pipelines use this as the retrieval leg of targeted
curation: given a handful of probe queries ("quality seed" passages,
benchmark prompts, domain descriptors), score the whole corpus and
keep/inspect the top hits per query.  The reference engine has no
retrieval module — this extends the corpus toolbox alongside TF-IDF
(operators/keywords.py), which shares its tokenizer.

Scale shape (what survives 100 TB):

* one corpus scan builds ``tf`` = groupBy(doc, word) — map-side
  combinable; doc length ``dl`` comes from the SAME groupBy via a
  second pass over the tf frame keyed on the doc id (never a separate
  text re-scan).
* the document-frequency census is vocabulary-sized; it is filtered to
  the query vocabulary (tiny) BEFORE joining, so the corpus-sized tf
  frame joins once against a broadcast term table and once (on the doc
  id) to pick up ``dl``.
* corpus cardinalities (N docs, total tokens) are a 1-row aggregate
  broadcast-crossJoined into the plan — nothing collected.
* top-k per query reuses the two-stage sharded selection
  (:func:`grass_spark.operators.similarity._topk_per_query` shape): a
  common query term can match a constant fraction of the corpus, so a
  bare ``partitionBy(query)`` window would single-task it.

Cross-engine parity: contributions are pure double arithmetic over
exact integer counts with the association order mirrored verbatim in
the DuckDB oracle; ``ln`` may differ in the last ulp between JVM and
libm, so the summed score is rounded to 6 dp and ranking uses the
rounded score with the doc id as tie-break (the tfidf_keywords
convention, CLAUDE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from grass_spark.operators.keywords import WORD_PATTERN, doc_terms


def query_terms(
    queries: DataFrame,
    *,
    q_id_col: str = "query_id",
    q_text_col: str = "q_text",
) -> DataFrame:
    """(query_id, word) — DISTINCT query terms (BM25 ignores query-side
    term multiplicity; duplicated words in a query string score once)."""
    words = F.explode(
        F.regexp_extract_all(
            F.lower(F.col(q_text_col)), F.lit(WORD_PATTERN), F.lit(0)
        )
    ).alias("word")
    return queries.select(F.col(q_id_col), words).distinct()


def _census_candidates(
    docs: DataFrame, qt: DataFrame, *, text_col: str, id_col: str
) -> DataFrame:
    """Index-build path: full (doc, word) tf census, then probe.

    tf feeds FOUR consumers (dl, dfreq, total_tokens, the match join)
    whose pruned projections defeat ReuseExchange — without the
    checkpoint the corpus tokenize+groupBy re-executes per consumer
    (measured 5 scans / 0 reuse; the prepare_corpus lesson).
    """
    tf = doc_terms(docs, text_col=text_col, id_col=id_col).localCheckpoint(
        eager=False
    )
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    # vocabulary census, filtered to the (tiny) query vocabulary before
    # any corpus-sized join — both joins below broadcast the term side
    qwords = qt.select("word").distinct()
    dfreq = (
        tf.groupBy("word")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(qwords), "word")
    )
    scalars = docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        tf.agg(F.sum("tf").alias("total_tokens"))
    )
    terms = F.broadcast(qt.join(F.broadcast(dfreq), "word"))
    return (
        tf.join(terms, "word")
        .join(dl, id_col)
        .crossJoin(F.broadcast(scalars))
    )


def _scan_candidates(
    docs: DataFrame,
    qt: DataFrame,
    *,
    text_col: str,
    id_col: str,
    q_id_col: str,
) -> DataFrame:
    """Query-pushdown path: the query vocabulary (collected —
    probe-set-bounded by contract) filters the token arrays IN the
    scan stage, so the only corpus-keyed shuffle carries occurrences
    of query terms (~|terms|/|vocab| of the census path's volume).

    The token array is materialized once per row (the checkpointed
    projection) — referencing the derived ``regexp_extract_all`` from
    size() AND filter() would re-run the regex per reference
    (CollapseProject inlines; the SQ8 lesson).  df/dl/tf are exact and
    identical to the census path (pinned by tests).
    """
    terms = sorted({r["word"] for r in qt.select("word").collect()})
    ws = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
    )
    toks = docs.select(F.col(id_col), ws.alias("_ws")).localCheckpoint(
        eager=False
    )
    scalars = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("_ws")).alias("total_tokens"),
    )
    if not terms:  # no alnum token in any query: no candidates
        return (
            toks.select(F.col(id_col))
            .limit(0)
            .withColumn("word", F.lit(""))
            .withColumn("dl", F.lit(0).cast("bigint"))
            .withColumn("tf", F.lit(0).cast("bigint"))
            .join(F.broadcast(qt), "word")
            .withColumn("df", F.lit(0).cast("bigint"))
            .crossJoin(F.broadcast(scalars))
        )
    lit_terms = F.array(*[F.lit(t) for t in terms])
    occ = toks.select(
        F.col(id_col),
        F.size("_ws").cast("bigint").alias("dl"),
        F.explode(
            F.filter("_ws", lambda w: F.array_contains(lit_terms, w))
        ).alias("word"),
    )
    cand = occ.groupBy(id_col, "dl", "word").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = cand.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    return (
        cand.join(F.broadcast(qt), "word")
        .join(F.broadcast(dfreq), "word")
        .crossJoin(F.broadcast(scalars))
    )


def bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    q_id_col: str = "query_id",
    q_text_col: str = "q_text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    salts: int = 16,
    method: str = "auto",
) -> DataFrame:
    """Top-``top_k`` documents per query by BM25.

    Returns (query_id, doc_id, n_terms, score, rank) where ``n_terms``
    counts the distinct query terms present in the doc, ``score`` is
    the 6-dp-rounded BM25 sum and rank 1..top_k orders by
    (score desc, doc_id asc).  Docs matching no query term are absent.

    ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` (always positive);
    ``tf_part = tf*(k1+1) / (tf + k1*((1-b) + b*(dl/avgdl)))`` with
    ``avgdl = total_tokens / N`` over ALL input docs (token-less docs
    count in N with dl = 0 — they can never match anyway).

    ``method``: ``"scan"`` pushes the (collected, probe-set-bounded)
    query vocabulary into the corpus scan — only occurrences of query
    terms ever shuffle (the 4M-doc soak measured the census path's
    full (doc, word) census shuffle at efficiency 0.706; the scan path
    shuffles ~vocab_fraction of that).  ``"census"`` builds the full
    term-frequency census — the right shape when the query set is
    large or reused across batches (an index build).  ``"auto"``
    (default) picks scan at <= 64 distinct query terms.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if method not in ("auto", "scan", "census"):
        raise ValueError(f"unknown method {method!r}")
    qt = query_terms(queries, q_id_col=q_id_col, q_text_col=q_text_col)
    if method == "auto":
        method = (
            "scan"
            if qt.select("word").distinct().count() <= 64
            else "census"
        )
    if method == "scan":
        matched = _scan_candidates(
            docs, qt, text_col=text_col, id_col=id_col, q_id_col=q_id_col
        )
    else:
        matched = _census_candidates(
            docs, qt, text_col=text_col, id_col=id_col
        )
    n_d = F.col("n_docs").cast("double")
    df_d = F.col("df").cast("double")
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    avgdl = F.col("total_tokens").cast("double") / n_d
    idf = F.log(F.lit(1.0) + (n_d - df_d + F.lit(0.5)) / (df_d + F.lit(0.5)))
    tf_part = (tf_d * F.lit(k1 + 1.0)) / (
        tf_d + F.lit(float(k1)) * (F.lit(1.0 - b) + F.lit(float(b)) * (dl_d / avgdl))
    )
    scored = (
        matched.withColumn("_contrib", idf * tf_part)
        .groupBy(q_id_col, id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum("_contrib"), 6).alias("score"),
        )
    )
    # two-stage sharded top-k: stage 1 ranks within (query, doc-shard)
    # so no task ever sees more than ~|matches|/salts rows; stage 2
    # ranks the <= salts*top_k survivors.  Exact-superset argument as
    # operators/similarity._topk_per_query / operators/caps.py.
    shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salts)).cast("int")
    local = Window.partitionBy(q_id_col, "_s").orderBy(
        F.desc("score"), F.asc(id_col)
    )
    final = Window.partitionBy(q_id_col).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.withColumn("_s", shard)
        .withColumn("_rn", F.row_number().over(local))
        .filter(F.col("_rn") <= top_k)
        .withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= top_k)
        .drop("_s", "_rn")
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase matching over the BM25 tokenizer's word stream:
    docs where ``phrase``'s words appear CONSECUTIVELY, with match
    count and the first match's 1-based word position — the
    positional-index query a lexical search stack runs after boolean
    retrieval ("table hash" must not match "table ... hash").

    Scale shape: one scan tokenizes; a posexplode Generate
    materializes the words array per row so the consecutive-window
    slice references a column ATTRIBUTE (the decontaminate pattern —
    a slice over a lambda-captured derived array would re-run the
    regex per element, the 23x shingle anti-finding); the first-word
    equality filter drops every non-candidate position IN the scan
    stage, so only actual first-word occurrences reach the slice
    compare and the one combinable groupBy(doc).  Docs with no match
    are absent (search semantics).

    Returns (id, n_matches, first_pos), deterministic and
    engine-portable (integer positions, no floats anywhere).
    """
    import re as _re

    pw = _re.findall("[a-z0-9]+", phrase.lower())
    if not pw:
        raise ValueError("phrase_search: phrase has no alphanumeric word")
    lit_arr = F.array(*[F.lit(w) for w in pw])
    n = len(pw)
    toks = docs.select(
        F.col(id_col),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
        ).alias("_ws"),
    )
    pos = toks.select(
        id_col, "_ws", F.posexplode("_ws").alias("_p", "_w")
    ).where(F.col("_w") == F.lit(pw[0]))
    hits = pos.where(
        F.slice("_ws", F.col("_p") + 1, n) == lit_arr
    )
    return (
        hits.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            (F.min("_p") + 1).cast("bigint").alias("first_pos"),
        )
    )
