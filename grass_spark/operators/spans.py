"""Exact-substring duplicate-SPAN detection and removal.

Document-level dedup (exact / MinHash / SimHash / SemDeDup) drops whole
documents; segment dedup (:mod:`segdedup`) drops fixed chunks.  The
remaining published recipe — Lee et al. 2021, "Deduplicating Training
Data Makes Language Models Better" (ExactSubstr) — finds the *maximal
repeated substrings* themselves: any run of ``n`` consecutive words
that occurs more than once in the corpus (in another document OR
elsewhere in the same document) is duplicated text, and overlapping /
adjacent duplicated windows coalesce into one maximal span.

The paper builds a corpus-wide suffix array on one big machine; that is
exactly the part that does not distribute.  The Spark-native
equivalent used here is the sliding-window formulation: a span of
length ``L >= n`` is repeated iff all of its ``L - n + 1`` constituent
``n``-word windows are repeated, so duplicated-window detection +
interval merge recovers the same maximal repeated spans with only
hash-partitioned aggregates.

Pipeline (one corpus scan + one census + one doc-local merge):

1. windows — index-explode: ``posexplode(sequence(0, n_words - n))``
   carries the materialized words array into each row and the ``n``
   -word slice references that attribute (the lambda-capture-safe
   pattern from :func:`segdedup.segments_by_words`); each window hashes
   to ``md5`` so the census shuffles 32-char keys, not 10-word grams.
2. census — ``groupBy(hash).agg(count, min(struct(id, pos)))`` in ONE
   combinable pass: partial aggregation absorbs a hot boilerplate gram
   (a license line in 10% of a 1e9-doc corpus is ~1e8 rows of one key)
   map-side; the same aggregate elects the corpus-wide first occurrence
   for ``protect_first`` — never a window over the bare gram key.
3. flag — windows join the ``count >= 2`` census rows back on the hash.
   The build side is ONE row per duplicated gram, so AQE's skew-join
   split handles the hot key (probe rows split across tasks, the 1-row
   build side duplicates); with few duplicated grams the join
   broadcasts outright.
4. merge — per-document interval merge of removable windows
   (``Window.partitionBy(id)``: doc-bounded, never corpus-bounded):
   window starts ``p1 < p2`` coalesce while ``p2 <= p1 + n`` (overlap
   or exact adjacency), giving maximal spans ``[start, start + n - 1]``
   ∪ …; reconstruction filters the words array with a nested HOF
   (``spans`` is a post-join attribute, so the element lambda's capture
   is a cheap attribute reference, not a re-evaluated expression).

With ``protect_first=True`` (default) the corpus-wide first occurrence
of each gram keeps its text — the all-copies-removed alternative
(``protect_first=False``) matches the paper's observation that
removing every copy slightly helps; both are exact.

``clean_text`` is rebuilt from the NORMALIZED words (casefold +
collapsed whitespace, :func:`dedup.normalize_text`) — byte equality
with the raw text is not preserved, same contract as segment dedup.

Reference analog: none in GRASS — training-data wave (SURVEY §6 axis
B), published recipe only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from grass_spark.operators.parallel import spread

from grass_spark.operators.dedup import normalize_text

__all__ = ["word_windows", "duplicate_spans"]


def word_windows(
    df: DataFrame,
    *,
    text_col: str = "text",
    n: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """All ``n``-word sliding windows of ``text_col`` as
    ``(id_col, pos, gram)`` rows, 0-based word positions.

    The words array is materialized once per row by the Generate; the
    slice references the attribute (NOT the upstream split expression),
    so nothing re-splits per window.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    d = spread(df).select(
        id_col, F.split(normalize_text(F.col(text_col)), " ").alias("_ws")
    )
    return (
        d.filter(F.size("_ws") >= n)
        .select(
            id_col,
            "_ws",
            F.posexplode(
                F.sequence(F.lit(0), F.size("_ws") - F.lit(n))
            ).alias("pos", "_start"),
        )
        .select(
            id_col,
            "pos",
            F.array_join(
                F.slice("_ws", F.col("_start") + 1, n), " "
            ).alias("gram"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    *,
    text_col: str = "text",
    n: int = 8,
    id_col: str = "doc_id",
    protect_first: bool = True,
) -> DataFrame:
    """Per-document maximal duplicated spans + cleaned text.

    Returns one row per input document with every input column plus:

    * ``n_words`` — normalized word count;
    * ``n_windows`` — sliding ``n``-word windows (0 if too short);
    * ``n_dup_windows`` — windows whose gram occurs >= 2 times
      corpus-wide (first occurrences included);
    * ``spans`` — ``array<struct<start,end>>`` of maximal merged spans
      built from *removable* windows (duplicated and, when
      ``protect_first``, not the corpus-wide first occurrence of their
      gram, ordered by ``(id, pos)``), 0-based inclusive word indexes;
    * ``n_spans`` / ``dup_words`` / ``dup_frac`` — span count, words
      covered by spans, coverage fraction of the document;
    * ``clean_text`` — normalized words outside every span, re-joined
      (the full normalized text when nothing is removable).
    """
    wins = word_windows(df, text_col=text_col, n=n, id_col=id_col)
    wins = wins.withColumn("_h", F.md5("gram")).drop("gram")

    census = (
        wins.groupBy("_h")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.min(
                F.struct(F.col(id_col).alias("i"), F.col("pos").alias("x"))
            ).alias("_first"),
        )
        .filter(F.col("_cnt") >= 2)
    )

    dup = wins.join(census, on="_h", how="inner")
    if protect_first:
        removable_pos = F.when(
            (F.col(id_col) != F.col("_first.i"))
            | (F.col("pos") != F.col("_first.x")),
            F.col("pos"),
        )
    else:
        removable_pos = F.col("pos")

    # ONE pass over the joined frame yields both the dup census and
    # the sorted removable positions (collect_list skips the protected
    # windows' NULLs); everything downstream is a single linear chain,
    # so the explode+census subtree has exactly one consumer — a second
    # consumer would re-execute it per action.  The per-doc position
    # list is bounded by document length, the same memory class as the
    # doc-local merge window below.
    per_doc = dup.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_windows"),
        F.sort_array(F.collect_list(removable_pos)).alias("_rpos"),
    )

    # interval merge, doc-local.  explode_outer keeps docs whose dup
    # windows are all protected (empty _rpos -> one NULL-pos row) so
    # n_dup_windows survives the chain; the explode preserves the
    # groupBy's hashpartitioning(id), and HashPartitioning(id)
    # satisfies the (id, _sid) grouping too, so neither the Windows
    # nor the two groupBys below add an Exchange.
    dw = Window.partitionBy(id_col).orderBy("pos")
    merged = (
        per_doc.select(
            id_col,
            "n_dup_windows",
            F.explode_outer("_rpos").alias("pos"),
        )
        .withColumn(
            "_new",
            F.when(
                F.col("pos")
                > F.coalesce(F.lag("pos").over(dw) + n, F.lit(-1)),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "_sid",
            F.when(
                F.col("pos").isNotNull(),
                F.sum("_new").over(
                    dw.rowsBetween(Window.unboundedPreceding, 0)
                ),
            ),
        )
        .groupBy(id_col, "_sid")
        .agg(
            F.first("n_dup_windows").alias("n_dup_windows"),
            F.min("pos").alias("start"),
            (F.max("pos") + F.lit(n - 1)).alias("end"),
        )
    )
    per_doc_spans = merged.groupBy(id_col).agg(
        F.first("n_dup_windows").alias("n_dup_windows"),
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("start").isNotNull(),
                    F.struct("start", "end"),
                )
            )
        ).alias("spans"),
        F.count("start").alias("n_spans"),
        F.coalesce(
            F.sum(F.col("end") - F.col("start") + 1), F.lit(0)
        ).alias("dup_words"),
    )

    base = df.withColumn(
        "_ws", F.split(normalize_text(F.col(text_col)), " ")
    ).withColumn("n_words", F.size("_ws").cast("long"))
    out = (
        base.join(per_doc_spans, on=id_col, how="left")
        .withColumn(
            "n_windows",
            F.when(
                F.col("n_words") >= n, F.col("n_words") - F.lit(n - 1)
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .withColumn(
            "n_dup_windows",
            F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("long"),
        )
        .withColumn(
            "spans",
            F.coalesce(
                F.col("spans"),
                F.array().cast("array<struct<start:int,end:int>>"),
            ),
        )
        .withColumn(
            "n_spans", F.coalesce(F.col("n_spans"), F.lit(0)).cast("long")
        )
        .withColumn(
            "dup_words",
            F.coalesce(F.col("dup_words"), F.lit(0)).cast("long"),
        )
        .withColumn(
            "dup_frac", F.col("dup_words") / F.col("n_words")
        )
        .withColumn(
            "clean_text",
            F.array_join(
                F.filter(
                    "_ws",
                    lambda w, i: ~F.exists(
                        F.col("spans"),
                        lambda s: (i >= s["start"]) & (i <= s["end"]),
                    ),
                ),
                " ",
            ),
        )
        .drop("_ws")
    )
    return out
