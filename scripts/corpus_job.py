"""spark-submit entry point for the training-corpus hygiene pipeline.

Cluster usage (same packaging as the rollup entry):

    zip -r grass_spark.zip grass_spark
    spark-submit --py-files grass_spark.zip scripts/corpus_job.py \
        --input  s3://bucket/crawl/*.jsonl --input-format jsonl \
        --benchmark s3://bucket/eval.parquet \
        --output s3://bucket/clean \
        --shards 1024

Local smoke:

    python scripts/corpus_job.py --synth 2000 --output /tmp/corpus_demo

Runs :func:`grass_spark.operators.corpus.prepare_corpus` (redact ->
line rules -> quality/repetition [-> zlib gate -> perplexity strata ->
classifier] -> exact/near[/semantic] dedup [-> segment/span dedup] ->
decontaminate [-> source cap] [-> mixture/DSIR]) and writes
reproducible training shards + a JSON stats report.  The same code
runs unchanged on local[N] and a 1000-executor cluster.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="documents path (parquet or JSONL)")
    ap.add_argument("--input-format", choices=("parquet", "jsonl"),
                    default="parquet")
    ap.add_argument("--benchmark",
                    help="eval-suite parquet (doc_id, text) for "
                         "13-gram decontamination; omit to skip")
    ap.add_argument("--output", required=True, help="shard directory")
    ap.add_argument("--synth", type=int, default=0,
                    help="generate N synthetic docs instead of --input")
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--min-words", type=int, default=5)
    ap.add_argument("--line-rules", action="store_true",
                    help="enable C4/RefinedWeb line-level cleaning")
    ap.add_argument("--quality-rules", action="store_true",
                    help="enable the Gopher structural rule set")
    ap.add_argument("--near-threshold", type=float, default=0.8,
                    help="MinHash-LSH Jaccard threshold; <=0 disables")
    ap.add_argument("--segment-words", type=int, default=0,
                    help="segment-dedup chunk size; 0 disables")
    ap.add_argument("--source-cap", type=int, default=0,
                    help="max docs per source; 0 disables")
    ap.add_argument("--mixture-alpha", type=float, default=0.0,
                    help="temperature mixture (share ~ tokens^alpha); "
                         "0 disables")
    ap.add_argument("--budget-tokens", type=int, default=0,
                    help="mixture token budget (0 = half the corpus)")
    ap.add_argument("--cores", type=int, default=None,
                    help="local[N] override for the smoke path")
    args = ap.parse_args()

    from grass_spark.session import get_spark

    spark = get_spark("corpus_job", cores=args.cores)

    if args.synth:
        from pyspark.sql import functions as F

        from grass_spark.datagen import synth_documents

        # the dedup-stress generator carries no lang/source — derive
        # both deterministically for the smoke path
        docs = synth_documents(spark, n_docs=args.synth).withColumn(
            "lang",
            F.element_at(
                F.array(F.lit("en"), F.lit("de"), F.lit("es"), F.lit("fr")),
                (F.pmod(F.xxhash64("doc_id"), F.lit(4)) + 1).cast("int"),
            ),
        ).withColumn(
            "source",
            F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string")),
        )
    elif args.input_format == "jsonl":
        from grass_spark.sources.documents import read_jsonl

        docs = read_jsonl(spark, args.input)
    elif args.input:
        docs = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synth is required")
    docs = docs.select("doc_id", "lang", "source", "text")

    bench = (
        spark.read.parquet(args.benchmark) if args.benchmark else None
    )

    kwargs: dict = {"min_words": args.min_words}
    if args.line_rules:
        from grass_spark.operators.linefilter import LineRules

        # JSONL crawls are often one line per doc: gate on removal
        # share, not a 3-line sentence floor; punctuation rule off for
        # the same reason
        kwargs["line_rules"] = LineRules(
            require_terminal_punct=False, min_kept_lines=1
        )
    if args.quality_rules:
        from grass_spark.operators.quality import QualityRules

        kwargs["quality_rules"] = QualityRules()
    kwargs["near_dedup_threshold"] = (
        args.near_threshold if args.near_threshold > 0 else None
    )
    if args.segment_words:
        kwargs["segment_words"] = args.segment_words
    if args.source_cap:
        kwargs["source_cap"] = args.source_cap
    if args.mixture_alpha:
        kwargs["mixture_alpha"] = args.mixture_alpha
        if args.budget_tokens:
            kwargs["mixture_budget_tokens"] = args.budget_tokens

    from grass_spark.operators.corpus import prepare_corpus
    from grass_spark.operators.export import write_shards

    clean, stats = prepare_corpus(docs, bench, **kwargs)
    write_shards(
        clean.select("doc_id", "text"), args.output, args.shards
    )
    stats["shards"] = args.shards
    stats["output"] = args.output
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
