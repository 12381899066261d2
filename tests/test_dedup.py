

def test_dedup_report_per_group(spark):
    from grass_spark.operators.dedup import dedup_report

    decisions = spark.createDataFrame(
        [(1, 1, True), (2, 1, False), (3, 3, True),
         (4, 4, True), (5, 4, False), (6, 6, True)],
        "doc_id long, cluster_id long, keep boolean",
    )
    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "a"), (6, "b")],
        "doc_id long, source string",
    )
    out = {r["source"]: r for r in dedup_report(decisions, docs).collect()}
    a, b = out["a"], out["b"]
    assert (a["n_docs"], a["n_kept"], a["n_dropped"]) == (4, 2, 2)
    assert a["dup_rate"] == 0.5
    # cluster 4 spans sources: counts in both
    assert a["n_clusters"] == 3 and b["n_clusters"] == 2
    assert (b["n_docs"], b["n_dropped"], b["dup_rate"]) == (2, 0, 0.0)
