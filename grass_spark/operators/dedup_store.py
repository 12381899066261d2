"""Incremental near-duplicate dedup against a persisted store.

Real ingest pipelines dedup each new crawl against the *existing*
corpus without re-running MinHash/LSH/CC over everything seen so far.
:class:`DedupStore` persists exactly the state that makes a delta batch
cheap:

* ``exact/``   — (content_hash, keep_id): every content hash ever
  accepted, with its surviving doc id;
* ``members/`` — (id, cluster_id, sig, sh_arr): one row per
  content-distinct document ever ingested (survivors AND near-dup
  losers — losers matter because a future doc can be a near-dup of a
  loser without matching the survivor directly), labeled with its
  duplicate-cluster minimum;
* ``bands/``   — (band_idx, band_hash, id): the LSH index — the only
  table a delta batch joins to find cross candidates;
* ``meta.json`` — LSH parameters + ``max_id`` (the monotone-id
  watermark the equality contract depends on).

Scale shape (100 TB corpus, per delta batch):

* the delta never shuffles for candidates: its band rows BROADCAST into
  one scan of the compact ``bands/`` table (≈ ``bands`` short rows per
  stored doc — a few hundred GB of index for a 100 TB corpus, not the
  corpus itself); a bucketed/partitioned ``bands`` layout can prune
  that scan further.
* exact-Jaccard verification joins only CANDIDATE ids against
  ``members/`` — candidate-proportional work, and the one place a
  point-lookup-friendly members layout (bucketBy(id)) pays.
* connected components run over delta-sized edges: store clusters are
  CONTRACTED to their stored label (one node per touched cluster), so
  CC cost never depends on corpus size.
* store maintenance is parquet ``append`` — no rewrite of history.

Equality contract (the oracle-gated property): with ids assigned in
ingest order (every id in batch *k* is larger than every id in batches
< *k* — enforced via ``meta.max_id``), the (id, cluster_id, keep)
labels this class emits for a delta are IDENTICAL to what a
from-scratch :func:`grass_spark.operators.dedup.near_dedup` over the
full union would emit for those same ids.  Sketch of why: exact dups
have the same edges as their representative, so excluding them from
the near path changes no component; store components are contracted to
their minimum-id label, which preserves both connectivity and the
component minimum (all stored ids < all delta ids); and cross
candidates (delta bands ⨝ stored bands) are exactly the union-run's
cross-bucket candidates.  Caveat: LSH bucket caps are applied per run,
so a bucket that crosses ``max_bucket_size`` only in the union can
differ — the driver parity query runs uncapped.

Reference analog: none in GRASS — this is the training-data wave's
manifest/resume pattern (operators/rollup.py) applied to dedup state.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grass_spark.operators.dedup import (
    _cap_buckets,
    dedup_clusters,
    minhash_signatures,
    ngram_jaccard_pairs,
    normalize_text,
    with_shingles,
)

_META = "meta.json"
_EXACT = "exact"
_MEMBERS = "members"
_BANDS = "bands"

#: parameters that must match between the store on disk and the caller
_PARAM_KEYS = (
    "id_col", "text_col", "jaccard_threshold", "n_hashes", "bands",
    "shingle_n", "portable",
)


class DedupStore:
    """Persisted exact + near-dup state; see module docstring.

    ``portable=True`` switches signatures/bands to the md5 construction
    the DuckDB oracles replay bit-for-bit (8 md5-min slots, 2-slot md5
    bands — the ``_sig_df`` shape from the driver queries); the default
    xxhash64 path is the production-speed one.  A store is bound to the
    parameters it was built with; reopening with different ones raises.
    """

    def __init__(
        self,
        path: str,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        jaccard_threshold: float = 0.8,
        n_hashes: int = 32,
        bands: int = 8,
        shingle_n: int = 3,
        portable: bool = False,
        max_bucket_size: int | None = 5000,
    ) -> None:
        if n_hashes % bands != 0:
            raise ValueError(
                f"bands must divide n_hashes ({bands} vs {n_hashes})"
            )
        self.path = path
        self.id_col = id_col
        self.text_col = text_col
        self.jaccard_threshold = jaccard_threshold
        self.n_hashes = n_hashes
        self.bands = bands
        self.shingle_n = shingle_n
        self.portable = portable
        self.max_bucket_size = max_bucket_size

    # ---------------------------------------------------------- meta

    def _p(self, name: str) -> str:
        return os.path.join(self.path, name)

    def exists(self) -> bool:
        return os.path.exists(self._p(_META))

    def _params(self) -> dict:
        return {k: getattr(self, k) for k in _PARAM_KEYS}

    def _write_meta(self, max_id, n_docs: int) -> None:
        os.makedirs(self.path, exist_ok=True)
        with open(self._p(_META), "w") as f:
            json.dump(
                {**self._params(), "max_id": max_id, "n_docs": n_docs}, f
            )

    def _read_meta(self) -> dict:
        with open(self._p(_META)) as f:
            meta = json.load(f)
        mismatched = {
            k: (meta.get(k), getattr(self, k))
            for k in _PARAM_KEYS
            if meta.get(k) != getattr(self, k)
        }
        if mismatched:
            raise ValueError(
                f"store at {self.path} was built with different "
                f"parameters: {mismatched}"
            )
        return meta

    # ------------------------------------------------- shared stages

    def _hashed(self, docs: DataFrame) -> DataFrame:
        return docs.select(
            F.col(self.id_col),
            F.md5(normalize_text(F.col(self.text_col))).alias("content_hash"),
        )

    def _sigs(self, sh: DataFrame) -> DataFrame:
        """(id, sig) for docs with a non-empty shingle set — the md5
        portable fold or the xxhash64 production fold, both 0-Exchange
        per-row expressions."""
        nz = sh.where(F.size("sh_arr") > 0)
        if not self.portable:
            return minhash_signatures(
                None, id_col=self.id_col, n_hashes=self.n_hashes,
                shingle_n=self.shingle_n, shingles=nz,
            )

        def _slot(i: int):
            # bind the slot via closure — a 2-arg transform lambda would
            # receive the ARRAY INDEX as its second argument
            suffix = F.lit(f"#{i}")
            return F.array_min(
                F.transform(F.col("sh_arr"), lambda s: F.md5(F.concat(s, suffix)))
            )

        sig = F.array(*[_slot(i) for i in range(self.n_hashes)])
        return nz.select(F.col(self.id_col), sig.alias("sig"))

    def _band_rows(self, sigs: DataFrame) -> DataFrame:
        """(id, band_idx, band_hash) LSH index rows."""
        r = self.n_hashes // self.bands
        idx = F.explode(F.sequence(F.lit(0), F.lit(self.bands - 1)))
        banded = sigs.select(self.id_col, "sig", idx.alias("band_idx"))
        chunk = F.slice("sig", (F.col("band_idx") * r + 1).cast("int"), r)
        if self.portable:
            # md5 over the concatenated slot strings — matches the
            # DuckDB oracle's md5(sig[2b+1] || sig[2b+2]) for r=2
            bh = F.md5(F.concat_ws("", chunk))
        else:
            bh = F.xxhash64(chunk.cast("string"), F.col("band_idx")).cast("string")
        return banded.select(self.id_col, "band_idx", bh.alias("band_hash"))

    def _internal_pairs(self, bands_df: DataFrame, cap_internal: bool) -> DataFrame:
        """Candidate pairs within one batch: band self-join, capped."""
        b = bands_df
        if cap_internal:
            b = _cap_buckets(b, ["band_idx", "band_hash"], self.max_bucket_size)
        lhs = b.select(F.col(self.id_col).alias("id_a"), "band_idx", "band_hash")
        rhs = b.select(F.col(self.id_col).alias("id_b"), "band_idx", "band_hash")
        return (
            lhs.join(rhs, on=["band_idx", "band_hash"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )

    def _verified(self, cands: DataFrame, sh: DataFrame) -> DataFrame:
        return ngram_jaccard_pairs(
            None, cands, id_col=self.id_col, shingle_n=self.shingle_n,
            shingles=sh,
        ).filter(F.col("jaccard") >= self.jaccard_threshold).select("id_a", "id_b")

    # ----------------------------------------------------------- build

    def build(self, docs: DataFrame) -> DataFrame:
        """Bootstrap the store from the first batch; returns the same
        (id, cluster_id, keep) labeling :func:`near_dedup` would."""
        id_col = self.id_col
        sh = (
            with_shingles(docs, self.text_col, self.shingle_n)
            .select(id_col, "sh_arr")
            .localCheckpoint(eager=False)
        )
        hashed = self._hashed(docs)
        exact = hashed.groupBy("content_hash").agg(
            F.min(id_col).alias("keep_id")
        ).localCheckpoint(eager=False)
        reps = (
            hashed.join(exact, on="content_hash")
            .filter(F.col(id_col) == F.col("keep_id"))
            .select(id_col)
        )
        sh_rep = sh.join(reps, id_col, "left_semi").localCheckpoint(eager=False)
        sigs = self._sigs(sh_rep).localCheckpoint(eager=False)
        bands_df = self._band_rows(sigs)
        verified = self._verified(
            self._internal_pairs(bands_df, cap_internal=True), sh_rep
        )
        clusters = dedup_clusters(verified)
        members = (
            reps.join(
                clusters.withColumnRenamed("id", id_col), on=id_col, how="left"
            )
            .withColumn(
                "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
            )
            .localCheckpoint(eager=False)
        )

        # the three table writes are independent actions over already-
        # checkpointed inputs — submit them concurrently so the tail of
        # one write back-fills the others (optimization guide §2.6)
        from concurrent.futures import ThreadPoolExecutor

        writes = (
            lambda: exact.write.mode("overwrite").parquet(self._p(_EXACT)),
            lambda: (
                members.join(sigs, on=id_col, how="left")
                .join(sh, on=id_col, how="left")
                .select(id_col, "cluster_id", "sig", "sh_arr")
                .write.mode("overwrite").parquet(self._p(_MEMBERS))
            ),
            lambda: bands_df.write.mode("overwrite").parquet(
                self._p(_BANDS)
            ),
        )
        with ThreadPoolExecutor(max_workers=3) as pool:
            for f in [pool.submit(w) for w in writes]:
                f.result()
        stats = docs.agg(
            F.max(id_col).alias("m"), F.count(F.lit(1)).alias("n")
        ).first()
        self._write_meta(stats["m"], stats["n"])

        # labels for every input doc: exact dups inherit their
        # representative's cluster (jaccard-1.0 edge in the batch twin)
        labeled = (
            hashed.join(exact, on="content_hash")
            .join(
                members.select(
                    F.col(id_col).alias("keep_id"),
                    F.col("cluster_id").alias("_cl"),
                ),
                on="keep_id",
            )
            .select(
                id_col,
                F.col("_cl").alias("cluster_id"),
                (F.col(id_col) == F.col("_cl")).alias("keep"),
            )
        )
        return labeled

    # ---------------------------------------------------------- ingest

    def ingest(
        self, spark: SparkSession, delta: DataFrame, *, update: bool = True
    ) -> DataFrame:
        """Dedup a delta batch against the store (and within itself).

        Returns (id, cluster_id, keep) for every delta doc — identical
        to a from-scratch :func:`near_dedup` over store ∪ delta
        restricted to the delta ids (see module docstring).  With
        ``update`` the surviving state is appended to the store.

        Raises if any delta id <= the store's ``max_id`` watermark:
        the equality contract (and stable stored cluster labels) holds
        only for monotone ingest order.
        """
        meta = self._read_meta()
        id_col = self.id_col
        stats = delta.agg(
            F.min(id_col).alias("lo"), F.max(id_col).alias("hi"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        if stats["n"] == 0:
            return delta.select(
                F.col(id_col),
                F.col(id_col).alias("cluster_id"),
                F.lit(True).alias("keep"),
            )
        if meta["max_id"] is not None and stats["lo"] <= meta["max_id"]:
            raise ValueError(
                f"delta ids must be > stored max_id {meta['max_id']} "
                f"(got min {stats['lo']}): incremental dedup requires "
                "monotone ingest ids"
            )

        sh = (
            with_shingles(delta, self.text_col, self.shingle_n)
            .select(id_col, "sh_arr")
            .localCheckpoint(eager=False)
        )
        hashed = self._hashed(delta).localCheckpoint(eager=False)

        # 1. exact vs store: the delta's hash set broadcasts into one
        # scan of the exact table
        store_exact = spark.read.parquet(self._p(_EXACT))
        hits = (
            store_exact.join(F.broadcast(hashed), on="content_hash")
            .select(id_col, F.col("keep_id").alias("_twin"))
            .localCheckpoint(eager=False)
        )
        rest = hashed.join(hits.select(id_col), id_col, "left_anti")

        # 2. exact within the delta (hashes the store has never seen)
        d_exact = rest.groupBy("content_hash").agg(
            F.min(id_col).alias("keep_id")
        ).localCheckpoint(eager=False)
        reps = (
            rest.join(d_exact, on="content_hash")
            .filter(F.col(id_col) == F.col("keep_id"))
            .select(id_col)
        )
        sh_rep = sh.join(reps, id_col, "left_semi").localCheckpoint(eager=False)
        sigs = self._sigs(sh_rep).localCheckpoint(eager=False)
        bands_delta = self._band_rows(sigs).localCheckpoint(eager=False)

        # 3. candidates: delta-internal self-join + delta bands
        # broadcast against the stored LSH index.  The cross cap bounds
        # candidate PAIRS per bucket (a hot boilerplate bucket in the
        # store × a delta doc that hits it).
        internal = self._internal_pairs(bands_delta, cap_internal=True)
        matched = spark.read.parquet(self._p(_BANDS)).join(
            F.broadcast(
                bands_delta.select(
                    F.col(id_col).alias("_did"), "band_idx", "band_hash"
                )
            ),
            on=["band_idx", "band_hash"],
        )
        if self.max_bucket_size is not None:
            matched = _cap_buckets(
                matched, ["band_idx", "band_hash"], self.max_bucket_size
            )
        cross = matched.select(
            F.col(id_col).alias("_sid"), F.col("_did")
        ).distinct()

        # 4. verify: internal exact Jaccard on delta shingles; cross
        # exact Jaccard joining ONLY candidate store ids' shingles
        members = spark.read.parquet(self._p(_MEMBERS))
        internal_ok = self._verified(internal, sh_rep)
        jacc = (
            F.size(F.array_intersect("_sh_s", "_sh_d"))
            / F.size(F.array_union("_sh_s", "_sh_d"))
        )
        cross_ok = (
            cross.join(
                members.select(
                    F.col(id_col).alias("_sid"),
                    F.col("cluster_id").alias("_slabel"),
                    F.col("sh_arr").alias("_sh_s"),
                ),
                on="_sid",
            )
            .join(
                sh.select(F.col(id_col).alias("_did"), F.col("sh_arr").alias("_sh_d")),
                on="_did",
            )
            .filter(jacc >= self.jaccard_threshold)
            # contract the store side to its stored cluster label: one
            # CC node per touched store cluster, never corpus-sized
            .select(
                F.col("_slabel").alias("id_a"), F.col("_did").alias("id_b")
            )
            .distinct()
        )
        clusters = dedup_clusters(internal_ok.unionByName(cross_ok))
        cl = clusters.withColumnRenamed("id", id_col).localCheckpoint(eager=False)

        rep_labeled = (
            reps.join(cl, on=id_col, how="left")
            .withColumn(
                "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
            )
            .localCheckpoint(eager=False)
        )

        # 5. labels for every delta doc.  Exact hits resolve their
        # twin's STORED label through this round's CC (a delta bridge
        # may have just merged the twin's cluster downward).
        hit_labeled = (
            hits.join(
                members.select(
                    F.col(id_col).alias("_twin"),
                    F.col("cluster_id").alias("_tl"),
                ),
                on="_twin",
            )
            .join(
                cl.select(
                    F.col(id_col).alias("_tl"), F.col("cluster_id").alias("_rl")
                ),
                on="_tl",
                how="left",
            )
            .select(
                id_col,
                F.coalesce(F.col("_rl"), F.col("_tl")).alias("cluster_id"),
                F.lit(False).alias("keep"),
            )
        )
        dup_labeled = (
            rest.join(d_exact, on="content_hash")
            .filter(F.col(id_col) != F.col("keep_id"))
            .join(
                rep_labeled.select(
                    F.col(id_col).alias("keep_id"),
                    F.col("cluster_id").alias("_cl"),
                ),
                on="keep_id",
            )
            .select(
                id_col,
                F.col("_cl").alias("cluster_id"),
                F.lit(False).alias("keep"),
            )
        )
        out = (
            rep_labeled.select(
                id_col, "cluster_id",
                (F.col(id_col) == F.col("cluster_id")).alias("keep"),
            )
            .unionByName(hit_labeled)
            .unionByName(dup_labeled)
        )

        if update:
            out = out.localCheckpoint()  # materialize BEFORE appends
            from concurrent.futures import ThreadPoolExecutor

            appends = (
                lambda: d_exact.write.mode("append").parquet(
                    self._p(_EXACT)
                ),
                lambda: (
                    rep_labeled.join(sigs, on=id_col, how="left")
                    .join(sh, on=id_col, how="left")
                    .select(id_col, "cluster_id", "sig", "sh_arr")
                    .write.mode("append").parquet(self._p(_MEMBERS))
                ),
                lambda: bands_delta.write.mode("append").parquet(
                    self._p(_BANDS)
                ),
            )
            with ThreadPoolExecutor(max_workers=3) as pool:
                for f in [pool.submit(w) for w in appends]:
                    f.result()
            self._write_meta(stats["hi"], meta["n_docs"] + stats["n"])
        return out
