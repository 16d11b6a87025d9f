"""Embedding similarity search (EXT surface, BASELINE.json north star).

Three tiers, all over an ``array<float>`` embedding column:

1. ``cosine_topk`` — brute-force exact cosine top-k, fully native
   (``zip_with`` + ``aggregate``: JVM-side, no Python). The plan is
   scan → per-row score → TakeOrderedAndProject: per-partition top-k then
   driver merge of k·num_partitions rows — never a global sort. This is
   the 100 TB baseline: embarrassingly parallel, zero shuffle.
2. ``cosine_topk_exact_decimal`` — same result with decimal-exact dot
   products (order-independent), used where bit-exact reproducibility
   across engines matters (the DuckDB oracle gate).
3. ``ann_lsh_topk`` — approximate: random-hyperplane LSH bucketing
   (sign bits from deterministic per-dimension hash weights), search only
   the query's bucket ± Hamming-1 probes. The scale path when k·scan is
   too slow; recall traded for a ~bucket-fraction scan.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Native float dot product: zip_with multiply + aggregate sum
    (whole-stage codegen; no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_scores(
    df: DataFrame, query_vec: list[float], emb_col: str = "embedding"
) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    dot = _dot(F.col(emb_col), q)
    na = F.sqrt(_dot(F.col(emb_col), F.col(emb_col)))
    nq = F.sqrt(F.aggregate(q, F.lit(0.0), lambda acc, x: acc + x * x))
    return df.withColumn("cosine", dot / (na * nq))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k (deterministic: ties broken by id)."""
    return (
        cosine_scores(df, query_vec, emb_col)
        .select(id_col, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplane_weights(num_bits: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplane weights per (bit, dim) — md5-derived,
    reproducible anywhere without shipping a weight matrix."""
    import hashlib

    return [
        [
            1.0
            if hashlib.md5(f"{b}:{d}".encode()).digest()[0] & 1
            else -1.0
            for d in range(dim)
        ]
        for b in range(num_bits)
    ]


def _signature_expr(emb_col: str, weights: list[list[float]]) -> Column:
    """Hyperplane-sign signature as ONE SQL expression. The weights are
    Python constants inlined as array literals — building the same tree
    Column-by-Column costs hundreds of py4j round-trips per bit
    (measured ~5 s of driver time at 8 bits × 64 dims)."""
    bit_terms = []
    for b, w in enumerate(weights):
        arr = "array(" + ",".join(f"{x}D" for x in w) + ")"
        proj = (
            f"aggregate(zip_with({emb_col}, {arr},"
            f" (x, w) -> double(x) * w), 0D, (acc, x) -> acc + x)"
        )
        bit_terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << b} ELSE 0 END)")
    return F.expr(" + ".join(bit_terms))


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    num_bits: int = 8,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signature → search the query's
    bucket only.

    Scale: the signature is a row-local expression; candidate filtering is
    a pushed-down equality predicate on the (small-cardinality) bucket
    column — on a bucketed/partitioned-by-signature layout this prunes
    ~(1 - 2^-num_bits) of the data before any scoring."""
    dim = len(query_vec)
    weights = _hyperplane_weights(num_bits, dim)

    # the query's signature is plain Python arithmetic on the parameter
    q_sig = 0
    for b, w in enumerate(weights):
        if sum(x * y for x, y in zip(query_vec, w)) >= 0:
            q_sig += 1 << b

    with_sig = df.withColumn("_sig", _signature_expr(emb_col, weights))
    cand = with_sig.filter(F.col("_sig") == q_sig)
    return cosine_topk(cand, query_vec, k, emb_col, id_col)


class IVFIndex:
    """IVF (inverted-file) coarse quantizer — index-build-time state.

    FAISS-style separation: the quantizer is TRAINED ONCE on a bounded,
    deterministic sample (hash-ordered top-N of the corpus — per-partition
    TakeOrdered, no shuffle, unbiased because xxhash64 order is effectively
    random) with driver-side numpy Lloyd's iterations — never a distributed
    training job in the query path. The resulting centroids (≤ k·dim
    floats) are the only state; ``search`` is a pure read-path plan.

    Scale: cell assignment is ONE native argmin expression over the
    centroid table inlined as literals (codegen'd; no pyspark.ml vector
    conversion). At 100 TB the assignment runs once at ingest and ``_cell``
    becomes the table's partition column, so an ``n_probe`` search prunes
    to n_probe/num_centroids of the data via partition pruning; this class
    computes it on the fly only because the testdata is unpartitioned.
    """

    def __init__(
        self,
        centroids: list[list[float]],
        train_residual: float | None = None,
    ):
        self.centroids = centroids
        # mean squared distance of the TRAINING sample to its nearest
        # centroid at build time — the drift baseline (None for indexes
        # persisted before the v2 format; those can't drift-check)
        self.train_residual = train_residual

    @classmethod
    def build(
        cls,
        df: DataFrame,
        emb_col: str = "embedding",
        id_col: str = "vec_id",
        num_centroids: int = 16,
        max_sample: int = 10_000,
        seed: int = 42,
        max_iter: int = 20,
    ) -> "IVFIndex":
        import numpy as np

        sample = (
            df.select(F.col(id_col), F.col(emb_col).cast("array<double>").alias("_e"))
            .orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
            .limit(max_sample)
            .collect()
        )
        x = np.asarray([r["_e"] for r in sample], dtype=np.float64)
        rng = np.random.default_rng(seed)
        n = len(x)
        k = min(num_centroids, n)
        cent = x[rng.choice(n, size=k, replace=False)]
        for _ in range(max_iter):
            # (n, k) squared distances via ||x||² − 2x·c + ||c||²
            d2 = (
                (x * x).sum(1)[:, None]
                - 2.0 * x @ cent.T
                + (cent * cent).sum(1)[None, :]
            )
            assign = d2.argmin(1)
            new = cent.copy()
            for j in range(k):
                m = assign == j
                if m.any():
                    new[j] = x[m].mean(0)
            if np.allclose(new, cent):
                break
            cent = new
        d2 = (
            (x * x).sum(1)[:, None]
            - 2.0 * x @ cent.T
            + (cent * cent).sum(1)[None, :]
        )
        train_residual = float(np.maximum(d2.min(1), 0.0).mean())
        return cls([[float(v) for v in c] for c in cent], train_residual)

    def save(self, path: str) -> None:
        """Persist the quantizer (centroids + drift baseline are the
        ONLY state) — the index survives the session, like a FAISS index
        file: build once at ingest, load on the query path forever
        after."""
        import json

        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "format": "ivf-centroids-v2",
                    "centroids": self.centroids,
                    "train_residual": self.train_residual,
                },
                f,
            )
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "IVFIndex":
        import json

        with open(path) as f:
            doc = json.load(f)
        # v1 files carry no drift baseline — they load fine but can't
        # drift-check (needs_refresh raises with the upgrade hint)
        return cls(doc["centroids"], doc.get("train_residual"))

    def mean_residual(
        self,
        df: DataFrame,
        emb_col: str = "embedding",
        id_col: str = "vec_id",
        max_sample: int = 10_000,
    ) -> float:
        """Mean squared distance of a bounded, deterministic corpus
        sample to its nearest CURRENT centroid — the drift probe. Same
        hash-ordered sample discipline as :meth:`build` (per-partition
        TakeOrdered, no shuffle); the only driver traffic is ONE scalar
        row. The residual is ‖x‖² + min_c(−2x·c + ‖c‖²), all native
        exprs over materialized columns (HOF re-evaluation rule)."""
        probe = (
            df.select(
                F.col(id_col),
                F.col(emb_col).cast("array<double>").alias("_e"),
            )
            .orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
            .limit(max_sample)
            .withColumn("_ivf_dists", self.dists_expr("_e"))
            .withColumn(
                "_x2",
                F.expr("aggregate(_e, 0D, (acc, x) -> acc + x * x)"),
            )
            .withColumn(
                "_res2",
                F.greatest(
                    F.array_min("_ivf_dists") + F.col("_x2"), F.lit(0.0)
                ),
            )
        )
        row = probe.agg(F.avg("_res2").alias("r")).head()
        return float(row["r"]) if row and row["r"] is not None else 0.0

    def needs_refresh(
        self,
        df: DataFrame,
        emb_col: str = "embedding",
        id_col: str = "vec_id",
        drift_factor: float = 1.5,
        max_sample: int = 10_000,
    ) -> bool:
        """True when the corpus has drifted away from the trained
        centroids: current mean residual > ``drift_factor`` × the
        build-time baseline. A drifted coarse quantizer concentrates
        vectors in few cells and probe recall decays — the FAISS
        re-train trigger, spelled as a cheap one-scalar probe."""
        if self.train_residual is None:
            raise ValueError(
                "index has no recorded train_residual (v1 file) — "
                "rebuild once with the current build() to enable "
                "drift checks"
            )
        if self.train_residual == 0.0:
            return self.mean_residual(df, emb_col, id_col, max_sample) > 0.0
        cur = self.mean_residual(df, emb_col, id_col, max_sample)
        return cur > drift_factor * self.train_residual

    def cell_expr(self, emb_col: str, dists_col: str) -> Column:
        """Nearest-centroid id from a MATERIALIZED distance-array column
        (two-step on purpose: array_min + array_position over a real
        column, not a recomputed expression — HOF re-evaluation rule)."""
        d = F.col(dists_col)
        return (F.array_position(d, F.array_min(d)) - 1).cast("int")

    def dists_expr(self, emb_col: str) -> Column:
        """Per-centroid ``−2x·c + ‖c‖²`` (the ‖x‖² term is constant per
        row — irrelevant to argmin), one inlined native expression."""
        terms = []
        for c in self.centroids:
            arr = "array(" + ",".join(f"{v}D" for v in c) + ")"
            dot = (
                f"aggregate(zip_with({emb_col}, {arr},"
                f" (x, w) -> double(x) * w), 0D, (acc, x) -> acc + x)"
            )
            c2 = sum(v * v for v in c)
            terms.append(f"(-2D * ({dot}) + {c2}D)")
        return F.expr("array(" + ",".join(terms) + ")")

    def assign(self, df: DataFrame, emb_col: str = "embedding", cell_col: str = "_cell") -> DataFrame:
        d = df.withColumn("_ivf_dists", self.dists_expr(emb_col))
        return d.withColumn(cell_col, self.cell_expr(emb_col, "_ivf_dists")).drop(
            "_ivf_dists"
        )

    def probe_cells(self, query_vec: list[float], n_probe: int) -> list[int]:
        import math

        qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0

        def _cos(c: list[float]) -> float:
            dot = sum(a * b for a, b in zip(c, query_vec))
            cn = math.sqrt(sum(a * a for a in c)) or 1.0
            return dot / (cn * qn)

        ranked = sorted(
            range(len(self.centroids)),
            key=lambda i: (-_cos(self.centroids[i]), i),
        )
        return ranked[:n_probe]

    def search(
        self,
        df: DataFrame,
        query_vec: list[float],
        k: int = 10,
        n_probe: int = 4,
        emb_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> DataFrame:
        cells = self.probe_cells(query_vec, n_probe)
        cand = self.assign(df, emb_col).filter(F.col("_cell").isin(cells)).drop("_cell")
        return cosine_topk(cand, query_vec, k, emb_col, id_col)

    def materialize(
        self,
        df: DataFrame,
        path: str,
        emb_col: str = "embedding",
        cell_col: str = "_cell",
    ) -> None:
        """Ingest-time layout: write the corpus PARTITIONED BY the
        nearest-centroid cell. This is the production counterpart of
        ``search``'s on-the-fly assignment — the cell argmin runs once
        per row at write time, and every later probe prunes to its
        n_probe partition directories at the FileIndex level (files in
        unprobed cells are never even listed). Plan-asserted in
        tests/test_scale_plans.py."""
        (
            self.assign(df, emb_col, cell_col)
            .write.mode("overwrite")
            .partitionBy(cell_col)
            .parquet(path)
        )

    def search_materialized(
        self,
        spark: SparkSession,
        path: str,
        query_vec: list[float],
        k: int = 10,
        n_probe: int = 4,
        emb_col: str = "embedding",
        id_col: str = "vec_id",
        cell_col: str = "_cell",
    ) -> DataFrame:
        """Probe a :meth:`materialize`-d corpus: the ``isin`` filter on
        the partition column becomes a PartitionFilter on the parquet
        scan — only n_probe/num_centroids of the data is read, the
        100 TB search path."""
        cells = self.probe_cells(query_vec, n_probe)
        cand = (
            spark.read.parquet(path)
            .filter(F.col(cell_col).isin(cells))
            .drop(cell_col)
        )
        return cosine_topk(cand, query_vec, k, emb_col, id_col)


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 16,
    n_probe: int = 4,
    max_iter: int = 20,
    seed: int = 42,
    index: IVFIndex | None = None,
) -> DataFrame:
    """IVF ANN top-k. Pass a prebuilt ``IVFIndex`` to skip quantizer
    construction (the normal production shape); otherwise one is built
    from a bounded sample — see ``IVFIndex.build``."""
    if index is None:
        index = IVFIndex.build(
            df,
            emb_col=emb_col,
            id_col=id_col,
            num_centroids=num_centroids,
            seed=seed,
            max_iter=max_iter,
        )
    return index.search(df, query_vec, k=k, n_probe=n_probe, emb_col=emb_col, id_col=id_col)


def cosine_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.95,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    num_bits: int = 6,
    dim: int = 64,
    top_n: int | None = None,
    multi_probe: bool = False,
    max_bucket_size: int | None = None,
    log_dropped: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS: bucket by hyperplane
    signature, exact-cosine verify within buckets (id_a < id_b).
    O(n²/2^bits) instead of O(n²).

    Skew hardening (the 100 TB path):

    - ``multi_probe``: the probe side also joins on every Hamming-1
      neighbor of its signature, so ``num_bits`` can be raised (smaller,
      skew-resistant buckets) without the recall cliff — a near-dup pair
      whose projections disagree on ONE hyperplane is still found. Each
      unordered pair surfaces exactly once: for Hamming-0 via the shared
      signature, for Hamming-1 via the lower id's flipped probe (the
      reverse match is removed by ``id_a < id_b``), so no distinct pass
      is needed. Cost: probe side ×(bits+1) rows vs buckets ÷2^Δbits —
      net candidate reduction whenever bits rise by ≥ log2(bits+2).
    - ``max_bucket_size``: buckets larger than the cap are EXCLUDED from
      the pair join (one map-side-combinable count per signature decides;
      predicates stay pushed below the join). A clustered corpus that
      collapses into one signature otherwise makes the self-join
      quadratic in that bucket — the classic LSH scale-killer. Capped
      buckets are near-identical-content clusters; exact/MinHash dedup
      (functions.text) is the right tool for them, and ``log_dropped``
      reports how many buckets/rows were excluded (one extra count job)."""
    weights = _hyperplane_weights(num_bits, dim)
    # _norm is spelled NON-NULLABLE (r18): the cosine >= threshold
    # filter makes Catalyst infer isnotnull(norm_a)/isnotnull(norm_b)
    # and push them below the two base Projects, re-running the 64-dim
    # interpreted dot fold per row on BOTH join legs (plan-verified).
    # A NULL norm (NULL embedding or NULL element) becomes 0.0 here;
    # such a row's cosine is NULL (its dot is NULL) so it is dropped by
    # the threshold filter exactly as before — identical output pairs.
    norm = F.coalesce(
        F.sqrt(_dot(F.col(emb_col), F.col(emb_col))), F.lit(0.0)
    )
    base = df.select(
        F.col(id_col),
        F.col(emb_col),
        _signature_expr(emb_col, weights).alias("_sig"),
        norm.alias("_norm"),
    )
    if max_bucket_size is not None:
        sizes = base.groupBy("_sig").agg(F.count("*").alias("_bkt_n"))
        if log_dropped:
            import logging

            dropped = sizes.filter(F.col("_bkt_n") > max_bucket_size).agg(
                F.count("*").alias("b"), F.coalesce(F.sum("_bkt_n"), F.lit(0)).alias("r")
            ).collect()[0]
            logging.getLogger(__name__).warning(
                "cosine_pairs_lsh: dropping %d over-cap buckets (%d rows, cap=%d)",
                dropped["b"], dropped["r"], max_bucket_size,
            )
        keep = sizes.filter(F.col("_bkt_n") <= max_bucket_size).select("_sig")
        base = base.join(F.broadcast(keep), "_sig")
    if multi_probe:
        probes = F.expr(
            f"array_union(array(_sig), transform(sequence(0, {num_bits - 1}),"
            f" j -> _sig ^ shiftleft(1, j)))"
        )
        a = base.select(
            F.col(id_col).alias("id_a"),
            F.col(emb_col).alias("emb_a"),
            F.col("_norm").alias("norm_a"),
            F.explode(probes).alias("_sig"),
        )
    else:
        a = base.select(
            F.col(id_col).alias("id_a"),
            F.col(emb_col).alias("emb_a"),
            F.col("_norm").alias("norm_a"),
            "_sig",
        )
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col(emb_col).alias("emb_b"),
        "_sig",
        F.col("_norm").alias("norm_b"),
    )
    pairs = a.join(b, "_sig").filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.withColumn(
        "cosine", _dot(F.col("emb_a"), F.col("emb_b")) / (F.col("norm_a") * F.col("norm_b"))
    )
    out = scored.filter(F.col("cosine") >= threshold).select(
        "id_a", "id_b", "cosine"
    )
    if top_n is not None:
        out = out.orderBy(
            F.col("cosine").desc(), F.col("id_a").asc(), F.col("id_b").asc()
        ).limit(top_n)
    return out


class PQIndex:
    """Product quantizer — the memory-side half of a FAISS-style ANN
    stack (IVFIndex prunes WHICH vectors to score; PQ compresses HOW
    each vector is stored and scored: dim floats → m small codes, ~32×
    smaller, with asymmetric-distance scoring off a per-query lookup
    table).

    Same engine discipline as IVFIndex: trained ONCE on a bounded
    hash-ordered sample with driver-side numpy Lloyd's per subspace;
    the codebooks (m·k·dsub floats) are the only state and persist like
    an index file. Encoding and ADC scoring are NATIVE expressions —
    per-subspace distance arrays materialized as real columns (HOF
    re-evaluation rule), argmin codes, and a zip_with table lookup —
    whole-stage codegen, no Python in any row path.

    Scale: encode once at ingest (codes become the stored column — the
    raw vectors can leave hot storage); each query builds an m×k lookup
    table on the driver and scans ONLY codes: 100 TB of vectors becomes
    ~3 TB of codes, streamed through a sum-of-table-lookups projection
    and a TakeOrdered top-k. Exact re-ranking of the top candidates
    (``rerank``) reads full vectors for a bounded set only."""

    def __init__(
        self,
        codebooks: list[list[list[float]]],
        train_mse: float | None = None,
    ):
        self.codebooks = codebooks  # [m][k][dsub]
        self.m = len(codebooks)
        self.k = len(codebooks[0]) if codebooks else 0
        self.dsub = len(codebooks[0][0]) if codebooks and codebooks[0] else 0
        # mean squared reconstruction error of the TRAINING sample at
        # the final codebooks — the drift baseline (None for v1 files)
        self.train_mse = train_mse

    @classmethod
    def build(
        cls,
        df: DataFrame,
        emb_col: str = "embedding",
        id_col: str = "vec_id",
        m: int = 8,
        k: int = 16,
        max_sample: int = 10_000,
        seed: int = 42,
        max_iter: int = 25,
    ) -> "PQIndex":
        import numpy as np

        sample = (
            df.select(F.col(id_col), F.col(emb_col).cast("array<double>").alias("_e"))
            .orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
            .limit(max_sample)
            .collect()
        )
        x = np.asarray([r["_e"] for r in sample], dtype=np.float64)
        dim = x.shape[1]
        if dim % m != 0:
            raise ValueError(f"PQ: dim {dim} not divisible by m={m}")
        dsub = dim // m
        rng = np.random.default_rng(seed)
        books = []
        for j in range(m):
            xs = x[:, j * dsub : (j + 1) * dsub]
            kk = min(k, len(xs))
            cent = xs[rng.choice(len(xs), size=kk, replace=False)]
            for _ in range(max_iter):
                d2 = (
                    (xs * xs).sum(1)[:, None]
                    - 2.0 * xs @ cent.T
                    + (cent * cent).sum(1)[None, :]
                )
                assign = d2.argmin(1)
                new = cent.copy()
                for c in range(kk):
                    msk = assign == c
                    if msk.any():
                        new[c] = xs[msk].mean(0)
                if np.allclose(new, cent):
                    break
                cent = new
            books.append([[float(v) for v in c] for c in cent])
        # drift baseline: sample MSE at the final codebooks (sum of
        # per-subspace min squared distances, averaged over rows)
        mse = 0.0
        for j, book in enumerate(books):
            xs = x[:, j * dsub : (j + 1) * dsub]
            cent = np.asarray(book)
            d2 = (
                (xs * xs).sum(1)[:, None]
                - 2.0 * xs @ cent.T
                + (cent * cent).sum(1)[None, :]
            )
            mse += float(np.maximum(d2.min(1), 0.0).mean())
        return cls(books, mse)

    def save(self, path: str) -> None:
        import json

        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "format": "pq-codebooks-v2",
                    "codebooks": self.codebooks,
                    "train_mse": self.train_mse,
                },
                f,
            )
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "PQIndex":
        import json

        with open(path) as f:
            doc = json.load(f)
        return cls(doc["codebooks"], doc.get("train_mse"))

    def mean_reconstruction_error(
        self,
        df: DataFrame,
        emb_col: str = "embedding",
        id_col: str = "vec_id",
        max_sample: int = 10_000,
    ) -> float:
        """Drift probe: mean squared reconstruction error of a bounded
        deterministic corpus sample against the CURRENT codebooks —
        per subspace, ‖x_sub‖² + min_c(−2x_sub·c + ‖c‖²), summed (the
        same inlined native distance arrays the encoder uses; one
        scalar row to the driver)."""
        probe = (
            df.select(
                F.col(id_col),
                F.col(emb_col).cast("array<double>").alias("_e"),
            )
            .orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
            .limit(max_sample)
        )
        total = None
        for j in range(self.m):
            sub = f"slice(_e, {j * self.dsub + 1}, {self.dsub})"
            x2 = (
                f"aggregate({sub}, 0D, (acc, x) -> acc + x * x)"
            )
            dcol = f"_pq_r{j}"
            probe = probe.withColumn(
                dcol, F.expr(self._subspace_dist_terms(j, sub))
            ).withColumn(
                dcol,
                F.greatest(
                    F.array_min(dcol) + F.expr(x2), F.lit(0.0)
                ),
            )
            col = F.col(dcol)
            total = col if total is None else total + col
        probe = probe.withColumn("_pq_mse", total)
        row = probe.agg(F.avg("_pq_mse").alias("r")).head()
        return float(row["r"]) if row and row["r"] is not None else 0.0

    def needs_refresh(
        self,
        df: DataFrame,
        emb_col: str = "embedding",
        id_col: str = "vec_id",
        drift_factor: float = 1.5,
        max_sample: int = 10_000,
    ) -> bool:
        """True when the corpus has drifted from the trained codebooks
        (current sample MSE > drift_factor × the build-time baseline) —
        drifted codebooks quantize coarsely and ADC candidate recall
        decays; re-train with :meth:`build` (same discipline as
        IVFIndex.needs_refresh)."""
        if self.train_mse is None:
            raise ValueError(
                "index has no recorded train_mse (v1 file) — rebuild "
                "once with the current build() to enable drift checks"
            )
        cur = self.mean_reconstruction_error(df, emb_col, id_col, max_sample)
        if self.train_mse == 0.0:
            return cur > 0.0
        return cur > drift_factor * self.train_mse

    def _subspace_dist_terms(self, j: int, sub: str) -> str:
        """SQL array of ``−2·x_sub·c + ‖c‖²`` per centroid of subspace
        ``j`` over the slice expression ``sub`` — the ONE spelling of
        the inlined native distance array, shared by :meth:`encode`
        (argmin) and :meth:`mean_reconstruction_error` (min value)."""
        terms = []
        for c in self.codebooks[j]:
            arr = "array(" + ",".join(f"{v}D" for v in c) + ")"
            dot = (
                f"aggregate(zip_with({sub}, {arr},"
                f" (x, w) -> x * w), 0D, (acc, x) -> acc + x)"
            )
            c2 = sum(v * v for v in c)
            terms.append(f"(-2D * ({dot}) + {c2}D)")
        return "array(" + ",".join(terms) + ")"

    def encode(
        self, df: DataFrame, emb_col: str = "embedding", codes_col: str = "_pq"
    ) -> DataFrame:
        """Vector → m argmin codes, one materialized distance-array
        column per subspace (two-step argmin, HOF rule), all native."""
        out = df
        code_cols = []
        for j in range(self.m):
            sub = f"slice(cast({emb_col} as array<double>), {j * self.dsub + 1}, {self.dsub})"
            dcol = f"_pq_d{j}"
            out = out.withColumn(dcol, F.expr(self._subspace_dist_terms(j, sub)))
            out = out.withColumn(
                f"_pq_c{j}",
                (F.array_position(F.col(dcol), F.array_min(dcol)) - 1).cast("int"),
            ).drop(dcol)
            code_cols.append(f"_pq_c{j}")
        return out.withColumn(
            codes_col, F.array(*[F.col(c) for c in code_cols])
        ).drop(*code_cols)

    def adc_expr(self, query: list[float], codes_col: str = "_pq") -> Column:
        """Asymmetric squared distance: per-query m×k lookup table
        (driver floats) + zip_with table lookup over the codes."""
        tables = []
        for j, book in enumerate(self.codebooks):
            q = query[j * self.dsub : (j + 1) * self.dsub]
            row = []
            for c in book:
                row.append(float(sum((a - b) ** 2 for a, b in zip(q, c))))
            tables.append(row)
        tlit = (
            "array("
            + ",".join(
                "array(" + ",".join(f"{v}D" for v in row) + ")" for row in tables
            )
            + ")"
        )
        return F.expr(
            f"aggregate(zip_with({codes_col}, {tlit},"
            " (c, t) -> element_at(t, c + 1)), 0D, (acc, x) -> acc + x)"
        )

    def search(
        self,
        encoded: DataFrame,
        query: list[float],
        k: int = 10,
        codes_col: str = "_pq",
        id_col: str = "vec_id",
    ) -> DataFrame:
        """Top-k by ADC over codes only — TakeOrdered, no shuffle."""
        return (
            encoded.withColumn("_adc", self.adc_expr(query, codes_col))
            .orderBy(F.col("_adc").asc(), F.col(id_col).asc())
            .limit(k)
        )
