"""Similarity search over embedding columns (north-star surface).

Brute-force cosine top-k is the correctness baseline; the scale paths
are (a) coarse-partition ANN — search only the probe's cell, here the
precomputed `label` column stands in for an offline k-means
assignment (IVF shape: at 100 TB you broadcast centroids, assign with
a vectorized expression, and bucket-join) — and (b) random-hyperplane
LSH, whose hyperplanes derive deterministically from md5 so the
operator is oracle-checkable in DuckDB.

Numeric determinism: dot products and norms are sequential left folds
over float→double casts (aggregate ∘ zip_with).  DuckDB's list_reduce
folds in the same order, so cosine values match bit-for-bit and ranks
are stable across engines.

Data contract: every non-NULL embedding must have the declared
dimension.  The LSH plane folds index the array with 1-based
element_at up to DIM, which under ANSI mode THROWS on a shorter
vector (DuckDB would silently yield NULL — a cross-engine divergence
by construction).  Wrong-dim rows are a contract violation the ingest
gate exists to catch first: run embedding_health_report (n_bad_dim)
before building any index, exactly as its docstring prescribes.  NULL
embeddings are handled everywhere (NULL scores, never NaN and never a
kernel crash — see pandas_topk).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOT_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0.0 as double), (acc, v) -> acc + v)"
)
NORM_EXPR = (
    "sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)), "
    "cast(0.0 as double), (acc, v) -> acc + v))"
)


def with_norm(vectors: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Precompute L2 norms once — O(n·d), reused by every pair compare."""
    return vectors.withColumn("nrm", F.expr(NORM_EXPR.format(a=vec_col)))


def _cosine() -> F.Column:
    return F.expr(DOT_EXPR.format(a="q.embedding", b="c.embedding")) / (
        F.col("q.nrm") * F.col("c.nrm")
    )


def brute_force_topk(
    vectors: DataFrame,
    query_pred,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against all
    candidates, rank per query."""
    e = with_norm(vectors)
    q = e.where(query_pred).alias("q")
    c = e.alias("c")
    cond = F.col("q.vec_id") != F.col("c.vec_id")
    pairs = F.broadcast(q).join(c, cond).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        _cosine().alias("cs"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("cs", 6).alias("cos_sim"))
    )


def ivf_assigned_topk(
    vectors: DataFrame, query_pred, centroid_pred, k: int = 5
) -> DataFrame:
    """IVF with REAL centroid assignment (not a precomputed label):

    1. centroid table = the vectors matching `centroid_pred` (stand-in
       for an offline k-means codebook — at 100 TB the codebook is
       exactly such a small table, broadcast to every executor);
    2. assignment = argmax cosine over the broadcast centroids, via
       max_by over a struct (rounded cosine, then smallest centroid id
       as tie-break — deterministic cross-engine);
    3. ANN probe = equi-join on the assigned cell + exact rerank.

    Cost: |V|·|C| vectorized cosines map-side (no shuffle — centroids
    broadcast), one shuffle on vec_id to attach cells, then the pruned
    cell equi-join.  Never an n² pair compare.
    """
    e = with_norm(vectors)
    cents = F.broadcast(
        e.where(centroid_pred).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cent_emb"),
            F.col("nrm").alias("cent_nrm"),
        )
    )
    cc = F.round(
        F.expr(DOT_EXPR.format(a="embedding", b="cent_emb"))
        / (F.col("nrm") * F.col("cent_nrm")),
        6,
    )
    assign = (
        e.select("vec_id", "embedding", "nrm")
        .crossJoin(cents)
        .select("vec_id", cc.alias("cc"), "cent_id")
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "cent_id", F.struct(F.col("cc"), (-F.col("cent_id")).alias("nid"))
            ).alias("cell")
        )
    )
    # persist: the assigned table feeds BOTH sides of the probe join —
    # without it the |V|·|C| scoring subtree runs twice (at 100 TB the
    # assignment is a materialized table next to the vectors, exactly
    # like the MinHash signature table).
    ea = e.join(assign, "vec_id").persist()
    q = ea.where(query_pred).alias("q")
    c = ea.alias("c")
    pairs = F.broadcast(q).join(
        c,
        (F.col("q.cell") == F.col("c.cell"))
        & (F.col("q.vec_id") != F.col("c.vec_id")),
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        F.col("q.cell").alias("cell"),
        _cosine().alias("cs"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "query_id", "neighbor_id", "cell", "rnk",
            F.round("cs", 6).alias("cos_sim"),
        )
    )


def ivf_probe_candidates(
    vectors: DataFrame,
    query_pred,
    centroid_pred,
    nprobe: int = 1,
) -> DataFrame:
    """Scored (query_id, neighbor_id, cs) pairs from probing each
    query's `nprobe` NEAREST cells instead of only its argmax cell —
    the IVF recall lever (faiss's nprobe): a true neighbor just across
    a cell boundary is found by the second- or third-closest probe.
    Index side is unchanged (every vector lives in exactly one argmax
    cell), so the probe is still a bounded cell equi-join; only the
    tiny query side fans out ×nprobe.  A (query, neighbor) pair can't
    duplicate: the neighbor has one cell and the probe cells are
    distinct."""
    e = with_norm(vectors)
    cents = F.broadcast(
        e.where(centroid_pred).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cent_emb"),
            F.col("nrm").alias("cent_nrm"),
        )
    )
    cc = F.round(
        F.expr(DOT_EXPR.format(a="embedding", b="cent_emb"))
        / (F.col("nrm") * F.col("cent_nrm")),
        6,
    )
    scored = (
        e.select("vec_id", "embedding", "nrm")
        .crossJoin(cents)
        .select("vec_id", cc.alias("cc"), "cent_id")
    )
    assign = scored.groupBy("vec_id").agg(
        F.max_by(
            "cent_id", F.struct(F.col("cc"), (-F.col("cent_id")).alias("nid"))
        ).alias("cell")
    )
    # persist: the assigned table feeds both sides of the probe join
    # (same rationale + LRU note as ivf_assigned_topk)
    ea = e.join(assign, "vec_id").persist()
    qw = Window.partitionBy("vec_id").orderBy(F.desc("cc"), F.asc("cent_id"))
    qcells = (
        e.where(query_pred)
        .select("vec_id", "embedding", "nrm")
        .crossJoin(cents)
        .select("vec_id", cc.alias("cc"), "cent_id")
        .withColumn("rn", F.row_number().over(qw))
        .where(F.col("rn") <= nprobe)
        .select("vec_id", F.col("cent_id").alias("probe_cell"))
    )
    q = (
        ea.join(qcells, "vec_id")
        .select("vec_id", "embedding", "nrm", "probe_cell")
        .alias("q")
    )
    c = ea.alias("c")
    return (
        F.broadcast(q)
        .join(
            c,
            (F.col("q.probe_cell") == F.col("c.cell"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            _cosine().alias("cs"),
        )
    )


def ivf_multiprobe_topk(
    vectors: DataFrame,
    query_pred,
    centroid_pred,
    k: int = 5,
    nprobe: int = 3,
) -> DataFrame:
    """IVF ANN probing the top-nprobe cells per query, exact cosine
    rerank (see ivf_probe_candidates)."""
    return _rerank_topk(
        ivf_probe_candidates(vectors, query_pred, centroid_pred, nprobe), k
    )


def near_dup_pairs(
    vectors: DataFrame, min_cosine: float, limit: int | None = 500
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_id asc ordered pair).
    All-pairs at test scale; at 100 TB run it per LSH bucket
    (near_dup_pairs_lsh)."""
    e = with_norm(vectors)
    q, c = e.alias("q"), e.alias("c")
    out = (
        q.join(c, F.col("q.vec_id") < F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("vec_a"),
            F.col("c.vec_id").alias("vec_b"),
            F.round(_cosine(), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= min_cosine)
        .orderBy(F.desc("cos_sim"), "vec_a", "vec_b")
    )
    return out.limit(limit) if limit is not None else out


def near_dup_pairs_lsh(
    vectors: DataFrame, min_cosine: float, limit: int | None = 500
) -> DataFrame:
    """The 100 TB near-dup shape: candidate pairs are vectors whose LSH
    sign signatures differ by AT MOST ONE plane (Hamming ≤ 1),
    implemented as multi-probe — one self-join side explodes its bucket
    into the bucket itself plus the N_PLANES Hamming-1 neighbors, and
    the pair join stays an EQUI-join on (probe = bucket), cost
    ∝ (N_PLANES+1)·Σ bucket², never n².

    Recall is a measured trade: at sf0.01 this finds 3 of the exact
    variant's 14 pairs at cos ≥ 0.45 (single-probe found 0 — every
    true near-dup pair straddled at least one hyperplane).  Production
    raises recall with more probes or independent bucket families
    (more equi-join passes), never by widening the join."""
    e = with_lsh_bucket(with_norm(vectors))
    q = e.withColumn(
        "probe",
        F.explode(
            F.array(
                F.col("bucket"),
                *[F.expr(f"bucket ^ {1 << p}") for p in range(N_PLANES)],
            )
        ),
    ).alias("q")
    c = e.alias("c")
    out = (
        # probes are distinct values, so each (a, b) pair with
        # hamming(sig_a, sig_b) <= 1 matches exactly one probe — no
        # dedup pass needed.
        q.join(
            c,
            (F.col("q.probe") == F.col("c.bucket"))
            & (F.col("q.vec_id") < F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("vec_a"),
            F.col("c.vec_id").alias("vec_b"),
            F.round(_cosine(), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= min_cosine)
        .orderBy(F.desc("cos_sim"), "vec_a", "vec_b")
    )
    return out.limit(limit) if limit is not None else out


# --- random-hyperplane LSH -------------------------------------------------

N_PLANES = 8
DIM = 64


def _plane_component_expr(p: str, d: str) -> str:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    md5-derived 60-bit integer scaled.  Identical in DuckDB.  Used by
    the ORACLE SQL; the Spark side inlines the same values as a folded
    literal (see _plane_component / _planes_literal below)."""
    return (
        f"cast(conv(substr(md5(concat('hp_', {p}, '_', {d})), 1, 15), 16, 10) as bigint)"
        f" / cast(576460752303423488 as double) - 1.0"
    )


def _plane_component(p: int, d: int) -> float:
    """Python twin of _plane_component_expr — bit-identical doubles
    (same md5 hex prefix, same IEEE int→double cast, division, and
    subtraction), precomputed ONCE instead of per row: the in-lambda
    md5 cannot constant-fold (its argument contains the lambda
    variables), so the expression form re-hashed planes×dims times per
    vector — measured 11 s to bucket 5,000 vectors at sf0.1; the
    literal form is ~1 s."""
    import hashlib

    h = hashlib.md5(f"hp_{p}_{d}".encode()).hexdigest()[:15]
    return float(int(h, 16)) / 576460752303423488.0 - 1.0


def _planes_literal(plane_ids) -> str:
    """Nested array literal: element_at(·, p+1) is a plane (1-based),
    element_at(plane, d) its d-th component (d = 1..DIM, matching the
    1-based element_at over the embedding)."""
    rows = ", ".join(
        "array("
        + ", ".join(repr(_plane_component(p, d)) for d in range(1, DIM + 1))
        + ")"
        for p in plane_ids
    )
    return f"array({rows})"


LSH_BUCKET_EXPR = f"""aggregate(
    sequence(0, {N_PLANES - 1}),
    cast(0 as bigint),
    (acc, p) -> acc + CASE WHEN
        aggregate(sequence(1, {DIM}), cast(0.0 as double),
                  (a, d) -> a + cast(element_at(embedding, d) as double)
                              * element_at(element_at(
                                    {_planes_literal(range(N_PLANES))},
                                    p + 1), d)) > 0
        THEN shiftleft(cast(1 as bigint), p) ELSE cast(0 as bigint) END)"""


def with_lsh_bucket(vectors: DataFrame) -> DataFrame:
    """8-bit sign bucket from md5-derived hyperplanes.  At scale the
    bucket is the shuffle/join key: candidates live in the same bucket
    (multi-probe: also neighbors at Hamming distance 1)."""
    return vectors.withColumn("bucket", F.expr(LSH_BUCKET_EXPR))


def lsh_candidates(vectors: DataFrame, query_pred) -> DataFrame:
    """Scored (query_id, neighbor_id, cs) pairs sharing the query's
    single LSH bucket (each vector has exactly one bucket, so the join
    can't duplicate a pair — no DISTINCT needed)."""
    e = with_lsh_bucket(with_norm(vectors))
    q = e.where(query_pred).alias("q")
    c = e.alias("c")
    return F.broadcast(q).join(
        c,
        (F.col("q.bucket") == F.col("c.bucket"))
        & (F.col("q.vec_id") != F.col("c.vec_id")),
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        _cosine().alias("cs"),
    )


def lsh_topk(vectors: DataFrame, query_pred, k: int = 5) -> DataFrame:
    """ANN via LSH bucket equi-join then exact rerank within bucket."""
    return _rerank_topk(lsh_candidates(vectors, query_pred), k)


# --- Arrow-batched pandas-UDF path ----------------------------------------


def pandas_topk(vectors: DataFrame, query_pred, k: int = 10) -> DataFrame:
    """Brute-force cosine top-k with the dot product computed in a
    vectorized pandas UDF (numpy over Arrow batches) instead of SQL
    higher-order functions.

    This is the escape hatch for kernels built-ins can't express
    (learned metrics, quantized distances): same join/rank plan, the
    scoring column swaps to Python.  numpy accumulates in a different
    order than a sequential fold, so ranking uses the ROUNDED score
    (6 digits) to stay deterministic across engines.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        # NULL embeddings — whole-NULL vectors AND vectors with a NULL
        # ELEMENT — must yield NULL (not crash np.stack, not NaN:
        # Spark sorts NaN ABOVE every double, which would rank such a
        # row FIRST while the built-in aggregate/zip_with twin's NULL
        # sorts last).  A NULL element arrives as NaN after Arrow's
        # float64 conversion, so the mask checks both None and NaN.
        # DELIBERATE CONFLATION (ADVICE r7): a genuine NaN stored in
        # the embedding is indistinguishable from an Arrow-converted
        # NULL element at this point, so the kernel scores BOTH as
        # NULL, while the built-in fold twin would propagate a real
        # NaN (ranked first).  Real-NaN vectors are a data-contract
        # violation the ingest gate counts (embedding_health_report's
        # n_nonfinite column) — within the contract (no NaN/Inf
        # elements) both paths agree on every input, which is what
        # tests pin.
        def _clean(x) -> bool:
            if x is None:
                return False
            return not np.isnan(
                np.asarray(x, dtype="float64")
            ).any()

        av, bv = a.to_numpy(), b.to_numpy()
        ok = np.array(
            [_clean(x) and _clean(y) for x, y in zip(av, bv)],
            dtype=bool,
        )
        out = pd.array([None] * len(av), dtype="Float64")
        if ok.any():
            am = np.stack(av[ok]).astype("float64")
            bm = np.stack(bv[ok]).astype("float64")
            num = (am * bm).sum(axis=1)
            den = np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1)
            out[ok] = num / den
        return pd.Series(out, dtype="Float64")

    q = vectors.where(query_pred).alias("q")
    c = vectors.alias("c")
    pairs = F.broadcast(q).join(
        c, F.col("q.vec_id") != F.col("c.vec_id")
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        F.round(_cos(F.col("q.embedding"), F.col("c.embedding")), 6).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "cos_sim")
    )


def multiprobe_candidates(vectors: DataFrame, query_pred) -> DataFrame:
    """Scored pairs for multi-probe LSH: each query probes its own
    bucket plus the N_PLANES buckets at Hamming distance 1 (one
    hyperplane flipped).  The candidate join stays an EQUI-join on
    bucket — the query side just explodes ×(N_PLANES+1), which is the
    bounded (small) side.  Probe values are distinct, so no candidate
    pair duplicates."""
    e = with_lsh_bucket(with_norm(vectors))
    q = e.where(query_pred).withColumn(
        "probe",
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.expr(f"bucket ^ {1 << p}")
                    for p in range(N_PLANES)
                ],
            )
        ),
    ).alias("q")
    c = e.alias("c")
    return F.broadcast(q).join(
        c,
        (F.col("q.probe") == F.col("c.bucket"))
        & (F.col("q.vec_id") != F.col("c.vec_id")),
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        _cosine().alias("cs"),
    )


def lsh_multiprobe_topk(vectors: DataFrame, query_pred, k: int = 5) -> DataFrame:
    """Multi-probe LSH ANN: Hamming-1 probes recover most of the recall
    single-probe loses to near-boundary vectors; exact cosine rerank."""
    return _rerank_topk(multiprobe_candidates(vectors, query_pred), k)


# --- multi-table LSH -------------------------------------------------------

N_TABLES = 10
PLANES_PER_TABLE = 4


def _table_bucket_expr(t: int, ppt: int = PLANES_PER_TABLE) -> str:
    """Sign bucket over this table's OWN hyperplane family (global plane
    index t·ppt + p — tables are independent because the md5 keys
    differ).  Plane components inlined as a folded literal, same as
    LSH_BUCKET_EXPR (see _plane_component)."""
    lo = t * ppt
    return f"""aggregate(
    sequence(0, {ppt - 1}),
    cast(0 as bigint),
    (acc, p) -> acc + CASE WHEN
        aggregate(sequence(1, {DIM}), cast(0.0 as double),
                  (a, d) -> a + cast(element_at(embedding, d) as double)
                              * element_at(element_at(
                                    {_planes_literal(range(lo, lo + ppt))},
                                    p + 1), d)) > 0
        THEN shiftleft(cast(1 as bigint), p) ELSE cast(0 as bigint) END)"""


def with_multitable_buckets(
    vectors: DataFrame, n_tables: int = N_TABLES
) -> DataFrame:
    """One (t, bucket) row per vector per table — the standard
    recall lever LSH theory prescribes: L independent coarse tables
    beat one fine table (P(candidate found) = 1-(1-p^b)^L).  Row count
    grows ×L but each table's join stays a bounded equi-join."""
    e = with_norm(vectors)
    tb = F.explode(
        F.array(*[
            F.struct(
                F.lit(t).alias("t"),
                F.expr(_table_bucket_expr(t)).alias("bucket"),
            )
            for t in range(n_tables)
        ])
    ).alias("tb")
    return e.select("vec_id", "embedding", "nrm", tb).select(
        "vec_id", "embedding", "nrm", "tb.t", "tb.bucket"
    )


def multitable_candidates(
    vectors: DataFrame, query_pred, n_tables: int = N_TABLES
) -> DataFrame:
    """DISTINCT (query_id, neighbor_id, cs) scored pairs from the union
    of per-table bucket matches — the candidate set every multi-table
    rerank pays for (a pair found by several tables scores identically,
    so DISTINCT is exact)."""
    e = with_multitable_buckets(vectors, n_tables)
    q = e.where(query_pred).alias("q")
    c = e.alias("c")
    return (
        F.broadcast(q)
        .join(
            c,
            (F.col("q.t") == F.col("c.t"))
            & (F.col("q.bucket") == F.col("c.bucket"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            _cosine().alias("cs"),
        )
        .distinct()
    )


def multitable_multiprobe_candidates(
    vectors: DataFrame, query_pred, n_tables: int = N_TABLES
) -> DataFrame:
    """Multi-table AND multi-probe: in EACH of the L tables the query
    probes its own bucket plus the PLANES_PER_TABLE buckets at Hamming
    distance 1.  The two recall levers compose multiplicatively —
    P(miss) = prod over tables of P(all probes miss) — which is what
    pushes recall@5 past 0.9 where either lever alone plateaus.  Cost
    shape unchanged: the query side explodes ×L×(ppt+1) but stays the
    bounded broadcast side; the corpus side is still one bucket row per
    table, joined by equi-key."""
    e = with_multitable_buckets(vectors, n_tables)
    q = (
        e.where(query_pred)
        .withColumn(
            "probe",
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.expr(f"bucket ^ {1 << p}")
                        for p in range(PLANES_PER_TABLE)
                    ],
                )
            ),
        )
        .alias("q")
    )
    c = e.alias("c")
    return (
        F.broadcast(q)
        .join(
            c,
            (F.col("q.t") == F.col("c.t"))
            & (F.col("q.probe") == F.col("c.bucket"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            _cosine().alias("cs"),
        )
        .distinct()
    )


def _rerank_topk(pairs: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("cs", 6).alias("cos_sim"))
    )


def lsh_multitable_topk(
    vectors: DataFrame, query_pred, k: int = 5, n_tables: int = N_TABLES
) -> DataFrame:
    """ANN over L independent LSH tables: candidates = union of the
    query's bucket matches across tables, then exact cosine rerank."""
    return _rerank_topk(multitable_candidates(vectors, query_pred, n_tables), k)


def lsh_multitable_multiprobe_topk(
    vectors: DataFrame, query_pred, k: int = 5, n_tables: int = N_TABLES
) -> DataFrame:
    """Multi-table + Hamming-1 multiprobe ANN, exact cosine rerank —
    the highest-recall method in the LSH family (see
    multitable_multiprobe_candidates for the composition argument)."""
    return _rerank_topk(
        multitable_multiprobe_candidates(vectors, query_pred, n_tables), k
    )


def ivf_codebook_topk(
    vectors: DataFrame, query_pred, centroids: list, k: int = 5
) -> DataFrame:
    """IVF probe against an EXPLICIT codebook (e.g. one trained by
    functions/kmeans.kmeans_fit) — the production IVF shape end to end:
    offline-trained centroids, map-side argmax assignment (the codebook
    rides into the plan as a literal, zero shuffle — see
    kmeans.assign_cells), cell equi-join probe, exact cosine rerank.

    Deterministic given the codebook, so tests can compare recall of a
    trained codebook against an arbitrary one on equal footing."""
    from realtime_data_pipeline_spark.functions import kmeans

    # persist: assigned feeds both sides of the cell-probe self-join.
    # Lazy return ⇒ no eager unpersist; repeat callers rely on LRU
    # eviction (bench.py clearCache()s between timed runs).
    assigned = kmeans.assign_cells(
        kmeans.normalized_points(vectors), centroids
    ).persist()
    q = assigned.where(query_pred).alias("q")
    c = assigned.alias("c")
    pairs = F.broadcast(q).join(
        c,
        (F.col("q.cell") == F.col("c.cell"))
        & (F.col("q.vec_id") != F.col("c.vec_id")),
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        F.col("q.cell").alias("cell"),
        F.round(
            F.expr(DOT_EXPR.format(a="q.emb_n", b="c.emb_n")), 6
        ).alias("cs"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "query_id", "neighbor_id", "cell", "rnk",
            F.col("cs").alias("cos_sim"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding-quality audits over the label column (training-data ops)
# ---------------------------------------------------------------------------


def _labeled_pairs(vectors: DataFrame, query_pred) -> DataFrame:
    """Broadcast the bounded query set against all candidates, carrying
    both sides' labels.  Same scale shape as brute_force_topk: the
    corpus is scanned once, the query batch rides in the broadcast.

    NULL-label / NULL-embedding rows are dropped up front on BOTH
    sides: Spark's groupBy buckets NULL keys together while a SQL
    equi-join drops them, so leaving them in would make the vote
    rollup diverge from any relational oracle the moment a fixture
    gains such a row (the fuzzy-dedup NULL-lang lesson).  The paired
    oracles carry the same IS NOT NULL predicates."""
    e = with_norm(
        vectors.where(
            F.col("label").isNotNull() & F.col("embedding").isNotNull()
        )
    )
    q = e.where(query_pred).alias("q")
    c = e.alias("c")
    return F.broadcast(q).join(
        c, F.col("q.vec_id") != F.col("c.vec_id")
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("q.label").alias("true_label"),
        F.col("c.vec_id").alias("neighbor_id"),
        F.col("c.label").alias("n_label"),
        _cosine().alias("cs"),
    )


def knn_label_votes(vectors: DataFrame, query_pred, k: int = 5) -> DataFrame:
    """kNN label-consistency audit: for each query vector, the majority
    label among its k exact nearest neighbors vs its own label — the
    standard embedding-quality gate before trusting an embedding table
    for curation (a label whose members' neighbors mostly carry OTHER
    labels is an embedding-space smell).

    Plan: broadcast query batch → one corpus scan → per-query rank
    (k nearest) → per-(query,label) vote counts → per-query argmax.
    All post-broadcast exchanges are clustered by query_id, so Spark
    reuses one hash partitioning across the rank window, the vote
    rollup, and the winner window.  At 100 TB the exact scan is the
    audit baseline; the serving path swaps in the LSH/IVF candidate
    generators above (same rerank contract).

    Ties are deterministic in both engines: neighbors by (cs DESC,
    neighbor_id ASC), winning label by (votes DESC, label ASC)."""
    pairs = _labeled_pairs(vectors, query_pred)
    w_nn = Window.partitionBy("query_id").orderBy(
        F.desc("cs"), F.asc("neighbor_id")
    )
    nn = pairs.withColumn("rnk", F.row_number().over(w_nn)).where(
        F.col("rnk") <= k
    )
    votes = nn.groupBy("query_id", "true_label", "n_label").agg(
        F.count("*").alias("n_votes")
    )
    w_win = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("n_label")
    )
    return (
        votes.withColumn("rn", F.row_number().over(w_win))
        .where(F.col("rn") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("n_label").alias("predicted_label"),
            "n_votes",
            (F.col("n_label") == F.col("true_label"))
            .cast("int")
            .alias("consistent"),
        )
    )


def hard_negative_margins(vectors: DataFrame, query_pred) -> DataFrame:
    """Triplet-margin mining audit: per anchor, the nearest SAME-label
    vector (easiest positive), the nearest OTHER-label vector (hardest
    negative), and the margin between them.  violation=1 marks anchors
    whose hardest negative is closer than their nearest positive — the
    triplets a contrastive trainer would mine, and the rows a label
    auditor would inspect first.

    Plan: one broadcast-join pair pass, then a single groupBy(query)
    with conditional struct-max aggregates — the argmax is a map-side
    partial (max of (cs, -neighbor_id) structs), so the exchange
    carries one struct per (anchor, side), never the pair set.  No
    window, no second join.  Tie-breaks mirror (cs DESC, neighbor_id
    ASC) via lexicographic struct ordering.  Anchors whose label has
    no second member keep a NULL positive side (violation stays 0),
    matching the SQL oracle's CASE-on-NULL semantics."""
    pairs = _labeled_pairs(vectors, query_pred)
    same = F.col("n_label") == F.col("true_label")
    best = F.struct(
        F.col("cs").alias("cs"), (-F.col("neighbor_id")).alias("neg_id")
    )
    agg = pairs.groupBy("query_id", F.col("true_label").alias("label")).agg(
        F.max(F.when(same, best)).alias("pos"),
        F.max(F.when(~same, best)).alias("neg"),
    )
    cs_pos = F.col("pos.cs")
    cs_neg = F.col("neg.cs")
    return agg.select(
        "query_id",
        "label",
        (-F.col("pos.neg_id")).alias("pos_id"),
        (-F.col("neg.neg_id")).alias("neg_id"),
        F.round(cs_pos, 6).alias("cos_pos"),
        F.round(cs_neg, 6).alias("cos_neg"),
        F.round(cs_pos - cs_neg, 6).alias("margin"),
        F.when(cs_neg > cs_pos, F.lit(1)).otherwise(F.lit(0))
        .cast("int")
        .alias("violation"),
    )
