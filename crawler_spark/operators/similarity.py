"""Similarity search over the `embeddings` table (array<float> column).

Training-data-pipeline operators: brute-force cosine top-k (the exact
baseline) and a random-hyperplane LSH bucketing (the scale path — at
100 TB the bucketed variant turns the O(N·Q) scan into an equi-join
on bucket signatures).

All math is done in DOUBLE on both sides (the parquet column is
float32 — casting first makes the Spark fold and the DuckDB fold
bitwise comparable) as pure column expressions: `zip_with` for the
elementwise product, `aggregate` for the fold. Hyperplane components
are closed-form from the portable 60-bit hash so the DuckDB oracle
reproduces them exactly — no driver-side randomness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.url import hash60, sql_hash60

LSH_PLANES = 8
DIM = 64


def _dvec(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    emb: DataFrame, num_queries: int = 5, k: int = 5
) -> DataFrame:
    """Brute-force: queries = vec_id < num_queries, broadcast against
    the full table; top-k neighbours per query by (cos desc, vec_id).

    At scale: the query side is the small side — broadcast it (done
    here), never shuffle the corpus; the per-query top-k is a windowed
    rank that AQE executes as partial top-k per partition.
    """
    q = emb.filter(F.col("vec_id") < num_queries).select(
        F.col("vec_id").alias("query_id"), _dvec("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), _dvec("embedding").alias("cv"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", "cos_sim", "rk")
    )


def sql_cosine_topk(num_queries: int = 5, k: int = 5) -> str:
    dcast = "list_transform({0}, x -> x::DOUBLE)"
    dot_ab = (
        "list_aggregate(list_transform(generate_series(1, len(qv)), "
        "i -> qv[i] * cv[i]), 'sum')"
    )
    # norms via the same generate_series fold for parity of the values
    na = "sqrt(list_aggregate(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i]), 'sum'))"
    nb = "sqrt(list_aggregate(list_transform(generate_series(1, len(cv)), i -> cv[i] * cv[i]), 'sum'))"
    return (
        f"WITH q AS (SELECT vec_id AS query_id, {dcast.format('embedding')} AS qv "
        f"FROM embeddings WHERE vec_id < {num_queries}), "
        f"c AS (SELECT vec_id AS cand_id, {dcast.format('embedding')} AS cv FROM embeddings), "
        f"scored AS (SELECT query_id, cand_id, "
        f"round({dot_ab} / ({na} * {nb}), 6) AS cos_sim "
        f"FROM c CROSS JOIN q WHERE cand_id <> query_id), "
        f"ranked AS (SELECT *, row_number() OVER "
        f"(PARTITION BY query_id ORDER BY cos_sim DESC, cand_id ASC) AS rk FROM scored) "
        f"SELECT query_id, cand_id, cos_sim, rk FROM ranked WHERE rk <= {k}"
    )


# -- random-hyperplane LSH ---------------------------------------------------


def _plane_col(p: int, j):
    """hash60('plane:p:j') % 1001 - 500 as a double column."""
    return (
        F.pmod(hash60(F.concat(F.lit(f"plane:{p}:"), j.cast("string"))), F.lit(1001))
        - 500
    ).cast("double")


def lsh_signature(emb: DataFrame, planes: int = LSH_PLANES) -> DataFrame:
    """(vec_id, label, bucket int): sign-bit signature over `planes`
    seeded hyperplanes — one integer bucket per vector. The ANN scale
    path: join on bucket instead of scanning the corpus."""
    def mul_factory(p: int):
        def mul(x, j):
            return x * _plane_col(p, j)

        return mul

    v = _dvec("embedding")
    bits = []
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(v, F.sequence(F.lit(0), F.lit(DIM - 1)), mul_factory(p)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return emb.select("vec_id", "label", bucket.cast("int").alias("bucket"))


def lsh_bucket_census(emb: DataFrame) -> DataFrame:
    return (
        lsh_signature(emb)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.min("vec_id").alias("min_vec_id"))
    )


def sql_lsh_signature(planes: int = LSH_PLANES) -> str:
    def comp(p: int) -> str:
        seeded = f"'plane:{p}:' || (j - 1)"
        return f"(({sql_hash60(seeded)}) % 1001 - 500)::DOUBLE"
    bit_terms = []
    for p in range(planes):
        proj = (
            f"list_aggregate(list_transform(generate_series(1, {DIM}), "
            f"j -> embedding[j]::DOUBLE * {comp(p)}), 'sum')"
        )
        bit_terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    bucket = " + ".join(bit_terms)
    return (
        f"SELECT vec_id, label, ({bucket})::INT AS bucket FROM embeddings"
    )


def sql_lsh_bucket_census() -> str:
    return (
        f"SELECT bucket, count(*) AS n_vecs, min(vec_id) AS min_vec_id "
        f"FROM ({sql_lsh_signature()}) GROUP BY bucket"
    )


# -- embedding-cosine near-duplicates ----------------------------------------

N_BANDS = 4


def planes_for_corpus(n: int, target_bucket: int = 32, lo: int = 4, hi: int = 24) -> int:
    """Planes per band sized from the corpus count so the EXPECTED
    bucket population stays ~`target_bucket` as N grows: buckets per
    band = 2^planes, so planes = ceil(log2(N / target_bucket)).
    This is what makes the banded self-join scale: candidate work is
    O(N · target_bucket) total, never O((N/const)²) — at 10^9 vectors
    it yields 2^25 buckets/band of ~32 vectors, vs the round-2 fixed
    256-bucket signature whose buckets grew linearly with N."""
    import math

    return min(hi, max(lo, math.ceil(math.log2(max(n, 1) / target_bucket))))


def banded_signature(
    emb: DataFrame, bands: int = N_BANDS, planes_per_band: int = 4
) -> DataFrame:
    """(vec_id, band, bits): one row per band per vector — the
    sign-bit slice over that band's hyperplanes, exactly the MinHash
    banding shape (dedup.lsh_bands): a pair is a candidate if it
    matches in ANY band (recall), and each band's bucket key space
    (2^planes_per_band) grows with the corpus via planes_for_corpus
    (bounded work). One explode over per-band structs, computed in a
    single codegen'd Project."""
    v = _dvec("embedding")

    band_structs = []
    for b in range(bands):
        bits = None
        for j in range(planes_per_band):
            p = b * planes_per_band + j

            def mul_factory(pp: int):
                def mul(x, i):
                    return x * _plane_col(pp, i)

                return mul

            proj = F.aggregate(
                F.zip_with(v, F.sequence(F.lit(0), F.lit(DIM - 1)), mul_factory(p)),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            term = F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
            bits = term if bits is None else bits + term
        band_structs.append(
            F.struct(F.lit(b).alias("band"), bits.cast("int").alias("bits"))
        )
    return emb.select(
        "vec_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("vec_id", F.col("bk.band").alias("band"), F.col("bk.bits").alias("bits"))


def embed_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.3,
    bands: int = N_BANDS,
    planes_per_band: int | None = None,
) -> DataFrame:
    """(vec_a, vec_b, cos_sim): near-duplicate detection by embedding —
    candidate pairs from the banded sign-bit LSH equi-self-join on
    (band, bits), deduped across bands, then the exact cosine verify at
    `threshold`. The embedding analogue of the MinHash→verify chain in
    operators/dedup.py, with the same scaling property: bucket count
    grows with the corpus (planes_for_corpus), so the within-bucket
    self-join fan-out stays ~target_bucket² per bucket at ANY corpus
    size.

    ``planes_per_band=None`` derives the band width from a corpus
    count() — one metadata-cheap job; on a real deployment this is a
    table statistic, not a scan. Pass it explicitly to pin the plan
    (the registry pins 4 = planes_for_corpus(500) so the static DuckDB
    oracle at sf0.01 mirrors it exactly)."""
    if planes_per_band is None:
        planes_per_band = planes_for_corpus(emb.count())
    sig = banded_signature(emb, bands, planes_per_band)
    pairs = (
        sig.select("band", "bits", F.col("vec_id").alias("vec_a"))
        .join(
            sig.select("band", "bits", F.col("vec_id").alias("vec_b")),
            ["band", "bits"],
        )
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    vecs = emb.select("vec_id", _dvec("embedding").alias("v"))
    return (
        pairs.join(vecs.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va")), "vec_a")
        .join(vecs.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb")), "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def sql_banded_signature(bands: int = N_BANDS, planes_per_band: int = 4) -> str:
    def comp(p: int) -> str:
        seeded = f"'plane:{p}:' || (j - 1)"
        return f"(({sql_hash60(seeded)}) % 1001 - 500)::DOUBLE"

    selects = []
    for b in range(bands):
        bit_terms = []
        for jj in range(planes_per_band):
            p = b * planes_per_band + jj
            proj = (
                f"list_aggregate(list_transform(generate_series(1, {DIM}), "
                f"j -> embedding[j]::DOUBLE * {comp(p)}), 'sum')"
            )
            bit_terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << jj} ELSE 0 END)")
        bits = " + ".join(bit_terms)
        selects.append(
            f"SELECT vec_id, {b} AS band, ({bits})::INT AS bits FROM embeddings"
        )
    return " UNION ALL ".join(selects)


def sql_embed_neardup_pairs(
    threshold: float = 0.3, bands: int = N_BANDS, planes_per_band: int = 4
) -> str:
    dot_ab = (
        "list_aggregate(list_transform(generate_series(1, len(va)), "
        "i -> va[i] * vb[i]), 'sum')"
    )
    na = "sqrt(list_aggregate(list_transform(generate_series(1, len(va)), i -> va[i] * va[i]), 'sum'))"
    nb = "sqrt(list_aggregate(list_transform(generate_series(1, len(vb)), i -> vb[i] * vb[i]), 'sum'))"
    return (
        f"WITH b AS ({sql_banded_signature(bands, planes_per_band)}), "
        f"p AS (SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b FROM b a "
        f"JOIN b c ON a.band = c.band AND a.bits = c.bits AND a.vec_id < c.vec_id), "
        f"e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v "
        f"FROM embeddings), "
        f"s AS (SELECT vec_a, vec_b, ea.v AS va, eb.v AS vb "
        f"FROM p JOIN e ea ON ea.vec_id = vec_a JOIN e eb ON eb.vec_id = vec_b), "
        f"t AS (SELECT vec_a, vec_b, round({dot_ab} / ({na} * {nb}), 6) AS cos_sim "
        f"FROM s) "
        f"SELECT vec_a, vec_b, cos_sim FROM t WHERE cos_sim >= {threshold}"
    )


# -- IVF (inverted-file) ANN -------------------------------------------------

NLIST = 16
NPROBE = 4
# largest quantizer that stays a literal expression tree (codegen-safe
# and DuckDB-oracle-able); past it the Arrow matmul path takes over
LITERAL_NLIST_MAX = 64


def _centroid_rows(emb: DataFrame, nlist: int) -> list:
    """The coarse quantizer: `nlist` deterministic sampled centroids
    (the corpus vectors with vec_id < nlist, double-cast). This is the
    compact "model" of the index — nlist·DIM doubles, collected once
    driver-side and inlined as literals, the scalar analogue of a
    broadcast. A kmeans-trained quantizer (pyspark.ml KMeans) drops
    into the same seam via `ivf_assign(centroids=...)`; the sampled
    default is what keeps the whole operator closed-form for the
    DuckDB oracle (no driver randomness, SURVEY §7 determinism rule)."""
    rows = (
        emb.filter(F.col("vec_id") < nlist)
        .select("vec_id", _dvec("embedding").alias("cv"))
        .collect()
    )
    return sorted((int(r.vec_id), list(r.cv)) for r in rows)


def _lit_vec(vals: list) -> object:
    return F.array(*[F.lit(float(x)) for x in vals])


def _cell_scores(v, centroids: list) -> list:
    """[(cell, cos(v, centroid_cell)) ...] as column expressions —
    same left-fold double math as the DuckDB mirror."""
    return [(cell, cosine(v, _lit_vec(cv))) for cell, cv in centroids]


def _centroid_matrix(centroids: list):
    """(cells int64[L], RAW float64[L, D] matrix, fold-norms float64[L])
    from a [(cell, vector), ...] quantizer — rows sorted by cell so
    numpy argmax's first-hit tie-break reproduces the literal path's
    (cos desc, cell asc) rule. Norms are computed with the SAME
    sequential left fold as :func:`cosine` (not BLAS) so the exact
    tie-resolution path below reproduces the literal/oracle arithmetic
    bit-for-bit."""
    import numpy as np

    cents = sorted(centroids)
    cells = np.array([c for c, _ in cents], dtype=np.int64)
    M = np.array([v for _, v in cents], dtype=np.float64)
    norms = np.array([_fold_norm(row) for row in M], dtype=np.float64)
    return cells, M, norms


# |blas_estimate - fold_cos| for 64-dim unit-magnitude cosines is
# ~1e-13 (D·eps relative); any gap wider than this margin is decided
# by the fast estimate alone, anything inside it is re-scored with the
# exact fold — so the arrow path's argmax/ordering is IDENTICAL to the
# literal path and the DuckDB oracle by construction, not by luck
# (tolerance chosen 4 orders above the error bound).
FOLD_MARGIN = 1e-9


def _fold_dot(a, b) -> float:
    """Sequential left-fold dot in python floats — the exact arithmetic
    of cosine()'s F.aggregate and DuckDB's list_aggregate 'sum'."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def _fold_norm(a) -> float:
    import math

    return math.sqrt(_fold_dot(a, a))


def _fold_cos(v, vnorm: float, M_rows, cnorms) -> list[float]:
    """Exact fold cosine of one vector vs each given centroid row."""
    return [
        _fold_dot(v, M_rows[i]) / (vnorm * cnorms[i])
        for i in range(len(M_rows))
    ]


def _ivf_assign_arrow(emb: DataFrame, centroids: list) -> DataFrame:
    """Nearest-centroid assignment for LARGE nlist: the centroid matrix
    is broadcast ONCE (explicit sc.broadcast, not a per-task closure
    pickle) and each Arrow batch scores with one numpy matmul
    (B×D @ D×L) + argmax. No literal expression tree, so nlist reaches
    the N/10^4 regime of a 10^9-vector corpus (10^5 centroids · 64 dims
    ≈ 50 MB broadcast) where the literal Project stops compiling. The
    plan shape is unchanged: mapInPandas is a per-partition map — the
    corpus is still never shuffled.

    Arithmetic contract: the BLAS matmul is only an ESTIMATE used to
    prune; rows whose top-two estimated cosines sit within FOLD_MARGIN
    are re-scored with the exact sequential fold (the literal path's /
    oracle's arithmetic), so the assignment is provably identical to
    ``mode='literal'`` on any data — a near-tie between two centroids
    can no longer flip with accumulation order (ADVICE r4)."""
    import numpy as np
    from pyspark.sql import types as T

    cells, M, cnorms = _centroid_matrix(centroids)
    bc = emb.sparkSession.sparkContext.broadcast((cells, M, cnorms))
    in_cols = [f.name for f in emb.schema.fields]
    out_schema = T.StructType(
        list(emb.schema.fields) + [T.StructField("cell", T.IntegerType())]
    )

    def assign(batches):
        cells_, M_, cnorms_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            nv = np.sqrt((V * V).sum(axis=1))
            # estimated cosine: one dgemm + a rank-1 normalize
            S = (V @ M_.T) / (nv[:, None] * cnorms_[None, :])
            best = S.argmax(axis=1)
            top = S[np.arange(len(S)), best]
            # rows where a second cell is within the safety margin of
            # the top: decide those with the exact fold (rare)
            S[np.arange(len(S)), best] = -np.inf
            close = (top - S.max(axis=1)) <= FOLD_MARGIN
            S[np.arange(len(S)), best] = top
            for r in np.nonzero(close)[0]:
                cand = np.nonzero(S[r] >= top[r] - FOLD_MARGIN)[0]
                vnorm = _fold_norm(V[r])
                exact = _fold_cos(V[r], vnorm, M_[cand], cnorms_[cand])
                # max cos, ties → min cell (cand is cell-ascending)
                best[r] = cand[int(np.argmax(exact))]
            out = pdf[in_cols].copy()
            out["cell"] = cells_[best].astype("int32")
            yield out

    return emb.mapInPandas(assign, out_schema)


def _ivf_probes_arrow(
    queries: DataFrame, centroids: list, nprobe: int
) -> DataFrame:
    """(query_id, qv array<double>, cell): each query's nprobe nearest
    cells by (cos desc, cell asc) — same broadcast matmul estimate with
    the same exact-fold escalation as _ivf_assign_arrow: if the gap
    around the nprobe boundary is inside FOLD_MARGIN, the boundary
    cells are re-scored with the sequential fold, so the probe SET is
    identical to the literal path's on any data."""
    import numpy as np

    cells, M, cnorms = _centroid_matrix(centroids)
    bc = queries.sparkSession.sparkContext.broadcast((cells, M, cnorms))

    def probe(batches):
        import pandas as pd

        cells_, M_, cnorms_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            nv = np.sqrt((V * V).sum(axis=1))
            S = (V @ M_.T) / (nv[:, None] * cnorms_[None, :])
            # stable argsort on cell-ascending columns → (cos desc,
            # cell asc) tie-break on the estimate
            order = np.argsort(-S, axis=1, kind="stable")
            take = order[:, :nprobe].copy()
            if S.shape[1] > nprobe:
                srt = np.take_along_axis(S, order, axis=1)
                boundary = srt[:, nprobe - 1] - srt[:, nprobe] <= FOLD_MARGIN
                for r in np.nonzero(boundary)[0]:
                    # every cell that could be in the true top-nprobe
                    # sits within the margin of the estimated k-th score
                    cand = np.nonzero(S[r] >= srt[r, nprobe - 1] - FOLD_MARGIN)[0]
                    vnorm = _fold_norm(V[r])
                    exact = _fold_cos(V[r], vnorm, M_[cand], cnorms_[cand])
                    # (cos desc, cell asc): cand is cell-ascending and
                    # the sort is stable
                    picked = cand[
                        np.argsort(-np.array(exact), kind="stable")
                    ]
                    take[r] = picked[:nprobe]
            n = take.shape[1]
            yield pd.DataFrame(
                {
                    "query_id": pdf["vec_id"].to_numpy().repeat(n),
                    "qv": [list(r) for r in np.repeat(V, n, axis=0)],
                    "cell": cells_[take].ravel().astype("int32"),
                }
            )

    return queries.mapInPandas(
        probe, "query_id long, qv array<double>, cell int"
    )


def _resolve_mode(mode: str, centroids: list) -> str:
    if mode == "auto":
        return "literal" if len(centroids) <= LITERAL_NLIST_MAX else "arrow"
    return mode


def ivf_assign(
    emb: DataFrame,
    nlist: int = NLIST,
    centroids: list | None = None,
    mode: str = "auto",
) -> DataFrame:
    """(vec_id, label, embedding, cell): nearest-centroid assignment as
    a zero-shuffle per-row map. Two physical forms behind one argmax
    semantics (max cos, ties → min cell):

    * ``literal`` (nlist <= LITERAL_NLIST_MAX): centroids expand as
      literal array expressions inside one codegen'd Project —
      closed-form, DuckDB-oracle-able, no Python workers at all;
    * ``arrow`` (large nlist): broadcast centroid matrix + one numpy
      matmul per Arrow batch (_ivf_assign_arrow) — the 10^9-vector
      shape where nlist ≈ N/10^4 and a literal tree would neither
      compile nor plan.

    ``auto`` picks by quantizer size. Either way the corpus is never
    shuffled — the explode+groupBy alternative shuffles the corpus
    once per reindex."""
    if centroids is None:
        centroids = _centroid_rows(emb, nlist)
    if _resolve_mode(mode, centroids) == "arrow":
        return _ivf_assign_arrow(emb, centroids)
    v = _dvec("embedding")
    best = F.array_max(
        F.array(*[
            F.struct(c.alias("cos"), F.lit(-cell).alias("ncell"))
            for cell, c in _cell_scores(v, centroids)
        ])
    )
    return emb.select(
        *[f.name for f in emb.schema.fields],
        (-best["ncell"]).cast("int").alias("cell"),
    )


def ivf_cell_census(emb: DataFrame, nlist: int = NLIST) -> DataFrame:
    """(cell, n_vecs, min_vec_id): population of each inverted list —
    the skew diagnostic for the probe join (a hot cell is a hot join
    key; at scale it is the signal to re-train or split centroids)."""
    return (
        ivf_assign(emb, nlist)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.min("vec_id").alias("min_vec_id"))
    )


def ivf_topk(
    emb: DataFrame,
    num_queries: int = 5,
    k: int = 5,
    nlist: int = NLIST,
    nprobe: int = NPROBE,
    centroids: list | None = None,
    mode: str = "auto",
) -> DataFrame:
    """(query_id, cand_id, cos_sim, rk): IVF approximate top-k — the
    scale path between brute-force `cosine_topk` (exact, O(N·Q)) and
    the sign-bit LSH (constant-recall buckets). Each query probes its
    `nprobe` nearest cells and scores exactly ONLY the vectors assigned
    there (~N·nprobe/nlist of the corpus).

    Plan shape at 100 TB: corpus scan → assignment map (zero shuffle;
    literal Project for small nlist, broadcast-matmul mapInPandas past
    LITERAL_NLIST_MAX — see ivf_assign) → broadcast-join the
    (num_queries·nprobe)-row probe list (query vector rides along, so
    no second corpus join) → exact cosine → per-query top-k
    (WindowGroupLimit partial top-k per partition before the single
    ≤Q·k exchange). The corpus is read once and never shuffled. With
    nprobe == nlist the result is bit-identical to cosine_topk
    (tests/test_ivf.py), with either quantizer and either mode."""
    if centroids is None:
        centroids = _centroid_rows(emb, nlist)
    resolved = _resolve_mode(mode, centroids)
    assigned = ivf_assign(emb, nlist, centroids=centroids, mode=resolved).select(
        F.col("vec_id").alias("cand_id"), _dvec("embedding").alias("cv"), "cell"
    )

    queries = emb.filter(F.col("vec_id") < num_queries)
    if resolved == "arrow":
        probes = _ivf_probes_arrow(queries, centroids, nprobe)
    else:
        # probe list: per query, the nprobe nearest cells by (cos desc,
        # cell asc) — sort_array desc on (cos, -cell) structs, slice,
        # explode
        qv = _dvec("embedding")
        cells_sorted = F.sort_array(
            F.array(*[
                F.struct(c.alias("cos"), F.lit(-cell).alias("ncell"))
                for cell, c in _cell_scores(qv, centroids)
            ]),
            asc=False,
        )
        probes = (
            queries
            .select(
                F.col("vec_id").alias("query_id"),
                qv.alias("qv"),
                F.explode(F.slice(cells_sorted, 1, nprobe)).alias("pc"),
            )
            .select("query_id", "qv", (-F.col("pc.ncell")).cast("int").alias("cell"))
        )

    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", "cos_sim", "rk")
    )


def _sql_cos(a: str, b: str) -> str:
    dot = (
        f"list_aggregate(list_transform(generate_series(1, {DIM}), "
        f"i -> {a}[i] * {b}[i]), 'sum')"
    )
    na = (
        f"sqrt(list_aggregate(list_transform(generate_series(1, {DIM}), "
        f"i -> {a}[i] * {a}[i]), 'sum'))"
    )
    nb = (
        f"sqrt(list_aggregate(list_transform(generate_series(1, {DIM}), "
        f"i -> {b}[i] * {b}[i]), 'sum'))"
    )
    return f"{dot} / ({na} * {nb})"


def _sql_ivf_core(nlist: int) -> str:
    """Shared CTE prefix: centroids, double-cast corpus, all
    (vector, cell) cosines, and the rn=1 assignment — the exact
    row_number mirror of ivf_assign's (cos desc, cell asc) argmax."""
    return (
        f"c AS (SELECT vec_id AS cell, list_transform(embedding, x -> x::DOUBLE) AS cv "
        f"FROM embeddings WHERE vec_id < {nlist}), "
        f"e AS (SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v "
        f"FROM embeddings), "
        f"ac AS (SELECT e.vec_id, e.label, c.cell, {_sql_cos('v', 'cv')} AS cos "
        f"FROM e CROSS JOIN c), "
        f"asg AS (SELECT vec_id, label, cell, row_number() OVER "
        f"(PARTITION BY vec_id ORDER BY cos DESC, cell ASC) AS rn FROM ac)"
    )


def sql_ivf_cell_census(nlist: int = NLIST) -> str:
    return (
        f"WITH {_sql_ivf_core(nlist)} "
        f"SELECT cell, count(*) AS n_vecs, min(vec_id) AS min_vec_id "
        f"FROM asg WHERE rn = 1 GROUP BY cell"
    )


def sql_ivf_topk(
    num_queries: int = 5, k: int = 5, nlist: int = NLIST, nprobe: int = NPROBE
) -> str:
    return (
        f"WITH {_sql_ivf_core(nlist)}, "
        f"p AS (SELECT vec_id AS query_id, cell FROM asg "
        f"WHERE vec_id < {num_queries} AND rn <= {nprobe}), "
        f"a1 AS (SELECT vec_id AS cand_id, cell FROM asg WHERE rn = 1), "
        f"s AS (SELECT p.query_id, a1.cand_id FROM p JOIN a1 USING (cell) "
        f"WHERE a1.cand_id <> p.query_id), "
        f"sc AS (SELECT query_id, cand_id, "
        f"round({_sql_cos('eq.v', 'ec.v')}, 6) AS cos_sim "
        f"FROM s JOIN e eq ON eq.vec_id = s.query_id "
        f"JOIN e ec ON ec.vec_id = s.cand_id), "
        f"r AS (SELECT *, row_number() OVER (PARTITION BY query_id "
        f"ORDER BY cos_sim DESC, cand_id ASC) AS rk FROM sc) "
        f"SELECT query_id, cand_id, cos_sim, rk FROM r WHERE rk <= {k}"
    )
