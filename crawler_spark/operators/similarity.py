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


def embed_neardup_pairs(emb: DataFrame, threshold: float = 0.3) -> DataFrame:
    """(vec_a, vec_b, cos_sim): near-duplicate detection by embedding —
    candidate pairs come from the LSH bucket equi-self-join (never
    all-pairs; per-bucket fan-out is the only quadratic term and the
    sign-bit signature keeps buckets small), then the exact cosine
    filters at `threshold`. The embedding analogue of the MinHash→
    verify chain in operators/dedup.py."""
    sig = lsh_signature(emb)
    pairs = (
        sig.select("bucket", F.col("vec_id").alias("vec_a"))
        .join(sig.select("bucket", F.col("vec_id").alias("vec_b")), "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
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


def sql_embed_neardup_pairs(threshold: float = 0.3) -> str:
    dot_ab = (
        "list_aggregate(list_transform(generate_series(1, len(va)), "
        "i -> va[i] * vb[i]), 'sum')"
    )
    na = "sqrt(list_aggregate(list_transform(generate_series(1, len(va)), i -> va[i] * va[i]), 'sum'))"
    nb = "sqrt(list_aggregate(list_transform(generate_series(1, len(vb)), i -> vb[i] * vb[i]), 'sum'))"
    return (
        f"WITH b AS ({sql_lsh_signature()}), "
        f"p AS (SELECT a.vec_id AS vec_a, c.vec_id AS vec_b FROM b a "
        f"JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id), "
        f"e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v "
        f"FROM embeddings), "
        f"s AS (SELECT vec_a, vec_b, ea.v AS va, eb.v AS vb "
        f"FROM p JOIN e ea ON ea.vec_id = vec_a JOIN e eb ON eb.vec_id = vec_b), "
        f"t AS (SELECT vec_a, vec_b, round({dot_ab} / ({na} * {nb}), 6) AS cos_sim "
        f"FROM s) "
        f"SELECT vec_a, vec_b, cos_sim FROM t WHERE cos_sim >= {threshold}"
    )
