"""Embedding similarity kernels (north-star similarity search).

Vector math is expressed with higher-order array functions
(``zip_with`` + ``aggregate``) so it stays JVM-side — no Python in the
scoring loop.  At 100 TB the brute-force path is a broadcast of the query
vectors against a partitioned scan of the corpus (map-side score + top-k
per partition + global top-k merge: ``orderBy().limit()`` lets Catalyst
do exactly that via TakeOrderedAndProject).  The LSH path buckets vectors
by random-hyperplane sign bits so candidate generation is a hash-partition
join instead of a cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, scale: int | None = 6) -> Column:
    c = dot(a, b) / (norm(a) * norm(b))
    return F.round(c, scale) if scale is not None else c


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is expected to be small (it is broadcast); the corpus scan
    is embarrassingly parallel.  Ranking uses the rounded similarity plus
    the neighbor id as tiebreak so results are deterministic.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias(query_id_col),
        as_double_array(vec_col).alias("_qvec"),
    )
    c = corpus.select(
        F.col(id_col),
        *[f for f in corpus.columns if f not in (id_col, vec_col)],
        as_double_array(vec_col).alias("_cvec"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(query_id_col) != F.col(id_col))
        .withColumn("cosine_sim", cosine(F.col("_cvec"), F.col("_qvec")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("_cvec", "_qvec")
    )


def hyperplane_lsh_buckets(
    df: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
    bucket_col: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit string over fixed planes.

    ``planes`` is generated driver-side from a seeded RNG and inlined as
    literals, so bucketing is deterministic and fully JVM-side.  Vectors
    sharing a bucket are ANN candidates — candidate generation becomes a
    shuffle on the bucket key instead of a cross join (the 100 TB path).
    """
    v = as_double_array(vec_col)
    bits = [
        F.when(dot(v, F.array(*[F.lit(float(x)) for x in plane])) >= 0, "1").otherwise("0")
        for plane in planes
    ]
    return df.withColumn(bucket_col, F.concat(*bits))
