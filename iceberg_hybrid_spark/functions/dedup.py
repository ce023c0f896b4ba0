"""Deduplication operators (north-star dedup family).

- exact dedup: md5 fingerprint groupBy (hash-shuffle on the digest — at
  100 TB this is one shuffle keyed by a 128-bit hash, no skew).
- near-dup MinHash + LSH banding: shingle → per-seed min-hash → band
  signatures → bucket join.  Banding caps pair generation: only documents
  agreeing on an entire band ever meet in the shuffle, so the candidate
  set is linear-ish in corpus size instead of quadratic.
- SimHash: 64-bit weighted sign fingerprint; hamming-distance candidate
  filter.

All hashing uses Spark's xxhash64 (JVM, deterministic across executors
and runs) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import shingle_hashes, shingles


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical texts by md5; canonical id = min id per group."""
    return (
        df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("fingerprint"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def minhash_signature(text_col: Column | str, num_hashes: int = 32, k: int = 3) -> Column:
    """MinHash signature: for seed i, min over shingle hashes of the
    derived hash family."""
    return minhash_from_hashes(shingle_hashes(text_col, k), num_hashes)


def minhash_from_shingles(shingle_col: Column, num_hashes: int = 32) -> Column:
    """Signature from a STRING shingle array (hashes each shingle first)."""
    return minhash_from_hashes(
        F.transform(shingle_col, lambda s: F.xxhash64(s)), num_hashes
    )


def minhash_from_hashes(hash_col: Column, num_hashes: int = 32) -> Column:
    """Signature from pre-hashed shingles in ONE pass: fold over the long
    array keeping an elementwise running min of the derived hash family
    h_i = xxhash64(h, i).

    The per-seed derived hash is ``xxhash64(h, i)`` rather than the
    classical ``a·h + b`` affine family: xxhash64 evaluates JVM-side, is
    deterministic across executors/runs, and — critically — involves no
    int64 arithmetic that ANSI mode (Spark 4 default) would turn into an
    ``ARITHMETIC_OVERFLOW`` error.  The affine family's intended 64-bit
    wraparound threw under ``spark.sql.ansi.enabled=true`` (round-4
    driver regression); xxhash64 produces identical values in both modes.

    A single ``aggregate`` traversal — no per-seed re-tokenization, no
    duplicated subtrees for common-subexpression elimination to miss."""
    init = F.array_repeat(F.lit(2**63 - 1).cast("long"), num_hashes)
    return F.aggregate(
        hash_col,
        init,
        lambda acc, h: F.transform(
            acc,
            lambda a, i: F.least(a, F.xxhash64(h, i)),
        ),
    )


def minhash_band_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """(id, band, band_key) LSH banding rows — the joinable form of the
    MinHash signature.  Shared by the self-join candidate generator below
    and the incremental ingest's persisted band-state table
    (streaming/ingest.py): equality on (band, band_key) IS the candidate
    relation, whether both sides are the same batch or batch-vs-state."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col), shingle_hashes(F.col(text_col), k).alias("_sh")
    ).select(
        F.col(id_col), minhash_from_hashes(F.col("_sh"), num_hashes).alias("_sig")
    )
    return sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("_sig", b * rows_per_band + r + 1).cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs via LSH banding.

    rows-per-band = num_hashes/bands; two docs become a candidate pair iff
    some band's sub-signature matches exactly.  Returns distinct
    (id_a, id_b) with id_a < id_b.
    """
    band_rows = minhash_band_rows(df, id_col, text_col, num_hashes, bands, k)
    # Materialize the signature computation ONCE behind a shuffle on the
    # join key: otherwise both self-join sides (and their pushed-down
    # null filters) re-evaluate the full shingle+minhash fold — the
    # shuffle_hash build side becomes a ReusedExchange of the same
    # shuffle instead (same shape as near_dup_shingle_pairs and the
    # simhash band join).
    band_rows = band_rows.repartition(F.col("band"), F.col("band_key"))
    a = band_rows.alias("a")
    b = band_rows.alias("b").hint("shuffle_hash")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def simhash64(text_col: Column | str, k: int = 3) -> Column:
    """64-bit SimHash over the shingle set.

    Classic bit-voting simhash needs per-bit vote counts; expressed here
    JVM-side by summing ±1 contributions per bit via aggregate over the
    shingle hashes.  Returns a bigint fingerprint.
    """
    hashes = shingle_hashes(text_col, k)
    # ONE traversal: fold the shingle hashes into a 64-slot vote array
    # (slot i += ±1 by bit i of h), then collapse votes to the sign bits.
    # The previous form ran 64 separate aggregate passes — 64× the work.
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.transform(
            acc,
            # call_function: the plain wrappers only take int shift amounts
            lambda a, i: a
            + F.when(
                F.call_function("shiftrightunsigned", h, i).bitwiseAND(F.lit(1))
                == 1,
                1,
            ).otherwise(-1),
        ),
    )
    # bit i of the fingerprint = (votes[i] > 0); shiftleft(1, 63) wraps to
    # Long.MIN_VALUE — exactly the two's-complement encoding of bit 63,
    # and each bit appears once so the sum IS the bitwise OR.
    bits = F.zip_with(
        votes,
        F.sequence(F.lit(0), F.lit(63)),
        lambda v, i: F.when(
            v > 0, F.call_function("shiftleft", F.lit(1).cast("bigint"), i)
        ).otherwise(F.lit(0).cast("bigint")),
    )
    return F.aggregate(bits, F.lit(0).cast("bigint"), lambda acc, b: acc + b)


# Salt distinguishing the second 64-bit vote fold's hash stream from the
# first (h2 = xxhash64(h, SALT) — an independent member of the same
# family, evaluated JVM-side like everything here).
_SIMHASH128_SALT = 0x5851F42D


def simhash128(text_col: Column | str, k: int = 3) -> Column:
    """128-bit SimHash over the shingle set: struct<lo: bigint, hi: bigint>.

    The scale form of :func:`simhash64`.  Banding a fingerprint into
    ``b`` chunks for the pigeonhole candidate join gives each chunk
    ``width/b`` bits, and random within-band collisions grow as
    n²/2^(width/b) — measured at the 64x spotcheck (docs/SCALING.md r8),
    the 64-bit form's 4x16-bit bands saturate their 65,536-bucket space
    by ~320k documents (ratio 8-9x).  Doubling the fingerprint doubles
    the band width at the SAME band count, so hamming<=3 still needs only
    d+1=4 bands while each band keys into 2^32 buckets — collision
    density stays flat through ~10^9 documents.

    Two 64-bit vote folds over the same shingle stream (second stream =
    per-shingle rehash with a salt), computed in ONE array traversal into
    a 128-slot vote accumulator — same single-pass discipline as
    simhash64.
    """
    hashes = shingle_hashes(text_col, k)
    pairs = F.transform(
        hashes,
        lambda h: F.struct(
            h.alias("h1"),
            F.xxhash64(h, F.lit(_SIMHASH128_SALT)).alias("h2"),
        ),
    )
    votes = F.aggregate(
        pairs,
        F.array_repeat(F.lit(0), 128),
        lambda acc, p: F.transform(
            acc,
            # slot i < 64 votes on bit i of h1; slot i >= 64 on bit i-64
            # of h2 (the branch is on the loop INDEX — constant-foldable
            # per slot, no per-row branching on data).
            lambda a, i: a
            + F.when(
                F.call_function(
                    "shiftrightunsigned",
                    F.when(i < 64, p["h1"]).otherwise(p["h2"]),
                    i % 64,
                ).bitwiseAND(F.lit(1))
                == 1,
                1,
            ).otherwise(-1),
        ),
    )

    def _collapse(vslice: Column) -> Column:
        bits = F.zip_with(
            vslice,
            F.sequence(F.lit(0), F.lit(63)),
            lambda v, i: F.when(
                v > 0, F.call_function("shiftleft", F.lit(1).cast("bigint"), i)
            ).otherwise(F.lit(0).cast("bigint")),
        )
        return F.aggregate(
            bits, F.lit(0).cast("bigint"), lambda acc, b: acc + b
        )

    return F.struct(
        _collapse(F.slice(votes, 1, 64)).alias("lo"),
        _collapse(F.slice(votes, 65, 64)).alias("hi"),
    )


def simhash128_rel(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Relational (codegen) form of :func:`simhash128`: returns
    ``(id_col, fp struct<lo,hi>)`` with fingerprints bit-identical to the
    Column form.

    The Column form folds a 128-slot vote array per shingle through
    ``aggregate``/``transform`` — higher-order functions evaluate
    INTERPRETED, outside whole-stage codegen, and the doubled slot count
    made that the dominant cost at scale (29.6 s for the fold alone at
    the 64x spotcheck).  This form restates the same arithmetic as a
    plan Tungsten compiles: explode the shingle-hash array, take 128
    per-bit-position SUMs in one hash aggregate (bit i's vote margin is
    ``2*ones_i - n``), and assemble the sign bits in a projection.
    Measured 9.3 s cold / 4.8 s warm on the same corpus — and because
    the fingerprints come out of an AGGREGATION, a downstream band
    join's null-key filter can no longer be rewritten through to the
    scan as a second full fold pass (the r9 plan audit caught exactly
    that: isnotnull(fold) at the FileScan on both join sides).

    Map-side partial aggregation collapses each document's exploded rows
    before the exchange (a document's shingles are co-located — they
    come from one input row), so the shuffle carries one 129-long row
    per document, not 128 x shingles.  Requires
    ``spark.sql.codegen.maxFields`` >= 129 (set in session.py) to stay
    inside whole-stage codegen.

    ``explode_outer`` keeps documents with no shingles (< k tokens):
    their per-bit sums aggregate over zero rows to NULL, every vote
    margin comparison is then NULL -> bit 0, reproducing the Column
    form's all-zero fingerprint.
    """
    # The wide expressions are built as SQL strings parsed once in the
    # JVM: constructing ~3000 Column nodes through the Python API costs
    # one py4j round-trip per node — measured 3.1 s of driver-side build
    # PER CALL at any data size, vs milliseconds for the parser.
    # _h2 must stay NULL when _h1 is NULL (the explode_outer row of a
    # doc with no shingles): Spark's hash expressions SKIP null inputs
    # rather than propagate them, so a bare xxhash64(NULL, salt) is a
    # non-null constant and the hi half would vote on it — diverging
    # from the Column form's all-zero fingerprint for short docs.
    ex = df.select(
        id_col, F.explode_outer(shingle_hashes(text_col, k)).alias("_h1")
    ).withColumn(
        "_h2",
        F.when(
            F.col("_h1").isNotNull(),
            F.xxhash64(F.col("_h1"), F.lit(_SIMHASH128_SALT)),
        ),
    )
    ones = [
        F.expr(
            f"SUM(SHIFTRIGHTUNSIGNED({'_h1' if i < 64 else '_h2'},"
            f" {i % 64}) & 1) AS _s{i}"
        )
        for i in range(128)
    ]
    agg = ex.groupBy(id_col).agg(F.count("_h1").alias("_n"), *ones)

    def _half(base: int) -> str:
        # bit i set iff votes_i > 0 iff 2*ones_i > n.  Terms are summed
        # in bit order so the sign bit (Long.MIN_VALUE) joins last: every
        # partial sum stays representable (bits 0..62 total 2^63 - 1),
        # ANSI-safe.
        return " + ".join(
            f"(CASE WHEN _s{base + i} * 2 > _n THEN"
            f" SHIFTLEFT(CAST(1 AS BIGINT), {i})"
            " ELSE CAST(0 AS BIGINT) END)"
            for i in range(64)
        )

    return agg.select(
        id_col,
        F.expr(
            f"STRUCT({_half(0)} AS lo, {_half(64)} AS hi)"
        ).alias("fp"),
    )


def hamming128(a: Column, b: Column) -> Column:
    """Hamming distance between two simhash128 structs."""
    return F.bit_count(a["lo"].bitwiseXOR(b["lo"])) + F.bit_count(
        a["hi"].bitwiseXOR(b["hi"])
    )


def simhash128_band_structs(fp: Column, band_bits: int = 32) -> Column:
    """Pigeonhole band keys for a simhash128 struct: an array of
    struct(band, key) where each key is one ``band_bits``-wide chunk of
    the 128-bit fingerprint.  ``128/band_bits`` bands certify candidate
    completeness at hamming <= 128/band_bits - 1 (at most that many
    flipped bits can each corrupt a distinct band, leaving one intact).
    ``band_bits`` IS the scale knob: wider bands -> fewer candidates per
    bucket (collision space 2^band_bits) at a lower certified distance.
    Must divide 64 or be 64 so a chunk never straddles the lo/hi halves.
    """
    if band_bits > 64 or 64 % band_bits:
        raise ValueError(
            f"simhash128_band_structs: band_bits={band_bits} must divide 64"
        )
    per_half = 64 // band_bits
    mask = F.lit((1 << band_bits) - 1) if band_bits < 64 else None

    def _chunk(half: Column, j: int) -> Column:
        c = F.call_function(
            "shiftrightunsigned", half, F.lit(band_bits * j)
        )
        return c.bitwiseAND(mask) if mask is not None else c

    entries = []
    for i in range(2 * per_half):
        half = fp["lo"] if i < per_half else fp["hi"]
        entries.append(
            F.struct(
                F.lit(i).alias("band"),
                _chunk(half, i % per_half).alias("key"),
            )
        )
    return F.array(*entries)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    jump_after: int = 2,
) -> DataFrame:
    """Dedup clustering: connected components over near-dup pairs via
    min-label propagation, escalating to pointer jumping, run to a
    fixpoint.

    Every iteration does a one-hop propagation (min over own and
    neighbors' labels); from iteration ``jump_after`` onward it adds a
    pointer jump — replace each node's label with its label's own label
    — which doubles the effective propagation distance per round.  Real
    near-dup clusters are small and dense (diameter 1-2), so the common
    case converges within the hop-only prefix and never pays the jump's
    extra self-join; a pathological deep chain escalates and still
    converges in jump_after + O(log diameter) iterations (max_iter=20
    covers diameters beyond 2^17 — any chain a real corpus can
    produce).  If the fixpoint is still moving after ``max_iter`` rounds
    a RuntimeError is raised: silently returning truncated labels would
    split one true cluster into many and leak near-duplicates past
    dedup.  Returns (node_id, component_id) with component_id = min
    member id.

    RETURN CONTRACT (bounded checkpoint residency): the returned
    DataFrame is the final iteration's localCheckpoint, registered
    under the cross-invocation tag ``connected_components_labels`` —
    the NEXT invocation of this function in the same SparkContext
    frees its blocks (plans/residency.py).  Consume (collect/write/
    re-checkpoint) invocation N's result — including any lazy query
    plan embedding it — BEFORE invocation N+1 runs; executing it
    afterwards fails with missing-block errors.  Every in-repo
    consumer (near_dup_clusters, cluster_aware_split,
    cluster_quality_canonicals, streaming_neardup_ingest) builds and
    consumes serially, which satisfies the contract;
    tests/test_cc_residency.py pins both the bound and this
    consume-before-next-invocation behavior.

    Fault-tolerance note: the fixpoint loop truncates lineage by
    checkpointing.  When the session has a checkpoint dir
    (``sc.setCheckpointDir`` — the right call on a real cluster with
    dynamic allocation / preemption), a RELIABLE checkpoint is used and
    executor loss recomputes from storage.  Without one it falls back to
    ``localCheckpoint``, which is non-replayable: losing an executor
    mid-fixpoint fails the job (acceptable on local[n]; opt into a
    checkpoint dir at cluster scale).  Calling this function runs
    Spark jobs immediately — the per-iteration fixpoint count is an
    action, inherent to any convergence loop.
    """
    from pyspark.sql import functions as F

    def _materialize(df: DataFrame) -> DataFrame:
        if df.sparkSession.sparkContext.getCheckpointDir() is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    # Unpersist a SUPERSEDED checkpoint's blocks.  Without this every
    # fixpoint iteration of every invocation leaves its label snapshot
    # resident for the life of the SparkContext — the accumulation
    # class the r12 round bounded for the kmv and pipeline_health
    # checkpoints, and a measurable monotonic drag on long sessions
    # (the bench loops this operator's consumers).
    from ..plans.residency import free_checkpoint as _free

    edges = _materialize(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        # materialize ONCE: the edge relation is referenced in every
        # iteration's neighbor join — without this, the full upstream
        # pair pipeline (LSH candidates + Jaccard verify) re-executes
        # per iteration (measured 22 s -> 6 s on the sf0.1 near-dup
        # clusters query).  Checkpointing also truncates the lineage
        # the fixpoint loop would otherwise keep growing.
    )
    # self-edges keep isolated-in-batch nodes and their own label in play
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    changed = 1
    prev_checkpoint: DataFrame | None = None
    for it in range(max_iter):
        # (a) one hop: candidate label per node = min over its own and
        # neighbors' labels.  The node's OWN (previous) label rides the
        # same aggregate as a second agg column: each node contributes
        # exactly one `labels` row (prev = its old component) and its
        # neighbor rows carry a typed NULL, so max(prev) IS the old
        # label — the fixpoint probe below then reads new-vs-old off
        # the materialized rows alone, replacing the per-iteration
        # new⋈old join (two label-relation shuffles + a join per round)
        # with a filter over the checkpoint (guide §2.4).
        null_comp = F.when(F.lit(False), F.col("component"))
        neighbor_labels = (
            edges.join(labels, edges.dst == labels.node)
            .select(
                F.col("src").alias("node"),
                F.col("component"),
                null_comp.alias("prev"),
            )
        )
        hopped = (
            labels.select(
                "node", "component", F.col("component").alias("prev")
            )
            .union(neighbor_labels)
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.max("prev").alias("prev"),
            )
        )
        if it < jump_after:
            new_labels = hopped
        else:
            # (b) pointer jump: component := component's own component.
            # Every label value is a node id present in `hopped` (labels
            # start as node ids and min() only ever selects existing
            # ids), so the self join hits; LEFT + coalesce keeps the row
            # even if it somehow didn't.  This is the doubling step that
            # turns an O(diameter) fixpoint into O(log diameter).
            parents = hopped.select(
                F.col("node").alias("p_node"), F.col("component").alias("p_comp")
            )
            new_labels = (
                hopped.join(parents, hopped.component == parents.p_node, "left")
                .select(
                    F.col("node"),
                    F.coalesce(
                        F.col("p_comp"), F.col("component")
                    ).alias("component"),
                    F.col("prev"),
                )
            )
        # Materialize FIRST, then read the fixpoint probe off the
        # checkpointed rows: the old order ran the iteration's
        # join+union+agg subtree twice per round (once for the changed
        # count, once for the materialize) — counting against the
        # checkpoint halves the per-iteration work (guide §1.2: remove
        # redundant passes before tuning anything inside them).
        new_labels = _materialize(new_labels)
        changed = (
            new_labels.filter(F.col("component") != F.col("prev"))
            .limit(1)
            .count()
        )
        # the previous iteration's label checkpoint is superseded the
        # moment the new one is materialized — free its blocks (the
        # FINAL iteration's checkpoint is the return value and stays)
        _free(prev_checkpoint)
        prev_checkpoint = new_labels
        labels = new_labels.select("node", "component")
        if changed == 0:
            break
    # the edge checkpoint served only the loop; the returned labels are
    # a materialized RDD that no longer references it
    _free(edges)
    if changed != 0:
        # the final iteration's checkpoint has no consumer on this
        # path — free it before raising, or every failed invocation
        # leaks one label snapshot for the life of the SparkContext
        _free(prev_checkpoint)
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            "iterations — labels are still moving and would be WRONG if "
            "returned (clusters silently split, near-dups leak past "
            "dedup). With pointer jumping this needs graph diameter "
            f"> 2^{max_iter - jump_after}; raise max_iter or investigate "
            "the pair relation for pathological structure."
        )
    # the ONE surviving checkpoint (the final labels) is registry-bounded
    # across invocations: the next fixpoint run frees it, same
    # consume-then-discard contract as every other tag (plans/residency)
    from ..plans.residency import register_checkpointed

    if prev_checkpoint is not None:
        register_checkpointed(prev_checkpoint, "connected_components_labels")
    return labels.select(F.col("node"), F.col("component"))


def dedup_keep_canonical(
    df: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    broadcast_victims: bool = False,
) -> DataFrame:
    """Keep one representative per near-dup cluster (the min id) plus all
    unclustered documents — the end step of the near-dup pipeline.

    The victims side is corpus-proportional (every non-canonical clustered
    document — 20-50% of a web corpus), so it is NEVER broadcast by
    default: the left-anti join shuffles both sides on the id and AQE may
    still downgrade to broadcast at runtime when the victims side turns
    out to be tiny.  ``broadcast_victims=True`` is an explicit opt-in for
    callers that know their victims set is bounded (e.g. a single
    incremental batch).
    """
    from pyspark.sql import functions as F

    victims = components.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    if broadcast_victims:
        victims = F.broadcast(victims)
    return df.join(victims, id_col, "left_anti")


def semantic_dedup_victims(
    assigned: DataFrame,
    centers: list[list[float]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_col: str = "ivf_centroid",
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    within each KMeans cluster, any pair at cosine >= ``threshold`` is a
    semantic duplicate and the member FARTHER from its cluster centroid is
    dropped (tie → larger id), keeping the most-representative copy.

    Scale posture: executed as ONE Arrow-batched ``applyInPandas`` task
    per cluster — exactly the paper's execution shape (a cluster's
    vectors as a dense matrix, pairwise cosine = normalized Gram matrix).
    Work is Σ n_c² over clusters, never the global n²; size k so each
    cluster fits a task (the paper uses ~11k clusters at LAION scale).
    This is one of the few kernels where dense BLAS beats built-in
    column expressions by an order of magnitude, which is the documented
    bar for leaving the JVM (a pair-join with per-pair higher-order
    array folds measured ~10× slower at the same result).  Cosines are
    rounded to 6dp on both the pair and centroid legs so the keep/drop
    decision is reproducible across engines.

    Returns distinct ``(centroid_col, id_col)`` victim rows.
    """
    import numpy as np
    import pandas as pd

    centers_arr = [np.asarray([float(x) for x in c], dtype=np.float64) for c in centers]
    thr = float(threshold)

    def _cluster_victims(pdf: pd.DataFrame) -> pd.DataFrame:
        cid = int(pdf[centroid_col].iloc[0])
        # sort by id so row i<j implies id_i < id_j (the pair-order rule)
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0  # zero vectors: cosine treated as 0
        normed = mat / norms[:, None]
        center = centers_arr[cid]
        cnorm = np.linalg.norm(center)
        c2c = np.round(normed @ (center / cnorm if cnorm else center), 6)
        sims = np.round(normed @ normed.T, 6)
        iu = np.triu_indices(len(ids), 1)
        mask = sims[iu] >= thr
        ii, jj = iu[0][mask], iu[1][mask]
        # drop the member farther from the centroid; tie -> the larger id
        victims = np.unique(np.where(c2c[ii] < c2c[jj], ids[ii], ids[jj]))
        return pd.DataFrame({centroid_col: cid, id_col: victims})

    return (
        assigned.select(
            F.col(id_col),
            F.col(centroid_col),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .groupBy(centroid_col)
        .applyInPandas(_cluster_victims, f"{centroid_col} int, {id_col} long")
    )


def ngram_jaccard(a: Column, b: Column) -> Column:
    """Jaccard over two distinct-shingle arrays, rounded to 4dp
    (boundary-stable: see functions.text.ROUND_EPS).

    Two EMPTY shingle sets (documents under the shingle width) define
    Jaccard as 0.0, not 0/0: under ANSI the bare division would raise
    DIVIDE_BY_ZERO, and under non-ANSI it yields NaN — which Spark
    orders above every number, so ``j >= threshold`` would silently
    ADMIT empty-empty pairs while the SQL oracles (NULL division)
    exclude them.

    The guard is BRANCH-FREE on purpose: ``inter / greatest(union, 1)``
    equals the plain division whenever union > 0 and equals 0.0 when
    both sets are empty (inter is 0 then).  A CASE WHEN guard here cost
    3× on the pair-verify hot path — Spark's subexpression elimination
    does not extract expressions into/out of lazily-evaluated CASE
    branches, so the dominant ``array_intersect`` evaluated once for
    the condition and again inside the branch (measured 27.7 s vs
    9.5 s on the 16× shingle-pair spotcheck)."""
    from .text import round_stable

    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return round_stable(inter / F.greatest(union, F.lit(1)), 4)
