"""Similarity search over embedding columns (array<float>).

Three tiers, all cross-join-free where possible:

  brute-force top-k   F.zip_with dot product + TakeOrderedAndProject —
                      the exact baseline; one scan, no shuffle beyond the
                      final top-k reduce.
  random-hyperplane   sign-of-dot-product bit buckets (SRP-LSH): vectors
  LSH buckets         sharing a bucket are candidates; tune n_planes for
                      recall/cost. Scale path for pairwise near-dup.
  IVF (coarse         deterministic k-means-lite: centroids seeded from
  quantizer)          evenly-spaced vectors, a few Lloyd iterations via
                      joins; queries probe the nearest n_probe cells only.
                      Scale path for query-time ANN at 100 TB (cells are
                      the partition key; a probe touches nprobe/k of data).

Embedding-cosine near-dup pairs reuse the LSH buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from cm_well_spark.plans.iterative import iter_checkpoint, iter_checkpoint_lazy


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    # a zero vector has no direction: define cos = 0 rather than letting
    # ANSI mode raise DIVIDE_BY_ZERO on norm(a)*norm(b) == 0
    d = norm(a) * norm(b)
    return F.when(d != 0, dot(a, b) / d).otherwise(F.lit(0.0))


def cosine_pren(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine(a, b) with both norms precomputed as columns. Bit-identical
    to cosine() — same IEEE ops in the same order (na*nb, the !=0 guard,
    dot/d) — but pair joins project each side's norm once per ROW before
    the join, so every candidate pair pays ONE array fold (the dot)
    instead of three (r11, guide §1.2: hard_negatives' exec is 20x|corpus|
    cosine folds; the two norm folds re-ran per pair)."""
    d = na * nb
    return F.when(d != 0, dot(a, b) / d).otherwise(F.lit(0.0))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k for one query vector. orderBy+limit plans as
    TakeOrderedAndProject (per-partition heap + final merge — no global
    sort)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scored = df.select(F.col(id_col), F.round(cosine(cast, q), 6).alias("cosine"))
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


# ---------------------------------------------------------------------------
# SRP-LSH (random hyperplanes)
# ---------------------------------------------------------------------------


def _planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — reproducible across
    engines and runs without numpy RNG state)."""
    out = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 33) / float(1 << 31)) - 1.0)  # [-1, 1)
        out.append(row)
    return out


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Bit-bucket id: bit i = sign(vec . plane_i). Column-object form —
    prefer srp_bucket_sql over a projected column name on hot paths
    (n_planes x dim F.lit py4j round trips vs one parse)."""
    from functools import reduce

    bits = []
    for i, p in enumerate(planes):
        pc = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(dot(vec, pc) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")))
    return reduce(lambda acc, pair: acc.bitwiseOR(F.shiftleft(pair[1], pair[0])), enumerate(bits), F.lit(0).cast("long"))


def _d(x: float) -> str:
    """SQL double literal that parses to exactly this IEEE double (repr
    is Python's shortest round-trip form; the D suffix accepts exponent
    notation, verified in-session)."""
    return f"{float(x)!r}D"


def _arr_sql(vec: list[float]) -> str:
    return "array(" + ",".join(_d(x) for x in vec) + ")"


def _dot_sql(a_sql: str, b_sql: str) -> str:
    """SQL text of dot() — the identical zip_with/aggregate expression,
    parsed in ONE py4j round trip instead of per-element Column calls
    (r11, guide §5 driver latency: the minhash SQL-string discipline;
    plane/centroid matrices cost n x dim F.lit round trips otherwise)."""
    return f"aggregate(zip_with({a_sql}, {b_sql}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"


def srp_bucket_sql(vec_sql: str, planes: list[list[float]]) -> str:
    """SQL text of srp_bucket over a projected column name: the same
    left-folded shiftleft/OR tree (verified: 0 bucket mismatches vs the
    Column form over the sf0.1 embeddings), one parse instead of
    ~n_planes x (dim + 4) py4j round trips."""
    expr = "CAST(0 AS BIGINT)"
    for i, p in enumerate(planes):
        bit = (
            f"CASE WHEN {_dot_sql(vec_sql, _arr_sql(p))} > 0 THEN CAST(1 AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END"
        )
        expr = f"({expr} | shiftleft({bit}, {i}))"
    return expr


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: score only vectors in the query's SRP bucket (fall back
    to exact if the bucket is smaller than k — recall guard). The guard
    probe is `limit(k).count()`, which stops scanning the pruned bucket
    as soon as k members are seen, instead of counting the whole bucket
    (VERDICT r4: the full count made one query cost a second bucket
    scan). Batched queries should use lsh_topk_batch, where the guard is
    fused into the plan entirely."""
    dim = len(query_vec)
    planes = _planes(dim, n_planes, seed)
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucketed = df.select(F.col(id_col), cast.alias("v")).withColumn(
        "bucket", F.expr(srp_bucket_sql("v", planes))
    )
    qb = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) > 0:
            qb |= 1 << i
    cand = bucketed.where(F.col("bucket") == qb)
    if cand.limit(k).count() < k:
        cand = bucketed
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(F.col(id_col), F.round(cosine(F.col("v"), q), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def lsh_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "query_id",
    q_vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Batched ANN: top-k per query row, ONE plan, no driver branching.

    Candidates come from an equi-join on the SRP bucket (each query meets
    only its bucket's vectors). The recall guard is fused: queries whose
    bucket produced fewer than k results are selected by an anti-join
    INSIDE the plan and re-scored against the full table (queries are
    broadcast — the fallback is a broadcast nested loop over the few
    guard-tripped queries only). Returns (query_id, vec_id, cosine),
    top-k per query.

    At 100 TB: corpus bucketing is one narrow projection; the join
    shuffles on bucket (64-256 keys for 6-8 planes — AQE splits skewed
    buckets); per-query top-k is a window over bucket-pruned candidates,
    never the full corpus."""
    # planes need the vector width statically. Callers that know their
    # embedding width pass `dim` and skip a serial one-row probe job per
    # CONSTRUCTION (r11, guide §5 — empty-queries then simply flow
    # through the plan to an empty result); dim=None keeps the probe and
    # its typed empty-batch early return.
    caller_dim = dim is not None
    if dim is None:
        sample = queries.select(F.size(F.col(q_vec_col)).alias("d")).first()
        if sample is None:
            return queries.sparkSession.createDataFrame(
                [], f"{q_id_col} long, {id_col} long, cosine double"
            )
        dim = int(sample["d"])
    dim_planes = _planes(dim, n_planes, seed)
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qcast = F.transform(F.col(q_vec_col), lambda x: x.cast("double"))
    if caller_dim:
        # A caller-passed dim is trusted for the plane literals, so a
        # width mismatch would otherwise DEGRADE silently: zip_with
        # null-pads, every plane dot goes null, every row lands in
        # bucket 0 and the query runs near-brute-force (ADVICE r11).
        # Fold a width assertion into the plan instead — one O(1)
        # F.size per row, fails fast with the offending width.
        def _checked(col):
            return F.when(F.size(col) == dim, col).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("lsh_topk_batch: vector width "),
                        F.size(col).cast("string"),
                        F.lit(f" != dim={dim}"),
                    )
                )
            )

        cast, qcast = _checked(cast), _checked(qcast)
    # norms project once per row; each candidate pair then pays one fold
    # (the dot inside cosine_pren), not three (r11, guide §1.2)
    corpus = (
        df.select(F.col(id_col), cast.alias("v"))
        .withColumn("bucket", F.expr(srp_bucket_sql("v", dim_planes)))
        .withColumn("__nv", norm(F.col("v")))
    )
    qs = (
        queries.select(F.col(q_id_col).alias("__qid"), qcast.alias("qv"))
        .withColumn("bucket", F.expr(srp_bucket_sql("qv", dim_planes)))
        .withColumn("__nq", norm(F.col("qv")))
    )
    from pyspark.sql import Window

    def topk(cands: DataFrame) -> DataFrame:
        w = Window.partitionBy("__qid").orderBy(F.desc("cosine"), F.asc(id_col))
        return (
            cands.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k)
            .drop("__rn")
        )

    scored = topk(
        corpus.join(F.broadcast(qs), "bucket").select(
            "__qid",
            F.col(id_col),
            F.round(
                cosine_pren(F.col("v"), F.col("qv"), F.col("__nv"), F.col("__nq")), 6
            ).alias("cosine"),
        )
    )
    # fused recall guard: queries with < k bucket results, chosen by an
    # anti-join in-plan, re-score against the whole corpus
    enough = scored.groupBy("__qid").agg(F.count("*").alias("__n")).where(F.col("__n") >= k)
    short_qs = qs.join(enough, "__qid", "left_anti")
    fallback = topk(
        corpus.crossJoin(F.broadcast(short_qs.drop("bucket"))).select(
            "__qid",
            F.col(id_col),
            F.round(
                cosine_pren(F.col("v"), F.col("qv"), F.col("__nv"), F.col("__nq")), 6
            ).alias("cosine"),
        )
    )
    kept = scored.join(enough.select("__qid"), "__qid", "left_semi")
    return (
        kept.unionByName(fallback)
        .select(F.col("__qid").alias(q_id_col), id_col, "cosine")
    )


def cosine_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= threshold).

    exact=True: full pairwise via a range-free self-join (quadratic — only
    for oracle checks at small SF). Default: SRP bucket-join candidates,
    then exact cosine verify — the scale path."""
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # norm projects once per row so each candidate pair pays one dot
    # fold, not dot + two norms (r11, guide §1.2)
    base = df.select(F.col(id_col).alias("id"), cast.alias("v")).withColumn(
        "__n", norm(F.col("v"))
    )
    if exact:
        a, b = base.alias("a"), base.alias("b")
        pairs = a.join(b, F.col("a.id") < F.col("b.id"))
    else:
        dim = df.select(F.size(vec_col).alias("d")).first()["d"]
        planes = _planes(dim, n_planes, seed)
        bucketed = base.withColumn("bucket", F.expr(srp_bucket_sql("v", planes)))
        a, b = bucketed.alias("a"), bucketed.alias("b")
        pairs = a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                cosine_pren(F.col("a.v"), F.col("b.v"), F.col("a.__n"), F.col("b.__n")), 6
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF coarse quantizer
# ---------------------------------------------------------------------------


def ivf_assign(
    df: DataFrame,
    n_cells: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Deterministic IVF: centroids seeded from the n_cells vectors with
    the smallest xxhash64(id) — a pseudo-random but reproducible sample
    that plans as TakeOrderedAndProject (per-partition heap, only n_cells
    rows ever reach the driver). Refined with `iters` Lloyd steps; each
    step recomputes centroids via posexplode + groupBy(cell, pos).avg so
    no cell is ever materialized as one row (the collect_list-of-vectors
    shape OOMs a hot cell at 100 TB). Returns (assignments, centroids);
    the only driver-side data is the n_cells centroid rows."""
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).alias("id"), cast.alias("v"))
    seeds = base.orderBy(F.xxhash64(F.col("id").cast("string")), F.col("id")).limit(n_cells).collect()
    cents = [(i, r["v"]) for i, r in enumerate(seeds)]

    def assign(cdf, cents_local):
        # one parsed SQL expression per assignment instead of n_cells x
        # dim F.lit round trips (r11, guide §5); the (cell, sim) struct
        # order + transform-to-(sim, cell) of the Column form is folded
        # directly into named_struct('sim', ..., 'cell', ...) — the same
        # struct-max comparison tree, same result
        structs = ",".join(
            f"named_struct('sim', {_dot_sql('v', _arr_sql(cv))}, 'cell', {ci})"
            for ci, cv in cents_local
        )
        best = F.expr(f"array_max(array({structs}))")
        return cdf.withColumn("cell", best["cell"])

    assigned = assign(base, cents)
    for _ in range(iters):
        # elementwise mean per cell: explode to (cell, pos, val) and let a
        # plain hash aggregate (map-side partial avg) do the work — the
        # shuffle payload is n_cells * dim partial sums, not the vectors
        rows = (
            assigned.select("cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("mean"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mean"))), lambda s: s["mean"]
                ).alias("centroid")
            )
            .collect()
        )
        cents = [(r["cell"], r["centroid"]) for r in rows]
        assigned = assign(base, cents)
    return assigned, cents


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k probing the n_probe nearest cells only. At 100 TB the
    assignments are written partitioned by cell, so a probe reads
    n_probe/n_cells of the data — partition pruning does the work."""
    assigned, cents = ivf_assign(df, n_cells, 2, vec_col, id_col)
    scored_cells = sorted(
        cents, key=lambda c: -sum(a * b for a, b in zip(query_vec, c[1]))
    )[:n_probe]
    probe = [c[0] for c in scored_cells]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = assigned.where(F.col("cell").isin(probe))
    return (
        cand.select(F.col("id").alias(id_col), F.round(cosine(F.col("v"), q), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def label_centroids(embs: DataFrame, vec_col: str = "embedding", label_col: str = "label") -> DataFrame:
    """Per-label centroid of an embedding column as LONG rows (label, pos,
    centroid component). posexplode + groupBy(label, pos).avg is the
    scale-safe vector aggregation: no collect_list of whole vectors into a
    single row (a 1M-member cell would OOM an executor), partial aggregation
    map-side, one shuffle keyed (label, pos). Re-assemble with
    array_agg-sorted-by-pos only where a consumer genuinely needs the
    dense form."""
    return (
        embs.select(label_col, F.posexplode(vec_col).alias("pos", "val"))
        .groupBy(label_col, "pos")
        .agg(F.avg("val").alias("centroid"))
    )


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup) + embedding quantization
# ---------------------------------------------------------------------------


def kmeans_assign_fixed(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One deterministic k-means assignment step with FIXED seeds: the k
    vectors with the smallest ids are the centroids (no Lloyd refinement
    — that's ivf_assign; this variant is the portable, oracle-checkable
    contract any ANSI-SQL engine can replay). Each vector goes to the
    seed maximizing the dot product; ties break to the larger cell index
    (struct-max ordering), which any engine reproduces with an
    (score DESC, cell DESC) rank.

    The seeds are a bounded driver collect (k rows) broadcast into a
    single projection — the assignment itself is one scan, no shuffle."""
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col), cast.alias("v"))
    seeds = base.orderBy(id_col).limit(k).collect()
    cents = [(i, r["v"]) for i, r in enumerate(seeds)]
    # one parsed SQL expression instead of k x dim F.lit round trips
    # (r11, guide §5 driver latency) — same struct-max tree, same result
    structs = ",".join(
        f"named_struct('sim', {_dot_sql('v', _arr_sql(cv))}, 'cell', {ci})"
        for ci, cv in cents
    )
    best = F.expr(f"array_max(array({structs}))")
    return base.select(id_col, best["cell"].alias("cell"))


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    refined: bool = False,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space, then
    drop all-but-one of every within-cluster group of semantically
    near-identical vectors (cosine >= threshold; the smallest id is the
    keeper, matching the paper's keep-one-representative rule).

    Output: (vec_id, cell, keep) over every input vector.

    Scale shape: the pairwise check happens ONLY inside a cluster — an
    equi-join on the cell id, never a global cross join. k is sized so
    clusters stay bounded (the paper uses k ~ sqrt(n); at 100 TB you
    also cap per-cell candidates the way dedup.py caps hot shingles).
    refined=True swaps the fixed-seed assignment for ivf_assign's
    Lloyd-refined cells (better clusters, same downstream plan) — the
    fixed-seed default keeps the whole operator replayable in the
    DuckDB oracle."""
    if refined:
        assigned, _ = ivf_assign(df, n_cells=k, iters=2, vec_col=vec_col, id_col=id_col)
        assigned = assigned.select(F.col("id").alias(id_col), "cell")
    else:
        assigned = kmeans_assign_fixed(df, k, vec_col, id_col)
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # per-row norm: within-cell pairs pay one dot fold each (r11, §1.2)
    vecs = (
        df.select(F.col(id_col), cast.alias("v"))
        .withColumn("__n", norm(F.col("v")))
        .join(assigned, id_col)
    )
    a = vecs.select(
        F.col(id_col).alias("ida"),
        F.col("v").alias("va"),
        F.col("__n").alias("na"),
        F.col("cell").alias("cella"),
    )
    b = vecs.select(
        F.col(id_col).alias("idb"),
        F.col("v").alias("vb"),
        F.col("__n").alias("nb"),
        F.col("cell").alias("cellb"),
    )
    # a doc is dropped iff a SMALLER-id member of its cell sits within the
    # threshold — the candidate set is bounded by the cell equi-join, and
    # distinct() collapses it before the keep-flag join (no pair blowup)
    dropped = (
        b.join(a, (F.col("cella") == F.col("cellb")) & (F.col("ida") < F.col("idb")), "inner")
        .where(
            F.round(cosine_pren(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")), 6)
            >= threshold
        )
        .select(F.col("idb").alias(id_col))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("__drop", F.lit(True)), id_col, "left")
        .select(id_col, "cell", F.col("__drop").isNull().alias("keep"))
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization — the 4x memory cut
    every billion-vector ANN index takes before sharding. scale =
    max|v| / 127; q_i = floor(v_i/scale + 0.5) (explicit half-up floor so
    every engine rounds identically — round() half-even vs half-away
    differs across engines). Zero vectors quantize to zeros with scale 0.

    One projection over the scan: transform + aggregate stay inside
    whole-stage codegen, nothing shuffles, and the output is ~1/4 the
    input bytes — exactly what you want to write back before building
    the IVF cells."""
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col), cast.alias("v"))
    scale = F.array_max(F.transform(F.col("v"), F.abs)) / F.lit(127.0)
    q = F.when(
        F.col("__scale") > 0,
        F.transform(F.col("v"), lambda x: F.floor(x / F.col("__scale") + 0.5).cast("int")),
    ).otherwise(F.transform(F.col("v"), lambda x: F.lit(0)))
    return (
        base.withColumn("__scale", scale)
        .select(id_col, F.round("__scale", 9).alias("scale"), q.alias("q"))
    )


def kmeans_update(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One Lloyd centroid-update step from the fixed-seed assignment, in
    LONG form: (cell, pos, centroid). This is the update half of
    ivf_assign's refinement loop exposed as an oracle-checkable contract
    — posexplode + groupBy(cell, pos).avg, the scale-safe vector mean
    (partial aggregation map-side, shuffle payload = k * dim partial
    sums, never a collect_list of member vectors)."""
    assigned = kmeans_assign_fixed(df, k, vec_col, id_col)
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    vecs = df.select(F.col(id_col), cast.alias("v")).join(assigned, id_col)
    return (
        vecs.select("cell", F.posexplode("v").alias("pos", "val"))
        .groupBy("cell", "pos")
        .agg(F.round(F.avg("val"), 6).alias("centroid"))
    )


def pq_encode(
    df: DataFrame,
    m: int = 4,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product quantization (Jegou et al. 2011): split each vector into m
    subvectors and store, per subspace, the id of the nearest (squared-L2)
    of k codebook centroids — the billion-scale memory layout under
    IVF-PQ (m * log2(k) bits per vector). Codebooks here are the
    fixed-seed variant (subvectors of the k smallest-id vectors), keeping
    the whole encoding replayable in any SQL engine; swap the seeds for
    Lloyd-refined centroids per subspace exactly as ivf_assign refines
    cells.

    Output: (vec_id, codes array<int> of length m). One scan, codebooks
    broadcast as literals, no shuffle; ties go to the smaller code id."""
    row = df.select(F.size(vec_col).alias("d")).first()
    if row is None:
        return df.sparkSession.createDataFrame([], f"{id_col} long, codes array<int>")
    dim = int(row["d"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_d = dim // m
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col), cast.alias("v"))
    seeds = [r["v"] for r in base.orderBy(id_col).limit(k).collect()]

    def sq_l2(sub, cent):
        return F.aggregate(
            F.zip_with(sub, F.array(*[F.lit(float(x)) for x in cent]), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    codes = []
    for j in range(m):
        sub = F.slice(F.col("v"), j * sub_d + 1, sub_d)
        cands = F.array(
            *[
                F.struct(
                    sq_l2(sub, s[j * sub_d : (j + 1) * sub_d]).alias("dist"),
                    F.lit(ci).alias("cell"),
                )
                for ci, s in enumerate(seeds)
            ]
        )
        codes.append(F.array_min(cands)["cell"])
    return base.select(id_col, F.array(*codes).alias("codes"))


def pq_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    m: int = 4,
    n_codes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ asymmetric-distance top-k (ADC): the query stays full
    precision; per subspace a lookup table of squared-L2 distances from
    the query subvector to every codebook entry is built ONCE
    (m * n_codes literals), and each stored vector's approximate distance
    is the sum of m table lookups indexed by its codes — no float vector
    is ever read at query time, which is the entire point of PQ at
    billion scale.

    Plans as one scan over the (tiny) codes column + a global top-k
    (TakeOrderedAndProject). Ranking is approximate (quantization error);
    recall vs brute force is pinned by test, not by oracle."""
    codes_df = pq_encode(df, m=m, k=n_codes, vec_col=vec_col, id_col=id_col)
    dim = len(query_vec)
    sub_d = dim // m
    seeds_rows = (
        df.select(F.col(id_col), F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"))
        .orderBy(id_col)
        .limit(n_codes)
        .collect()
    )
    seeds = [r["v"] for r in seeds_rows]
    # flat LUT per subspace: lut[j][c] = ||q_j - codebook[c]_j||^2
    lut = [
        [
            sum(
                (query_vec[j * sub_d + i] - s[j * sub_d + i]) ** 2
                for i in range(sub_d)
            )
            for s in seeds
        ]
        for j in range(m)
    ]
    flat = F.array(*[F.lit(float(x)) for row in lut for x in row])
    dist = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, j: F.element_at(flat, (j * n_codes + c + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        codes_df.select(id_col, F.round(dist, 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 4,
    m: int = 4,
    n_codes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rerank: int = 4,
) -> DataFrame:
    """IVF-PQ: the canonical billion-scale ANN composition — a coarse
    quantizer prunes to n_probe of n_cells partitions (ivf_assign), and
    inside the probed cells ranking uses PQ asymmetric distances over the
    m-byte codes (pq_topk's LUT), so query-time IO is
    (n_probe / n_cells) * (m bytes per vector) — plus the standard final
    step: exact re-ranking of the ADC top-(rerank*k) against the float
    vectors (Jegou et al. 2011 §IV-C). The re-rank join touches only
    rerank*k rows (a broadcast-sized id set), so the float column is
    read for a constant number of vectors regardless of corpus size.
    Output: (id, cosine) desc. `rerank=0` returns the raw ADC ranking
    (id, adc_dist) asc — the memory-path-only plan."""
    assigned, cents = ivf_assign(df, n_cells, 2, vec_col, id_col)
    probe = [
        c[0]
        for c in sorted(cents, key=lambda c: -sum(a * b for a, b in zip(query_vec, c[1])))[:n_probe]
    ]
    cand_ids = assigned.where(F.col("cell").isin(probe)).select(F.col("id").alias(id_col))
    cand = df.join(cand_ids, id_col, "left_semi")
    kprime = k if rerank == 0 else rerank * k
    adc = pq_topk(cand, query_vec, k=kprime, m=m, n_codes=n_codes, vec_col=vec_col, id_col=id_col)
    if rerank == 0:
        return adc
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (
        df.join(F.broadcast(adc.select(id_col)), id_col, "left_semi")
        .select(F.col(id_col), F.round(cosine(cast, q), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def pq_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 4,
    n_codes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "query_id",
    q_vec_col: str = "embedding",
) -> DataFrame:
    """Batched PQ asymmetric-distance top-k: N queries, ONE plan — the
    distributed shape of FAISS's batched ADC scan. The per-query LUT
    (m * n_codes squared-L2 entries against the broadcast codebook
    literals) is computed as a COLUMN on the query rows, so queries stay
    a DataFrame; the corpus side is scanned once over its m-byte codes
    per query (broadcast nested-loop against the tiny query side), each
    row's distance = m LUT lookups. Per-query top-k is a window over the
    scored pairs. Returns (query_id, vec_id, adc_dist) ascending.

    At 100 TB: the only big-data operand is the codes column (m bytes a
    row); query count is bounded (broadcast), and no float vector is
    read at query time."""
    row = df.select(F.size(vec_col).alias("d")).first()
    if row is None:
        return df.sparkSession.createDataFrame(
            [], f"{q_id_col} long, {id_col} long, adc_dist double"
        )
    dim = int(row["d"])
    sub_d = dim // m
    codes_df = pq_encode(df, m=m, k=n_codes, vec_col=vec_col, id_col=id_col)
    seeds = [
        r["v"]
        for r in df.select(
            F.col(id_col), F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")
        )
        .orderBy(id_col)
        .limit(n_codes)
        .collect()
    ]
    seeds_flat = F.array(*[F.lit(float(x)) for s in seeds for x in s])
    qv = F.transform(F.col(q_vec_col), lambda x: x.cast("double"))

    def lut_entry(idx):
        j = F.floor(idx / n_codes)
        c = idx % n_codes
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(sub_d)),
            F.lit(0.0),
            lambda acc, i: acc
            + F.pow(
                F.element_at(qv, (j * sub_d + i).cast("int"))
                - F.element_at(seeds_flat, (c * dim + j * sub_d + i).cast("int")),
                F.lit(2),
            ),
        )

    qs = queries.select(
        F.col(q_id_col).alias("__qid"),
        F.transform(F.sequence(F.lit(0), F.lit(m * n_codes - 1)), lut_entry).alias("__lut"),
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, j: F.element_at(F.col("__lut"), (j * n_codes + c + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    from pyspark.sql import Window

    scored = codes_df.join(F.broadcast(qs)).select(
        "__qid", F.col(id_col), F.round(adc, 6).alias("adc_dist")
    )
    w = Window.partitionBy("__qid").orderBy(F.asc("adc_dist"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(F.col("__qid").alias(q_id_col), id_col, "adc_dist")
    )


def ivfpq_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 4,
    m: int = 4,
    n_codes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "query_id",
    q_vec_col: str = "embedding",
    rerank: int = 4,
) -> DataFrame:
    """Batched IVF-PQ with exact re-rank — the full production ANN serving
    shape as ONE Catalyst plan for N queries:

      1. coarse probe: each query's top-n_probe cells computed as a
         COLUMN against the centroid literals (no driver branching per
         query), exploded to (query, cell) probe pairs;
      2. candidate generation: probe pairs equi-join the corpus cell
         assignment — each query touches n_probe/n_cells of the data;
      3. ADC ranking over the m-byte codes with the per-query LUT column
         (pq_topk_batch's arithmetic), window top-(rerank*k) per query;
      4. exact re-rank: the surviving (query, id) pairs — rerank*k*N
         rows, broadcast-sized — join the float vectors once and score
         exact cosine; window top-k per query.

    Returns (query_id, vec_id, cosine) descending per query. `rerank=0`
    returns the raw ADC ranking (query_id, vec_id, adc_dist)."""
    from pyspark.sql import Window

    assigned, cents = ivf_assign(df, n_cells, 2, vec_col, id_col)
    qv = F.transform(F.col(q_vec_col), lambda x: x.cast("double"))
    cell_sims = F.array(
        *[
            F.struct(
                dot(qv, F.array(*[F.lit(float(x)) for x in cv])).alias("sim"),
                F.lit(ci).alias("cell"),
            )
            for ci, cv in cents
        ]
    )
    probes = F.slice(F.reverse(F.array_sort(cell_sims)), 1, n_probe)
    q_probe = queries.select(
        F.col(q_id_col).alias("__qid"),
        F.explode(F.transform(probes, lambda s: s["cell"])).alias("cell"),
    )
    cand = assigned.join(F.broadcast(q_probe), "cell").select(
        "__qid", F.col("id").alias(id_col)
    )
    cand_vecs = df.join(
        cand.select(id_col).distinct(), id_col, "left_semi"
    )
    kprime = k if rerank == 0 else rerank * k
    adc_all = pq_topk_batch(
        cand_vecs,
        queries,
        k=max(kprime, k),
        m=m,
        n_codes=n_codes,
        vec_col=vec_col,
        id_col=id_col,
        q_id_col=q_id_col,
        q_vec_col=q_vec_col,
    )
    # keep only pairs the coarse probe admitted for THAT query
    adc = adc_all.join(
        cand.withColumnRenamed("__qid", q_id_col), [q_id_col, id_col], "left_semi"
    )
    if rerank == 0:
        w0 = Window.partitionBy(q_id_col).orderBy(F.asc("adc_dist"), F.asc(id_col))
        return (
            adc.withColumn("__rn", F.row_number().over(w0))
            .where(F.col("__rn") <= k)
            .drop("__rn")
        )
    qs = queries.select(F.col(q_id_col).alias("__rq"), qv.alias("__qv")).withColumn(
        "__nq", norm(F.col("__qv"))
    )
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    pairs = adc.select(q_id_col, id_col).join(
        df.select(F.col(id_col), cast.alias("__v")).withColumn("__nv", norm(F.col("__v"))),
        id_col,
    )
    scored = pairs.join(
        F.broadcast(qs), pairs[q_id_col] == F.col("__rq")
    ).select(
        q_id_col,
        id_col,
        F.round(
            cosine_pren(F.col("__v"), F.col("__qv"), F.col("__nv"), F.col("__nq")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# PCA: distributed moment accumulation, driver-side d x d eig, columnar
# projection
# ---------------------------------------------------------------------------


def pca_fit(
    df: DataFrame,
    n_components: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[list[float]], list[float]]:
    """Principal components of an embedding column -> (components, mean);
    components[j] is the j-th eigenvector (descending eigenvalue), sign
    fixed so each vector's largest-|x| coordinate is positive (removes
    the eig sign ambiguity — deterministic across BLAS builds).

    The 100 TB shape: N never leaves the executors. Each Arrow batch
    folds into ONE partial-moment row (n, sum x, flattened sum x xᵀ) —
    numpy does the outer products batch-side — and only
    #partitions-many d²-sized rows reach the final combine; the d x d
    eigendecomposition is driver-side numpy on a matrix whose size is
    set by the embedding dim, not the corpus. This is the standard
    two-pass-free covariance PCA (e.g. Spark MLlib's RowMatrix
    computeCovariance does the same Gramian accumulation)."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    dim_row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if dim_row is None:
        raise ValueError("pca_fit on an empty dataframe")
    d = dim_row["d"]

    def moments(it):
        n, s, ss = 0, np.zeros(d), np.zeros((d, d))
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["v"].to_numpy())
            n += x.shape[0]
            s += x.sum(axis=0)
            ss += x.T @ x
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]})

    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("ss", T.ArrayType(T.DoubleType())),
        ]
    )
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    partials = df.select(cast.alias("v")).mapInPandas(moments, schema).collect()
    n = sum(p["n"] for p in partials)
    if n == 0:
        raise ValueError("pca_fit on an empty dataframe")
    s = np.sum([np.array(p["s"]) for p in partials], axis=0)
    ss = np.sum([np.array(p["ss"]).reshape(d, d) for p in partials], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:n_components]
    comps = []
    for j in order:
        v = vecs[:, j]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return comps, [float(x) for x in mean]


def pca_project(
    df: DataFrame,
    components: list[list[float]],
    mean: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = None,
) -> DataFrame:
    """(id, proj) — each vector centered and projected onto the fitted
    components, entirely columnar: the model rides the plan as array
    literals (the SRP-planes/PQ-codebook pattern), each coordinate is a
    zip_with multiply + aggregate sum inside whole-stage codegen. No
    shuffle, no Python in the row path."""
    mean_arr = F.array(*[F.lit(float(m)) for m in mean])
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    centered = F.zip_with(cast, mean_arr, lambda x, m: x - m)
    def proj_one(comp):
        carr = F.array(*[F.lit(float(c)) for c in comp])
        val = F.aggregate(
            F.zip_with(centered, carr, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.round(val, round_to) if round_to is not None else val
    return df.select(F.col(id_col), F.array(*[proj_one(c) for c in components]).alias("proj"))


# ---------------------------------------------------------------------------
# hard-negative mining (contrastive-training data prep)
# ---------------------------------------------------------------------------


def hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    prune_cells: int | None = None,
    n_probe: int = 2,
) -> DataFrame:
    """Top-k hard negatives per anchor: the most cosine-similar corpus
    vectors carrying a DIFFERENT label — the standard mining step for
    contrastive/embedding training (in-batch negatives are too easy;
    the hardest out-of-class neighbors carry the gradient signal).

    Output (anchor_id, neg_id, cosine, rank), cosine rounded to 6,
    ranking ties broken by neg_id asc — a total order any SQL engine
    replays.

    Plan: anchors are a bounded, caller-chosen set (a training batch /
    probe sample), so they BROADCAST by contract; the corpus streams
    once through the cosine projection, then one window keyed on
    anchor_id takes top-k. With prune_cells=c the corpus is first
    restricted to the union of every anchor's n_probe nearest of c
    fixed-seed k-means cells (kmeans_assign_fixed seeds) — the IVF
    composition that keeps the window input at |anchors| x cell-size
    instead of |anchors| x |corpus| at 100 TB. The exact variant
    (prune_cells=None) is the oracle twin; pruned recall is
    pytest-pinned."""
    from pyspark.sql import Window

    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # per-row norms: each (anchor, candidate) pair then costs ONE dot
    # fold instead of dot + both norms — the corpus-side norm otherwise
    # re-folds once per anchor (r11, guide §1.2)
    c = corpus.select(
        F.col(id_col).alias("neg_id"), F.col(label_col).alias("neg_label"), cast.alias("cv")
    ).withColumn("__nc", norm(F.col("cv")))
    a = anchors.select(
        F.col(id_col).alias("anchor_id"), F.col(label_col).alias("anchor_label"), cast.alias("av")
    ).withColumn("__na", norm(F.col("av")))

    if prune_cells:
        assign = kmeans_assign_fixed(corpus, k=prune_cells, vec_col=vec_col, id_col=id_col)
        seeds = (
            corpus.select(F.col(id_col), cast.alias("v")).orderBy(id_col).limit(prune_cells).collect()
        )
        ranked = F.array(
            *[
                F.struct(
                    dot(F.col("av"), F.array(*[F.lit(float(x)) for x in r["v"]])).alias("sim"),
                    F.lit(ci).alias("cell"),
                )
                for ci, r in enumerate(seeds)
            ]
        )
        probe = a.select(
            "anchor_id",
            F.explode(
                F.slice(F.reverse(F.array_sort(ranked)), 1, n_probe)["cell"]
            ).alias("cell"),
        ).select("cell").distinct()
        keep = assign.join(F.broadcast(probe), "cell", "left_semi").select(
            F.col(id_col).alias("neg_id")
        )
        c = c.join(keep, "neg_id", "left_semi")

    pairs = c.join(F.broadcast(a), F.col("neg_label") != F.col("anchor_label"))
    scored = pairs.select(
        "anchor_id",
        "neg_id",
        F.round(
            cosine_pren(F.col("av"), F.col("cv"), F.col("__na"), F.col("__nc")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cosine"), F.asc("neg_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def mmr_select(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    lam: float = 0.7,
    fetch: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance diverse top-k (Carbonell & Goldstein
    1998): greedily select k items maximizing lam*rel(d) - (1-lam) *
    max_{s in selected} sim(d, s) — relevance-ranked retrieval that
    doesn't return k near-copies of the best hit (the re-rank step of a
    RAG / retrieval-augmented training pipeline, and the diversity dual
    of hard_negatives).

    Shape: stage 1 is the distributed exact cosine top-`fetch`
    (TakeOrderedAndProject — per-partition heap); ONLY the `fetch`
    candidate rows ever leave the cluster (bounded by contract — the
    codebook-class bounded collect), and the corpus is never touched
    again. Stage 2 is the inherently-sequential greedy chain, run over
    the collected candidates with strict left-to-right IEEE-double
    folds — bit-identical to both the JVM fold that scored stage 1 and
    the ANSI replay, so the oracle re-derives the chain via chained
    CTEs and hash-matches. (An earlier all-Spark stage 2 was measured
    3.7s at sf0.1 — five sequential one-row jobs of pure scheduler
    overhead for the same 50-row arithmetic.)

    Returns (rank, id_col, score): rank 1..k, score = rel for rank 1,
    the MMR value after, both rounded to 6 digits."""
    if k < 1 or fetch < k:
        raise ValueError("need k >= 1 and fetch >= k")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cand = (
        df.select(F.col(id_col).alias("id"), cast.alias("v"))
        .withColumn("rel", cosine(F.col("v"), q))
        .orderBy(F.desc("rel"), F.asc("id"))
        .limit(fetch)
        .collect()
    )

    def _dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def _cos(a, b):
        import math as _m

        d = _m.sqrt(_dot(a, a)) * _m.sqrt(_dot(b, b))
        return _dot(a, b) / d if d != 0 else 0.0

    vecs = {r["id"]: list(r["v"]) for r in cand}
    rels = {r["id"]: float(r["rel"]) for r in cand}
    pool = sorted(vecs)  # ascending id = the tie-break order
    selected: list[tuple] = []  # (id, score)
    while len(selected) < k and pool:
        best_id, best_score = None, None
        for cid in pool:
            if not selected:
                score = rels[cid]
            else:
                score = lam * rels[cid] - (1.0 - lam) * max(
                    _cos(vecs[cid], vecs[sid]) for sid, _s in selected
                )
            if best_score is None or score > best_score:
                best_id, best_score = cid, score
        selected.append((best_id, best_score))
        pool.remove(best_id)
    out = [(r + 1, sid, round(s, 6)) for r, (sid, s) in enumerate(selected)]
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("rank", T.IntegerType()),
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("score", T.DoubleType()),
        ]
    )
    return df.sparkSession.createDataFrame(out, schema)


def quantize_binary(
    embs: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id", dim: int | None = None
) -> DataFrame:
    """Sign-bit binary quantization -> (id_col, code: array<long>): one
    bit per dimension (v > 0), packed 32 bits per code word — the 32x
    compression step of binary-code ANN (sign random projections with
    identity rotation; Hamming distance between codes approximates
    angular distance, Charikar 2002). 32 bits per word keeps every
    accumulation inside non-overflowing long arithmetic (ANSI-safe) and
    the packing replayable in any SQL engine.

    Fully columnar: one transform over the word index, one 32-element
    fold per word. No Python, no shuffle — the code column rides the
    scan, and downstream Hamming search operates on ceil(dim/32) longs
    instead of dim floats."""
    if dim is None:
        first = embs.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
    n_words = (dim + 31) // 32
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    code = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda j: F.aggregate(
            F.slice(v, j * 32 + 1, 32),
            F.lit(0).cast("long"),
            lambda acc, x: acc * 2 + F.when(x > 0, 1).otherwise(0),
        ),
    )
    return embs.select(F.col(id_col), code.alias("code"))


def binary_hamming_topk(
    codes: DataFrame, query_code: list[int], k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact Hamming top-k over packed binary codes -> (id_col,
    hamming): per-word xor+popcount folded columnar, then
    orderBy+limit = TakeOrderedAndProject (per-partition heaps, k rows
    move). The scan reads ceil(dim/32) longs per row — at 100 TB this
    is the 32x-cheaper first-stage retrieval whose survivors get exact
    float re-ranking (same two-stage shape as ivfpq_topk's ADC +
    re-rank)."""
    q = F.array(*[F.lit(int(w)).cast("long") for w in query_code])
    dist = F.aggregate(
        F.zip_with(F.col("code"), q, lambda a, b: F.bit_count(a.bitwiseXOR(b))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        codes.select(F.col(id_col), dist.alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc(id_col))
        .limit(k)
    )


def binary_rerank_topk(
    embs: DataFrame,
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage binary retrieval: Hamming shortlist over packed sign
    codes (32x cheaper scan) -> exact float cosine re-rank of the
    shortlist -> top-k. The standard memory-tiered ANN shape (same
    two-stage contract as ivfpq_topk's ADC + re-rank): stage 1 reads
    ceil(dim/32) longs per row, stage 2 touches `shortlist` float rows
    only (semi-join by id against the checkpointed shortlist). Both
    stages deterministic (id tie-breaks), so the full composition is
    SQL-replayable — the oracle re-derives shortlist AND re-rank."""
    codes = quantize_binary(embs, vec_col=vec_col, id_col=id_col)
    qcode_row = (
        quantize_binary(
            embs.sparkSession.createDataFrame(
                [(0, [float(x) for x in query_vec])], f"{id_col} long, {vec_col} array<double>"
            ),
            vec_col=vec_col,
            id_col=id_col,
        )
        .first()
    )
    short = binary_hamming_topk(codes, list(qcode_row["code"]), k=shortlist, id_col=id_col)
    # lazy-checkpointed shortlist: the final action's broadcast build
    # computes the k rows once; blocks serve any further reader (r11)
    short = short.transform(iter_checkpoint_lazy)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (
        embs.join(F.broadcast(short.select(id_col)), id_col, "left_semi")
        .select(F.col(id_col), F.round(cosine(cast, q), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ann_recall_at_k(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "query_id",
    q_vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Recall@k evaluation harness for the SRP-LSH route -> one row per
    query (q_id_col, n_hits, recall): |lsh_topk_batch ∩ exact top-k| / k.
    The measurement loop every ANN deployment runs before trusting the
    approximate route with a 100 TB retrieval job — as a first-class
    distributed operator instead of a notebook: ground truth is the
    bounded-query-batch broadcast over ONE corpus scan (the same
    whitelisted shape as lsh_topk_batch's fallback), the ANN side is the
    production operator itself (recall guard included — a query whose
    bucket underfills re-scores exactly, so its recall is honestly 1.0),
    and the intersection is a semi-join on (query, vec). Both rankings
    order by (cosine rounded to 6dp DESC, id ASC), which makes the whole
    evaluation engine-replayable and hash-checked against a DuckDB twin
    — not just eyeballed."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    ann = lsh_topk_batch(
        df, queries, k=k, n_planes=n_planes, vec_col=vec_col, id_col=id_col,
        q_id_col=q_id_col, q_vec_col=q_vec_col, seed=seed, dim=dim,
    )
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qcast = F.transform(F.col(q_vec_col), lambda x: x.cast("double"))
    # per-row norms: the |corpus| x |queries| ground-truth cross join
    # pays one dot fold per pair, not three (r11, guide §1.2)
    corpus = df.select(F.col(id_col), cast.alias("__v")).withColumn("__nv", norm(F.col("__v")))
    qs = queries.select(F.col(q_id_col).alias("__qid"), qcast.alias("__qv")).withColumn(
        "__nq", norm(F.col("__qv"))
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("__cos"), F.asc(id_col))
    exact = (
        corpus.crossJoin(F.broadcast(qs))
        .select(
            "__qid",
            F.col(id_col),
            F.round(
                cosine_pren(F.col("__v"), F.col("__qv"), F.col("__nv"), F.col("__nq")), 6
            ).alias("__cos"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select("__qid", id_col)
    )
    hits = (
        ann.select(F.col(q_id_col).alias("__qid"), F.col(id_col))
        .join(exact, ["__qid", id_col], "left_semi")
        .groupBy("__qid")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        qs.select("__qid")
        .join(hits, "__qid", "left")
        .select(
            F.col("__qid").alias(q_id_col),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(F.coalesce("n_hits", F.lit(0)) / F.lit(float(k)), 6).alias("recall"),
        )
    )


def knn_graph(
    df: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate k-nearest-neighbor GRAPH over the whole corpus ->
    (src, dst, cosine, rank): each vector's top-k most-similar peers
    among its SRP-LSH bucket mates. The all-nodes generalization of
    lsh_topk_batch (queries = the corpus itself) and the input format
    graph-based curation wants — SemDeDup-style cluster pruning,
    connected_components over near-dup edges, k-NN classification of
    unlabeled docs from labeled neighbors.

    Scale shape: this is the one similarity op where the query side is
    DATA-SCALE, so nothing is broadcastable — the plan must be a pure
    equi-join. Candidates meet through the SRP bucket self-join (the
    banded-LSH move: ~n^2/2^planes comparisons instead of all-pairs,
    tuned by n_planes exactly like the dedup band count); the per-node
    top-k is one row_number window over the join's (src-keyed) shuffle.
    Two keyed shuffles total, no broadcast, no driver state. Hot
    buckets (dense near-dup clusters) bound the skew the same way the
    LSH dedup family does — more planes, smaller buckets.

    Determinism: the LCG planes, the round-6 cosine, and the dst-id
    tie-break make the whole graph engine-replayable (the SQL oracle
    re-derives buckets from the plane literals and replays the window).
    Recall is the SRP recall, pinned by tests; vectors alone in their
    bucket yield no edges (the honest ANN answer — raise n_probes by
    lowering n_planes if isolation matters).

    Each side PRE-NORMALIZES its vector once (zero vectors stay zero,
    giving cosine 0), so each candidate pair costs ONE array fold (the
    dot), not three — measured 3-4x off the per-pair cosine at sf0.1.
    The cosine is therefore the dot of the normalized vectors; the
    oracles replay that exact formula (same fold, same ulps)."""
    from pyspark.sql import Window

    planes = _planes(dim, n_planes, seed)
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    b = (
        df.select(F.col(id_col), cast.alias("v"))
        .withColumn("bucket", F.expr(srp_bucket_sql("v", planes)))
        # norm materializes as its own column FIRST: referencing norm()
        # inside the transform lambda would re-fold it per element
        .withColumn("__n", norm(F.col("v")))
        .withColumn(
            "nv",
            F.when(
                F.col("__n") != 0,
                F.transform(F.col("v"), lambda x: x / F.col("__n")),
            ).otherwise(F.col("v")),
        )
        .select(id_col, "nv", "bucket")
    )
    left = b.toDF("src", "lv", "bucket")
    right = b.toDF("dst", "rv", "bucket")
    # Each UNORDERED pair meets once (src < dst) and pays the 64-element
    # dot fold once; the explode below mirrors the computed cosine into
    # both directions for the per-src window. IEEE multiply is
    # commutative and the fold's add order is element order, so
    # dot(a, b) == dot(b, a) bit-exactly — rows are identical to the
    # old both-directions join, at half the fold work (r11; the fold is
    # the measured exec cost: 3.1 s of a 3.9 s query at sf0.1).
    # Generate preserves its child's partitioning, so at scale the
    # window still rides the self-join's HashPartitioning(bucket)
    # exchange — the one-data-scale-shuffle shape is unchanged.
    # merge hint (r11, guide §2.4/§3.1): Spark otherwise broadcasts the
    # whole bucketed relation (it fits locally), deriving the
    # scan+bucket+normalize subtree TWICE and building a corpus-wide
    # hash relation; shuffled on bucket, both sides are the identical
    # subtree — ReuseExchange plans it ONCE and the (bucket, src) window
    # below rides the same exchange. Interleaved A/B at sf0.1:
    # broadcast 3.0-10.1 s vs merge 2.0-3.9 s, identical rows. This is
    # also the declared 100 TB shape (nothing broadcastable at scale).
    half = (
        left.join(right.hint("merge"), "bucket")
        .where(F.col("src") < F.col("dst"))
        .select("bucket", "src", "dst", F.round(dot(F.col("lv"), F.col("rv")), 6).alias("cosine"))
    )
    scored = half.select(
        "bucket",
        F.explode(
            F.array(
                F.struct(F.col("src").alias("s"), F.col("dst").alias("d")),
                F.struct(F.col("dst").alias("s"), F.col("src").alias("d")),
            )
        ).alias("e"),
        "cosine",
    ).select("bucket", F.col("e.s").alias("src"), F.col("e.d").alias("dst"), "cosine")
    # The top-k window partitions by (bucket, src), not src alone: src
    # DETERMINES bucket, so the ranking is row-identical — but
    # HashPartitioning(bucket) from the self-join's exchange satisfies
    # ClusteredDistribution(bucket, src), so when the join runs as a
    # shuffle join (the data-scale case: both sides too big to
    # broadcast) the window reuses the join's partitioning and the plan
    # drops from two data-scale shuffles to ONE. Locally (broadcast
    # join) the single window exchange is the same cost either way.
    w = Window.partitionBy("bucket", "src").orderBy(F.desc("cosine"), F.asc("dst"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("bucket")
    )


def semantic_knn_clusters(
    df: DataFrame,
    threshold: float = 0.3,
    k: int = 3,
    n_planes: int = 6,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Graph-based semantic dedup clusters -> (vec_id, cluster): the
    kNN-graph route to near-duplicate grouping (the FineWeb/Gopher-style
    complement of the centroid route in semantic_dedup): build the
    SRP-bucketed kNN graph, keep edges with cosine >= threshold, and
    take CONNECTED COMPONENTS — transitive closure, so chains of
    pairwise-similar vectors collapse into one cluster even when their
    endpoints aren't directly similar. Cluster ids are the min member
    id (canonical); vectors with no qualifying edge cluster as
    themselves, so the output is a total, deterministic partition of
    the corpus — a dedup pass keeps e.g. min-id or best-quality per
    cluster.

    Plan: knn_graph's two keyed shuffles + the star-contraction CC loop
    (O(log^2 n) rounds of agg+join on the thresholded edge relation —
    which is at most k*n rows, usually far fewer) + one left join to
    re-attach singletons. Everything keyed; no broadcast; no driver
    state beyond the CC convergence counter."""
    from cm_well_spark.operators.graph import connected_components

    edges = knn_graph(
        df, k=k, n_planes=n_planes, dim=dim, vec_col=vec_col, id_col=id_col, seed=seed
    ).where(F.col("cosine") >= F.lit(float(threshold)))
    comps = connected_components(edges.select("src", "dst"))
    return (
        df.select(F.col(id_col))
        .join(comps.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster"),
        )
    )


def centroid_drift(
    embs_a: DataFrame,
    embs_b: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label embedding drift between two corpus slices -> (label,
    n_a, n_b, cosine): the cosine between each label's centroid in A
    and in B — the distribution-shift monitor for embedding spaces
    (yesterday's crawl vs today's, train vs eval, pre/post a pipeline
    change); cosine near 1 = stable semantics, drops flag drift before
    a downstream model does.

    Plan: both sides reduce through the label_centroids kernel
    (posexplode + (label, pos) avg — never a whole vector in one row),
    ONE equi-join on (label, pos), and ONE keyed aggregate folds dot
    product and both norms; counts ride two keyed counts joined at the
    end. Labels present on only one side drop (drift of nothing is
    undefined) — count them with an anti-join upstream if the absence
    itself is the signal."""
    ca = label_centroids(embs_a, vec_col, label_col).withColumnRenamed("centroid", "__a")
    cb = label_centroids(embs_b, vec_col, label_col).withColumnRenamed("centroid", "__b")
    agg = (
        ca.join(cb, [label_col, "pos"])
        .groupBy(label_col)
        .agg(
            F.sum(F.col("__a") * F.col("__b")).alias("__dot"),
            F.sum(F.col("__a") * F.col("__a")).alias("__na"),
            F.sum(F.col("__b") * F.col("__b")).alias("__nb"),
        )
    )
    na = embs_a.groupBy(label_col).agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    nb = embs_b.groupBy(label_col).agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    return (
        agg.join(na, label_col)
        .join(nb, label_col)
        .select(
            label_col,
            "n_a",
            "n_b",
            F.round(
                F.when(
                    (F.col("__na") > 0) & (F.col("__nb") > 0),
                    F.col("__dot") / (F.sqrt("__na") * F.sqrt("__nb")),
                ),
                6,
            ).alias("cosine"),
        )
    )
