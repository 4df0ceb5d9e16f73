"""Similarity search over embedding columns (array<float>).

Two paths per the training-data-pipeline mandate:
- brute-force cosine top-k: exact baseline; JVM-side column algebra
  (F.aggregate/zip_with — no Python in the row path);
- LSH-bucketed ANN: random-hyperplane signs from the portable h32 hash (so
  the "random" projections are deterministic and oracle-reproducible);
  candidates meet only within a bucket — the shuffle is bucket-local,
  which is the property that survives a 100× scale-up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import h32


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against one query vector. One scan + a
    global top-k (orderBy+limit lowers to TakeOrdered — no full sort)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.select(
            F.col(id_col),
            F.round(cosine_col(F.col(vec_col).cast("array<double>"), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def plane_weight(p: int, i: int, salt: str = "") -> float:
    """±1 by bit 0 of h32(f'{salt}{p}:{i}') — the same md5-derived
    constant an oracle engine computes in SQL; evaluated driver-side here
    because the weights are literals (a 512-term md5 expression tree is
    pure plan bloat; Catalyst would constant-fold it anyway, but compile
    time isn't free). A non-empty ``salt`` derives an INDEPENDENT plane
    family — the basis of multi-table LSH."""
    import hashlib

    h = int(hashlib.md5(f"{salt}{p}:{i}".encode()).hexdigest()[:8], 16)
    return 1.0 if h & 1 else -1.0


def projections(vec: Column, dim: int, n_planes: int = 8,
                salt: str = "") -> Column:
    """All ``n_planes`` signed-projection sums ``Σ_i w(p,i)·v[i]`` as one
    array<double>, in ONE fold over the vector (the round-3 shape ran
    n_planes independent aggregate passes — one full vector traversal per
    plane). The weight matrix rides in TRANSPOSED (per-coordinate weight
    rows), so plane p's sum still accumulates coordinate 0,1,2,…
    contributions in sequence — the float addition order, and therefore
    every downstream consumer (sign buckets, projected vectors), is
    bit-identical to the unfused form and to the oracle SQL."""
    w_t = F.array(*[
        F.array(*[F.lit(plane_weight(p, i, salt)) for p in range(n_planes)])
        for i in range(dim)
    ])
    zero = F.array(*[F.lit(0.0).cast("double") for _ in range(n_planes)])
    return F.aggregate(
        F.zip_with(vec, w_t, lambda x, wrow: F.transform(wrow, lambda w: x * w)),
        zero,
        lambda acc, contrib: F.zip_with(acc, contrib, lambda a, v: a + v),
    )


def hyperplane_signature(vec: Column, dim: int, n_planes: int = 8,
                         salt: str = "") -> Column:
    """Deterministic random-hyperplane LSH signature: plane p's weight for
    coordinate i is ±1 by bit 0 of h32('p:i') — reproducible in any engine
    with md5. Returns the signature as a bigint bucket id (sign bit of
    each :func:`projections` sum, packed little-endian)."""
    sums = projections(vec, dim, n_planes, salt)
    plane_weights = F.array(*[F.lit(2 ** p).cast("bigint") for p in range(n_planes)])
    return F.aggregate(
        F.zip_with(
            sums, plane_weights,
            lambda s, w: F.when(s > 0, w).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def random_projection(
    embeddings: DataFrame,
    dim: int,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "",
    scale_e6: bool = True,
) -> DataFrame:
    """Signed random projection (Achlioptas 2003 / JL transform, the
    database-friendly ±1 variant): project each ``dim``-vector onto
    ``out_dim`` deterministic ±1 hyperplanes — the standard
    dimensionality-reduction front end of a 100 TB ANN pipeline, where
    the full-width embedding column dominates shuffle traffic and the
    JL lemma bounds the distance distortion of the narrow copy.

    The weight matrix is the same md5-derived family the LSH operators
    use (:func:`plane_weight` — bit 0 of h32('{salt}{p}:{i}')), so the
    "random" matrix is reproducible in any engine with md5, and
    signatures built downstream from these projections agree with
    :func:`hyperplane_signature` by construction (identical fold order).

    Shuffle-free: one :func:`projections` fold per row inside
    whole-stage codegen — at any corpus size the operator is a map.
    Returns exploded ``(id, p, proj_e6)`` rows: with ``scale_e6`` the
    exact double sum is fixed-pointed to integer micro-units
    (``CAST(round(proj * 1e6) AS BIGINT)``) so downstream comparisons
    and the cross-engine oracle are integer-exact; pass
    ``scale_e6=False`` for the raw double (column name ``proj``).
    """
    if dim < 1 or out_dim < 1:
        raise ValueError(f"dim and out_dim must be >= 1: {dim}, {out_dim}")
    sums = projections(
        F.col(vec_col).cast("array<double>"), dim, out_dim, salt)
    exploded = embeddings.select(
        F.col(id_col), F.posexplode(sums).alias("p", "raw"))
    if scale_e6:
        return exploded.select(
            id_col, "p",
            F.round(F.col("raw") * 1e6).cast("bigint").alias("proj_e6"))
    return exploded.select(id_col, "p", F.col("raw").alias("proj"))


def adaptive_n_planes(n_rows: int, target_bucket_rows: int = 1024,
                      lo: int = 4, hi: int = 24) -> int:
    """Plane count that keeps the EXPECTED bucket population near
    ``target_bucket_rows``: 2^n_planes buckets ≈ n_rows / target. A fixed
    plane count re-quadratizes the within-bucket join as the corpus grows
    (bucket size ∝ N); growing planes with log2(N) keeps the within-bucket
    pair count ≈ N · target — linear in corpus size. Each extra plane
    costs recall for pairs near the threshold (disagreeing-hyperplane
    probability θ/π per plane); cap at ``hi`` and compensate with multiple
    tables if recall matters more than shuffle."""
    import math

    if n_rows <= target_bucket_rows:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n_rows / target_bucket_rows))))


def _lsh_table_pairs(
    embeddings: DataFrame,
    dim: int,
    n_planes: int,
    threshold: float,
    id_col: str,
    vec_col: str,
    max_bucket_rows: int | None,
    salt: str,
) -> DataFrame:
    """One LSH table's verified pairs (see ``lsh_bucketed_pairs``).
    ``salt`` names the plane family AND keys the oversized-bucket salt
    split, so different tables split a hot bucket into DIFFERENT groups —
    that independence is what lets a second table recover cross-group
    pairs the first table's cap dropped."""
    vec_d = F.col(vec_col).cast("array<double>")
    sigs = embeddings.select(
        F.col(id_col), vec_d.alias("v"),
        hyperplane_signature(vec_d, dim, n_planes, salt).alias("bucket"),
    )
    if max_bucket_rows is not None:
        sizes = sigs.groupBy("bucket").agg(F.count(F.lit(1)).alias("_bn"))
        n_salts = F.ceil(F.col("_bn") / max_bucket_rows).cast("bigint")
        sigs = (
            sigs.join(F.broadcast(sizes), "bucket")  # ≤ 2^n_planes rows
            .withColumn(
                "bucket",
                F.concat_ws(
                    "_",
                    F.col("bucket"),
                    F.pmod(
                        F.xxhash64(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
                        F.greatest(n_salts, F.lit(1)),
                    ),
                ),
            )
            .drop("_bn")
        )
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine_col(F.col("a.v"), F.col("b.v")).alias("_cos_raw"),
        )
        # threshold on the RAW cosine (identical IEEE doubles in any
        # engine); round only for display — filtering on the rounded value
        # would disagree with an oracle at the boundary
        .filter(F.col("_cos_raw") >= threshold)
        .select("id_a", "id_b", F.round("_cos_raw", 6).alias("cos_sim"))
    )


def lsh_bucketed_pairs(
    embeddings: DataFrame,
    dim: int,
    n_planes: int | None = 8,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_rows: int | None = None,
    n_tables: int = 1,
) -> DataFrame:
    """Near-neighbor pairs within hyperplane-LSH buckets, verified by exact
    cosine. Shuffle keys on the bucket id (2^n_planes buckets).

    n_planes=None derives the plane count from the corpus size
    (adaptive_n_planes — one count() job), so the within-bucket join stays
    linear as the corpus grows. ``max_bucket_rows`` additionally SALTS any
    bucket that still exceeds the cap (skewed data — many near-identical
    vectors — defeats any plane count): rows in an oversized bucket are
    split into ceil(size/cap) deterministic salt groups and pairs only
    form within a salt group. That bounds the worst-case join fan-out at
    the cost of recall ACROSS salt groups of the same bucket.

    ``n_tables`` > 1 is the recall mitigation: each extra table hashes
    with an INDEPENDENT plane family (salted weight keys) and an
    independent hot-bucket salt split, and the union of verified pairs is
    deduplicated. For a capped hot bucket split into g groups, one table
    keeps ≈ 1/g of its cross pairs; T independent tables keep
    ≈ 1 − (1 − 1/g)^T — measured on the skewed pytest fixture (one
    60-row bucket, cap 20 ⇒ g=3): recall 0.24 at T=1 → 0.49 at T=2 →
    0.66 at T=3, precision 1.0 throughout (the exact-cosine verify never
    admits false pairs). Multi-table also recovers
    near-threshold pairs a single table's planes happen to separate (the
    classic LSH recall/cost dial). Cost is linear in T; pair verification
    stays bucket-local in every table."""
    if n_planes is None:
        n_planes = adaptive_n_planes(embeddings.count())
    out = None
    for t in range(n_tables):
        pairs_t = _lsh_table_pairs(
            embeddings, dim, n_planes, threshold, id_col, vec_col,
            max_bucket_rows, salt="" if t == 0 else f"t{t}~",
        )
        out = pairs_t if out is None else out.unionByName(pairs_t)
    return out if n_tables == 1 else out.dropDuplicates(["id_a", "id_b"])


def ivf_centroids(
    embeddings: DataFrame, n_centroids: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse-quantizer seeds: the ``n_centroids`` rows with
    the smallest ids (a bounded collect — n rows, not the corpus).
    Refine with ``ivf_refine_centroids`` (deterministic k-means) before
    serving; seed selection is kept deterministic so the whole quantizer
    is oracle-reproducible in any engine."""
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col).limit(n_centroids).collect()
    )
    return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]


def ivf_centroids_hashed(
    embeddings: DataFrame, n_centroids: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Hash-stratified deterministic seeds: the ``n_centroids`` rows
    minimizing (h32(id), id) — a fixed pseudo-random sample of the id
    space. First-n-ids seeding (``ivf_centroids``) degrades when id
    order correlates with content (e.g. crawl order clusters near-dup
    pages at low ids): all seeds land in one region and refinement
    starts from collapsed cells. The hash order is content-blind,
    engine-portable (``('0x'||substr(md5(id::VARCHAR),1,8))::BIGINT``
    in an oracle), and still a bounded n-row collect. Seeds keep their
    original ids as cell ids — ties and probe order stay deterministic."""
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(h32(F.col(id_col).cast("string")), id_col)
        .limit(n_centroids).collect()
    )
    return sorted((int(r[0]), [float(x) for x in r[1]]) for r in rows)


def _np_centroid_arrays(centroids: list[tuple[int, list[float]]]):
    """Centroid matrix for the numpy kernels, SORTED ascending by cid so
    that first-min tie-breaks reproduce the (score, cid) struct order.
    Norms are computed with the same driver-side sequential left-fold the
    literal-tree form used (``math.sqrt(sum(x*x))`` — plain Python sum,
    identical IEEE result to the engine's list_dot_product fold)."""
    import math

    import numpy as np

    cs = sorted(((int(c), [float(x) for x in v]) for c, v in centroids))
    cids = np.array([c for c, _ in cs], dtype="int64")
    mat = np.array([v for _, v in cs], dtype="float64")
    cnorm = np.array(
        [math.sqrt(sum(x * x for x in v)) for _, v in cs], dtype="float64")
    return cids, mat, cnorm


def _np_rows(series):
    """(n, dim) float64 matrix from an Arrow/pandas column of vectors.
    float32 → float64 widening is exact, mirroring the plan-side
    ``cast("array<double>")``."""
    import numpy as np

    return np.stack(
        [np.asarray(v, dtype="float64") for v in series.to_numpy()])


def _np_fold_dots(V, C):
    """(n, k) dot products accumulated IN COORDINATE ORDER: one fused
    vectorized add per dimension, so every scalar sees the exact
    left-fold sequence ``((0 + v0·c0) + v1·c1) + …`` — bit-identical to
    the ``F.aggregate`` fold and the oracle's ``list_dot_product``,
    while numpy amortizes it across all rows (guide §4.2)."""
    import numpy as np

    acc = np.zeros((V.shape[0], C.shape[0]), dtype="float64")
    for d in range(V.shape[1]):
        acc += V[:, d : d + 1] * C[:, d][None, :]
    return acc


def _np_fold_norms(V):
    """Row norms via the same coordinate-order fold as :func:`norm`."""
    import numpy as np

    acc = np.zeros(V.shape[0], dtype="float64")
    for d in range(V.shape[1]):
        x = V[:, d]
        acc = acc + x * x
    return np.sqrt(acc)


def _np_fold_gram(V):
    """All-pairs dot matrix, coordinate-order fold (see _np_fold_dots)."""
    import numpy as np

    acc = np.zeros((V.shape[0], V.shape[0]), dtype="float64")
    for d in range(V.shape[1]):
        x = V[:, d]
        acc += x[:, None] * x[None, :]
    return acc


def ivf_refine_centroids(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    iters: int = 1,
    vec_col: str = "embedding",
    scale: int = 1 << 20,
    id_col: str = "vec_id",
    sample_mod: int | None = None,
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd (k-means) refinement of the IVF coarse
    quantizer: ``iters`` passes of shuffle-free nearest-centroid
    assignment → per-cell mean. Real IVF recall depends on this once the
    deterministic seeds land in unbalanced cells.

    Per-cell sums run over FIXED-POINT values (floor(x · 2^20) as bigint):
    integer addition is exact and order-independent, so the refined
    centroids are bit-identical under any partitioning AND reproducible
    by an oracle engine's SQL — a plain float sum would vary with Spark's
    partition-merge order and could flip assignments vs the oracle. The
    2^-20 quantization (~1e-6) is far below embedding precision. Each
    pass is ONE job: groupBy on ≤ n_centroids keys with map-side partial
    aggregation + a bounded (n_centroids × dim) collect — the k-means
    shape that holds at any corpus size. Empty cells keep their current
    centroid (deterministic degenerate-cell handling).

    ``sample_mod`` refines over the deterministic id-stratified sample
    ``id_col % sample_mod == 0`` instead of the full corpus: centroid
    MEANS are statistics, so a 1/m sample moves each refined centroid by
    O(1/sqrt(cell_n/m)) while cutting the refinement pass's scan and fold
    cost m×. The predicate is pure column algebra (pushes to the scan)
    and exactly reproducible by an oracle's WHERE clause — unlike
    rand()-based sampling, which no second engine can replay."""
    dim = len(centroids[0][1])
    src = embeddings
    if sample_mod is not None and sample_mod > 1:
        src = embeddings.filter(F.col(id_col) % sample_mod == 0)
    schema = ", ".join(["_cid long", "_n long"]
                       + [f"_s{d} long" for d in range(dim)])
    for _ in range(iters):
        # assignment + per-cell PARTIAL fixed-point sums inside one Arrow
        # kernel (guide §4.2): the old form compiled a (k × dim)-literal
        # fold tree per refine pass (~1 s of Catalyst/codegen alone) and
        # evaluated it row-at-a-time in interpreted HOF eval. The partial
        # sums are int64 — order-independent, so the merge agg below is
        # exact and the refined centroids stay bit-identical.
        cids, mat, cnorm = _np_centroid_arrays(centroids)
        fscale = float(scale)

        def part(batches, cids=cids, mat=mat, cnorm=cnorm):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                V = _np_rows(pdf[vec_col])
                S = _np_fold_dots(V, mat) / cnorm[None, :]
                cell = cids[np.argmax(S, axis=1)]
                Q = np.floor(V * fscale).astype("int64")
                order = np.argsort(cell, kind="stable")
                cs, starts = np.unique(cell[order], return_index=True)
                sums = np.add.reduceat(Q[order], starts, axis=0)
                ns = np.diff(np.append(starts, len(cell)))
                out = {"_cid": cs, "_n": ns.astype("int64")}
                for d in range(Q.shape[1]):
                    out[f"_s{d}"] = sums[:, d]
                yield pd.DataFrame(out)

        aggs = [F.sum("_n").alias("_n")] + [
            F.sum(f"_s{d}").alias(f"_s{d}") for d in range(dim)]
        rows = (
            src.select(vec_col).mapInPandas(part, schema)
            .groupBy("_cid").agg(*aggs).collect()
        )
        by_cid = {int(r["_cid"]): r for r in rows}
        centroids = [
            (cid,
             [(float(r[f"_s{d}"]) / r["_n"]) / scale for d in range(dim)]
             if (r := by_cid.get(cid)) is not None else cvec)
            for cid, cvec in centroids
        ]
    return centroids


def _ivf_scored_cells(vec: Column,
                      centroids: list[tuple[int, list[float]]]) -> Column:
    """Centroid ids sorted nearest-first for one row (cosine, ties to
    the smaller id) as pure column algebra: the centroid matrix rides
    into the plan as literals (no join, no shuffle — each row's scoring
    is embarrassingly parallel), sorted via array_sort over
    struct(-score, cid).

    ONE fold over the vector carrying all n_centroids running dot products
    as the accumulator (the round-3 shape ran one independent fold per
    centroid — n_centroids full vector traversals per row; the refinement
    pass made that the dominant cost of ann_ivf_topk). The centroid matrix
    rides in TRANSPOSED (per-coordinate rows), so centroid c's dot still
    accumulates coordinate 0,1,2,… in sequence — float addition order, and
    therefore every assignment, is bit-identical to the unfused form.
    Centroid norms are computed DRIVER-side with the same sequential
    left-fold an engine's list_dot_product performs (plain doubles →
    identical IEEE results), riding in as plain literals instead of
    n_centroids folded sqrt(dot(c,c)) expression trees. The ROW norm is
    deliberately absent: it is a common positive factor across all
    centroids, so ranking by dot/|c| equals ranking by full cosine."""
    import math

    n = len(centroids)
    dim = len(centroids[0][1])
    c_t = F.array(*[
        F.array(*[F.lit(float(centroids[j][1][i])) for j in range(n)])
        for i in range(dim)
    ])
    zero = F.array(*[F.lit(0.0).cast("double") for _ in range(n)])
    dots = F.aggregate(
        F.zip_with(vec, c_t, lambda x, crow: F.transform(crow, lambda w: x * w)),
        zero,
        lambda acc, contrib: F.zip_with(acc, contrib, lambda a, v: a + v),
    )
    meta = F.array(*[
        F.struct(
            F.lit(math.sqrt(sum(float(x) * float(x) for x in cvec))).alias("nm"),
            F.lit(int(cid)).cast("bigint").alias("cid"),
        )
        for cid, cvec in centroids
    ])
    scored = F.zip_with(
        dots, meta,
        lambda d, m: F.struct((-(d / m["nm"])).alias("nc"), m["cid"].alias("cid")),
    )
    return F.array_sort(scored)


def ivf_assign_col(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Nearest-centroid id for one row — see ``_ivf_scored_cells`` for
    the fused-fold execution shape and the cross-engine determinism
    argument."""
    return _ivf_scored_cells(vec, centroids)[0]["cid"]


def ivf_probe_cells_col(vec: Column,
                        centroids: list[tuple[int, list[float]]],
                        n_probe: int) -> Column:
    """The ``n_probe`` nearest centroid ids for one row as an
    array<bigint> — the multi-probe half of an IVF SEARCH (a stored row
    lives in exactly one cell; a query inspects several). Same fused
    fold and literal centroid matrix as ``ivf_assign_col``, so probe
    order is bit-identical to assignment order."""
    return F.transform(
        F.slice(_ivf_scored_cells(vec, centroids), 1, n_probe),
        lambda s: s["cid"],
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    n_centroids: int = 16,
    n_probe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: assign every row to its nearest coarse
    centroid, search only the ``n_probe`` centroid cells nearest the query,
    exact cosine + TakeOrdered inside the probed cells.

    The 100 TB shape: assignment is shuffle-free column algebra; the probe
    filter prunes the scan to ~n_probe/n_centroids of the corpus BEFORE any
    exact scoring (with the assignment persisted/partitioned by centroid_id
    it becomes directory-level pruning); the final top-k lowers to
    TakeOrdered — no global sort. Grow n_centroids ~ sqrt(N) to keep cells
    bounded; the centroid matrix stays a broadcast-sized literal table.
    Probe cells are chosen by the same (-cos, cid) order the assignment
    uses, computed driver-side over the collected centroid list with plain
    sequential double arithmetic — the same left-fold an engine's
    list_dot_product/F.aggregate performs, so an oracle reproduces it."""
    if centroids is None:
        centroids = ivf_centroids(embeddings, n_centroids, id_col, vec_col)

    import math

    def probe_score(c: list[float], q: list[float]) -> float:
        # dot/|c| — the query norm is constant across candidates, so the
        # ranking equals full cosine (mirrors ivf_assign_col's formula and
        # the oracle's, keeping the float arithmetic bit-identical)
        d = nc = 0.0
        for x, y in zip(c, q):
            d += x * y
            nc += x * x
        return d / math.sqrt(nc)

    probe_ids = [cid for cid, _ in sorted(
        centroids, key=lambda c: (-probe_score(c[1], query_vec), c[0]))[:n_probe]]

    # assignment + probe filter + exact cosine in ONE Arrow kernel with
    # coordinate-order folds (bit-identical to the F.aggregate form — see
    # _np_fold_dots); the literal-tree form paid ~1 s of plan compile for
    # the (k × dim) centroid matrix plus interpreted HOF eval per row.
    cids, mat, cnorm = _np_centroid_arrays(centroids)
    qv = [float(x) for x in query_vec]
    probe_set = list(probe_ids)

    def part(batches, cids=cids, mat=mat, cnorm=cnorm, qv=qv):
        import numpy as np
        import pandas as pd

        q = np.array(qv, dtype="float64")
        qnorm = _np_fold_norms(q[None, :])[0]
        for pdf in batches:
            if not len(pdf):
                continue
            V = _np_rows(pdf[vec_col])
            S = _np_fold_dots(V, mat) / cnorm[None, :]
            cell = cids[np.argmax(S, axis=1)]
            m = np.isin(cell, probe_set)
            if not m.any():
                continue
            Vm = V[m]
            cos = _np_fold_dots(Vm, q[None, :])[:, 0] / (
                _np_fold_norms(Vm) * qnorm)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy()[m],
                "centroid_id": cell[m],
                "_cos_raw": cos,
            })

    return (
        embeddings.select(id_col, vec_col)
        .mapInPandas(part, f"{id_col} long, centroid_id long, _cos_raw double")
        .orderBy(F.col("_cos_raw").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "centroid_id", F.round("_cos_raw", 6).alias("cos_sim"))
    )


def knn_join_pandas(
    embeddings: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectorized (numpy via Arrow) batch kNN for a broadcast query set —
    the Pandas-UDF path for when the query side is a small matrix and the
    base side is huge: each partition computes a local top-k against the
    broadcast matrix; a final groupBy merges per-query top-k."""
    import numpy as np
    from pyspark.sql import types as Ty

    spark = embeddings.sparkSession
    qids = [q[0] for q in queries]
    qmat = np.array([q[1] for q in queries], dtype="float64")
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, qmat))

    schema = Ty.StructType([
        Ty.StructField("query_id", Ty.LongType()),
        Ty.StructField(id_col, Ty.LongType()),
        Ty.StructField("cos_sim", Ty.DoubleType()),
    ])

    def part(batches):
        import pandas as pd

        qids_, qmat_ = bc.value
        for pdf in batches:
            base = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            base /= np.linalg.norm(base, axis=1, keepdims=True)
            sims = qmat_ @ base.T  # (nq, nbase)
            rows = []
            top = min(k, sims.shape[1])
            for qi, qid in enumerate(qids_):
                idx = np.argpartition(-sims[qi], top - 1)[:top]
                for j in idx:
                    rows.append((qid, int(pdf[id_col].iloc[j]), round(float(sims[qi, j]), 6)))
            yield pd.DataFrame(rows, columns=["query_id", id_col, "cos_sim"])

    local = embeddings.select(id_col, vec_col).mapInPandas(part, schema)
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        local.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def label_spread(
    embeddings: DataFrame,
    k: int = 5,
    mask_mod: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """One round of semi-supervised kNN label propagation: vectors with
    ``id % mask_mod == 0`` are treated as UNLABELED; each receives the
    majority label among its ``k`` nearest LABELED neighbors by cosine
    (neighbor rank: cos desc, id asc; vote winner: votes desc, label
    asc — fully deterministic). Returns ``(vec_id, true_label,
    pred_label, votes)`` with the held-out true label riding along, so
    the result doubles as a transductive-accuracy report — the
    pseudo-labeling step a weakly-supervised curation pipeline runs to
    extend a small labeled seed set over the corpus.

    Execution reuses ``knn_join_pandas`` — broadcast query matrix,
    partition-local numpy top-k, window merge — so the labeled corpus
    never shuffles for the search. The query side is COLLECTED
    (bounded by the mask for this exact baseline); at corpus scale use
    ``label_spread_bucketed`` — IVF-bucketed candidates feeding the same
    vote tail with no corpus-proportional collect, trading cell-boundary
    recall for a bounded candidate set — same trade as the dedup family.
    """
    unl = embeddings.filter(F.col(id_col) % mask_mod == 0)
    lab = embeddings.filter(F.col(id_col) % mask_mod != 0)
    queries = [(r[0], list(r[1])) for r in
               unl.select(id_col, vec_col).collect()]
    return _label_spread_tail(
        knn_join_pandas(lab, queries, k=k, id_col=id_col, vec_col=vec_col),
        lab, unl, id_col, label_col)


def _label_spread_tail(nn: DataFrame, lab: DataFrame, unl: DataFrame,
                       id_col: str, label_col: str) -> DataFrame:
    """Shared vote tail: (query_id, neighbor id) pairs → majority label
    per query (votes desc, label asc), held-out true label joined back.
    Both the exact and the bucketed candidate generators feed this."""
    votes = (
        nn.join(lab.select(id_col, label_col), id_col)
        .groupBy("query_id", label_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col(label_col))
    winner = votes.withColumn("_r", F.row_number().over(w)).filter("_r = 1")
    return (
        winner.join(
            unl.select(F.col(id_col).alias("query_id"),
                       F.col(label_col).alias("true_label")),
            "query_id")
        .select(
            F.col("query_id").alias(id_col),
            F.col("true_label").cast("bigint").alias("true_label"),
            F.col(label_col).cast("bigint").alias("pred_label"),
            "votes",
        )
    )


def label_spread_bucketed(
    embeddings: DataFrame,
    k: int = 5,
    mask_mod: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    refine_iters: int = 0,
    sample_mod: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """``label_spread`` with NO corpus-proportional driver collect — the
    scale path. The exact form collects every unlabeled vector to the
    driver (1/mask_mod of the corpus: fine as a baseline, fatal at
    10^12 docs); here candidate generation is IVF-bucketed instead:

    1. coarse quantizer: ``n_centroids`` hash-stratified seed rows
       (bounded collect) + optional deterministic k-means refinement —
       the ``ann_ivf_topk`` machinery;
    2. every LABELED row is assigned to its one nearest cell, every
       UNLABELED row probes its ``n_probe`` nearest cells (both pure
       column algebra, no shuffle);
    3. candidates meet in a join SHUFFLED ON THE CELL ID — per-cell
       work is |cell|·|probes into it|, never all-pairs, and the only
       shuffle key is the bounded cell id;
    4. exact cosine (sequential-fold column algebra, rounded to 6 — the
       cross-engine rank key) + per-query top-k window + the shared
       majority-vote tail (``_label_spread_tail``).

    Trades recall at cell boundaries (a true neighbor whose cell the
    query didn't probe is missed — dial ``n_probe`` up) for bounded,
    fully distributed work; precision is exact since every candidate is
    cosine-verified. Same output schema as ``label_spread``, so the two
    diff directly (pinned by pytest on a skewed fixture)."""
    cent = ivf_centroids_hashed(embeddings, n_centroids, id_col, vec_col)
    if refine_iters:
        cent = ivf_refine_centroids(
            embeddings, cent, iters=refine_iters, vec_col=vec_col,
            id_col=id_col, sample_mod=sample_mod)
    # Each side is normalized ONCE before the join (per-pair cosine is a
    # single dot of unit vectors — norms cost O(rows), not O(pairs)), and
    # assignment/probing + the per-pair dot run in Arrow kernels with
    # coordinate-order folds: bit-identical IEEE values to the
    # F.aggregate form (see _np_fold_dots), minus the ~1 s literal-tree
    # compile and the interpreted per-row HOF eval. The oracle mirrors
    # the same normalize-then-dot arithmetic.
    cids, mat, cnorm = _np_centroid_arrays(cent)

    def assign_part(batches, cids=cids, mat=mat, cnorm=cnorm):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = _np_rows(pdf[vec_col])
            S = _np_fold_dots(V, mat) / cnorm[None, :]
            yield pd.DataFrame({
                "_nid": pdf[id_col].to_numpy(),
                "_nv": list(V / _np_fold_norms(V)[:, None]),
                "_cell": cids[np.argmax(S, axis=1)],
            })

    def probe_part(batches, cids=cids, mat=mat, cnorm=cnorm,
                   n_probe=n_probe):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = _np_rows(pdf[vec_col])
            S = _np_fold_dots(V, mat) / cnorm[None, :]
            # stable argsort on -S = (score desc, cid asc) — the probe
            # order of ivf_probe_cells_col (columns ride cid-ascending)
            probes = cids[np.argsort(-S, axis=1, kind="stable")[:, :n_probe]]
            n, p = probes.shape
            yield pd.DataFrame({
                "query_id": np.repeat(pdf[id_col].to_numpy(), p),
                "_qv": list(np.repeat(V / _np_fold_norms(V)[:, None],
                                      p, axis=0)),
                "_cell": probes.ravel(),
            })

    unl = embeddings.filter(F.col(id_col) % mask_mod == 0)
    lab = embeddings.filter(F.col(id_col) % mask_mod != 0)
    lab_cells = lab.select(id_col, vec_col).mapInPandas(
        assign_part, "_nid long, _nv array<double>, _cell long")
    unl_cells = unl.select(id_col, vec_col).mapInPandas(
        probe_part, "query_id long, _qv array<double>, _cell long")

    def cell_cos(left, right):
        # one call per cell: left = this cell's probes (query_id, _qv),
        # right = its labeled residents (_nid, _nv). Pair cosines via
        # the same coordinate-ascending fold as the per-pair-row form
        # (acc += Q[qi, d] * N[ni, d] runs the identical multiply/add
        # per pair in the identical order — bit-equal IEEE results).
        import numpy as np
        import pandas as pd

        if not len(left) or not len(right):
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 "_nid": pd.Series([], dtype="int64"),
                 "_cos_raw": pd.Series([], dtype="float64")})
        Q = _np_rows(left["_qv"])
        N = _np_rows(right["_nv"])
        nq, nl = len(left), len(right)
        qi = np.repeat(np.arange(nq), nl)
        ni = np.tile(np.arange(nl), nq)
        acc = np.zeros(nq * nl, dtype="float64")
        for d in range(Q.shape[1]):
            acc += Q[qi, d] * N[ni, d]
        return pd.DataFrame({
            "query_id": left["query_id"].to_numpy()[qi],
            "_nid": right["_nid"].to_numpy()[ni],
            "_cos_raw": acc,
        })

    # a labeled row lives in exactly ONE cell and a query probes n_probe
    # DISTINCT cells, so (query_id, _nid) pairs are join-unique — no
    # dedup needed before the top-k window. COGROUPED per-cell kernel
    # rather than join-then-map: the join materialized BOTH unit vectors
    # on every candidate pair through the Arrow boundary (|pairs| · 2d
    # doubles — ~1 GB at bench scale); cogrouping ships each vector
    # once per (row, probed cell) and the pairs exist only inside numpy.
    nn = (
        unl_cells.groupBy("_cell")
        .cogroup(lab_cells.groupBy("_cell"))
        .applyInPandas(cell_cos, "query_id long, _nid long, _cos_raw double")
        .select(
            "query_id",
            F.col("_nid").alias(id_col),
            F.round("_cos_raw", 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col))
    topk = (nn.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn", "cos_sim"))
    return _label_spread_tail(topk, lab, unl, id_col, label_col)


def semantic_dedup(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster the embedding
    space with the deterministic k-means quantizer, compare pairs ONLY
    within a cluster, and of every pair above the cosine ``threshold``
    keep the member FARTHER from its centroid (the paper's keep-low-
    centroid-similarity rule — the "semantic outlier" is the better
    cluster representative; its near-twin closer to the centroid is the
    redundant copy). Returns every row as
    ``(vec_id, cell, cos_centroid, kept)`` with ``kept`` 0/1.

    Drop rule, exactly: a row is dropped iff SOME same-cell neighbor
    within ``threshold`` has strictly lower cosine-to-centroid (ties:
    lower id). For a mutually-similar clique this keeps exactly the
    clique's minimal-cos_centroid member; across non-transitive chains
    it is the pairwise-dominance approximation — deterministic,
    single-pass, and engine-portable, where the paper's per-group argmin
    would need an iterative clustering no SQL oracle could replay.

    Scale shape: the quantizer rides in as plan literals (one fused
    fold per row — see ``_ivf_scored_cells``; no join for assignment),
    so the only shuffles are the cell-keyed self-join — the whole point
    of SemDeDup is that pair generation is cluster-scoped, n²/k per
    cell instead of n² — and a small distinct on the dropped ids. The
    cos-to-centroid reuses the assignment fold's dot product (score/|v|)
    rather than recomputing against a joined centroid column.

    Reference parity note: the reference has no embedding surface
    (/root/reference/ ingests structured NVD/MITRE records); this
    operator belongs to the web-scale graft's dedup family alongside
    ``lsh_bucketed_pairs`` (probabilistic recall dial) — SemDeDup is
    the exact-within-cluster alternative every LLM-corpus pipeline
    pairs with token-level dedup.
    """
    # Execution (optimization round 6): assignment + cos-to-centroid run
    # in an Arrow kernel with coordinate-order folds (bit-identical to
    # the F.aggregate form — see _np_fold_dots; the literal centroid
    # tree cost ~1 s of Catalyst compile + interpreted HOF eval), and
    # the within-cell pair stage is a grouped Arrow kernel: each cell's
    # rows are shipped ONCE (the self-join shipped both sides) and the
    # n²/k-pair cosine matrix is one coordinate-order Gram fold — same
    # IEEE values as the per-pair fold, numpy-amortized (guide §4.2).
    # cosine(a,b) = dot(a,b)/(|a|·|b|) with the SAME row-norm values,
    # and cos-to-centroid keeps the exact (dot/|c|)/|v| parenthesization
    # the oracle mirrors token for token.
    cids, mat, cnorm = _np_centroid_arrays(centroids)
    thr = float(threshold)

    def scored_part(full):
        def gen(batches, cids=cids, mat=mat, cnorm=cnorm):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                V = _np_rows(pdf[vec_col])
                S = _np_fold_dots(V, mat) / cnorm[None, :]
                j = np.argmax(S, axis=1)
                vnorm = _np_fold_norms(V)
                out = {
                    "vec_id": pdf[id_col].to_numpy(),
                    "cell": cids[j],
                    "_cosc": S[np.arange(len(j)), j] / vnorm,
                }
                if full:
                    out["_nm"] = vnorm
                    out["_v"] = list(V)
                yield pd.DataFrame(out)

        return gen

    src = embeddings.select(id_col, vec_col)
    scored = src.mapInPandas(
        scored_part(True),
        "vec_id long, cell long, _cosc double, _nm double, _v array<double>",
    )
    # the output path re-runs the (cheap) kernel without _v/_nm so the
    # heavy vector column never crosses the Arrow boundary twice
    scored_lite = src.mapInPandas(
        scored_part(False), "vec_id long, cell long, _cosc double")

    def cell_part(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["vec_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"vec_id": ids[:0]})
        V = _np_rows(pdf["_v"])
        nm = pdf["_nm"].to_numpy()
        cosc = pdf["_cosc"].to_numpy()
        sim = _np_fold_gram(V) / np.outer(nm, nm)
        # dom[a, b]: b strictly dominates a (closer to the centroid,
        # ties to the smaller id) — the SemDeDup keep-farthest rule
        dom = (cosc[None, :] < cosc[:, None]) | (
            (cosc[None, :] == cosc[:, None]) & (ids[None, :] < ids[:, None])
        )
        drop = ((sim >= thr) & dom).any(axis=1)
        return pd.DataFrame({"vec_id": ids[drop]})

    dropped = (
        scored.groupBy("cell").applyInPandas(cell_part, "vec_id long")
        .withColumn("_d", F.lit(1))
    )
    # dropped is bounded by the corpus's duplicate count and tiny next
    # to `scored`; broadcasting it turns the join-back from a sort-merge
    # (one more full shuffle of every row) into a map-side hash probe
    return scored_lite.join(
        F.broadcast(dropped), "vec_id", "left"
    ).select(
        "vec_id",
        F.col("cell").cast("bigint").alias("cell"),
        F.round(F.col("_cosc"), 6).alias("cos_centroid"),
        F.col("_d").isNull().cast("bigint").alias("kept"),
    )
