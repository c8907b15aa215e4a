"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — brute-force scan: one projection (higher-order dot
  product, JVM-side) + a top-k. The baseline, and the verifier for the
  bucketed path.
* ``lsh_bucket_topk`` — random-hyperplane LSH: 2^P sign-pattern buckets; the
  query probes its own bucket plus (``probe_bits``-flip) neighbors. At 100 TB
  the bucket id is the partition key, so a query touches a handful of
  partitions instead of the corpus (IVF-style).
* ``cosine_pairs_above`` — all near-dup pairs by cosine ≥ τ. The scale path
  is **banded** LSH: B bands of r planes each; a pair is a candidate if it
  matches exactly in ANY band (union over bands), then every candidate is
  verified with the exact cosine. Detection probability at similarity s with
  bit-agreement p = 1 − θ(s)/π is ``1 − (1 − p^r)^B`` — the defaults
  (B=16, r=4) give ≥0.999 recall at cosine 0.8 and ≈0.91 at 0.35 (measured
  against the brute-force path by tools/recall_report.py). Raise r (and B)
  together to cut candidate volume at corpus scale; the tradeoff is explicit
  and the exact verify keeps precision at 1.0 regardless.

Hyperplanes are fixed constants derived from numpy RandomState(42) — shared
with the oracle-SQL generator so both engines compute identical buckets; the
banded planes are the first B·r planes of the same stream, so the legacy
8-plane single-table bucket (``with_lsh_bucket``) is bands 0–1 of it.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame, functions as F

LSH_PLANES_SEED = 42
LSH_N_PLANES = 8
EMBED_DIM = 64
LSH_BANDS = 24      # banded near-dup: bands of ...
LSH_ROWS = 4        # ... r planes each; P[pair caught] = 1-(1-p^r)^B
# B=24 closes the low-similarity recall tail: at cosine 0.35 the per-plane
# agreement is p = 1-θ/π ≈ 0.613, so analytic recall 1-(1-p^4)^B goes
# 0.912 (B=16, measured 0.941) → 0.974 (B=24); measured + candidate-volume
# growth are tracked by tools/recall_report.py (VERDICT r2 #5). The cost is
# linear: 1.5× band entries into the candidate join, verify stays exact.


def lsh_planes(n_planes: int = LSH_N_PLANES, dim: int = EMBED_DIM) -> List[List[float]]:
    import numpy as np
    rs = np.random.RandomState(LSH_PLANES_SEED)
    return [[float(x) for x in rs.standard_normal(dim)] for _ in range(n_planes)]


def _lit_array(values: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in values])


def dot(vec: Column, const: Sequence[float]) -> Column:
    """Σ vec[i]·const[i], left-to-right in double precision (matches the
    oracle's list_sum(list_transform(...)) evaluation order)."""
    return F.aggregate(
        F.zip_with(vec.cast("array<double>"), _lit_array(const), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)


def norm(vec: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.zip_with(vec.cast("array<double>"), vec.cast("array<double>"),
                   lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine_to_const(vec: Column, query: Sequence[float]) -> Column:
    import math
    qn = math.sqrt(sum(v * v for v in query))
    return dot(vec, query) / (norm(vec) * F.lit(qn))


def bucket_expr(vec: Column, planes: List[List[float]]) -> Column:
    """Sign-pattern bucket id, e.g. '10110010' for 8 planes."""
    bits = [F.when(dot(vec, p) > 0, F.lit("1")).otherwise(F.lit("0"))
            for p in planes]
    return F.concat(*bits)


def bucket_of(query: Sequence[float], planes: List[List[float]]) -> str:
    return "".join(
        "1" if sum(q * c for q, c in zip(query, p)) > 0 else "0" for p in planes)


IVF_CELLS = 16
IVF_NPROBE = 2


def ivf_assignments(df: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    n_cells: int = IVF_CELLS) -> DataFrame:
    """IVF coarse quantization: (id, cell) where cell = the centroid with
    the highest cosine (ties → smallest cell id). Centroids are the
    ``n_cells`` SMALLEST-id vectors — a deterministic, data-derived rule
    both engines express regardless of the id range (a trained k-means
    codebook would slot in the same way; the POINT of the structure is
    that at 100 TB the cell is the partition key and a query touches
    nprobe cells instead of the corpus)."""
    from pyspark.sql import Window
    cent = (df.orderBy(F.col(id_col)).limit(n_cells)
            .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cv"),
                    norm(F.col(vec_col)).alias("cnrm")))
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                     norm(F.col(vec_col)).alias("nrm"))
    dotprod = F.aggregate(
        F.zip_with(F.col("v").cast("array<double>"),
                   F.col("cv").cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    scored = (base.crossJoin(F.broadcast(cent))
              .select("id", "cell",
                      F.round(dotprod / (F.col("nrm") * F.col("cnrm")), 6)
                       .alias("ccos")))
    w = Window.partitionBy("id").orderBy(F.col("ccos").desc(), F.col("cell"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1).select("id", "cell"))


def ivf_topk(df: DataFrame, query: Sequence[float], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_cells: int = IVF_CELLS, nprobe: int = IVF_NPROBE) -> DataFrame:
    """IVF search: score the query against the ``n_cells`` centroids, probe
    the ``nprobe`` best cells, brute-force within. Recall is nprobe-tunable;
    the scan is bounded by the probed cells' population."""
    import math
    assigns = ivf_assignments(df, id_col, vec_col, n_cells)
    cents = {r["c"]: list(r["cv"]) for r in
             (df.orderBy(F.col(id_col)).limit(n_cells)
              .select(F.col(id_col).alias("c"), F.col(vec_col).alias("cv"))
              .collect())}
    qn = math.sqrt(sum(v * v for v in query))

    def cos(cv):
        # HALF_UP on the shortest-repr decimal — the same rounding F.round
        # applies engine-side (and the oracle's ROUND), NOT Python's
        # banker's round(): an exact tie at the 6th decimal must rank the
        # probe cells identically in all three places
        from decimal import ROUND_HALF_UP, Decimal
        cn = math.sqrt(sum(v * v for v in cv))
        raw = sum(a * b for a, b in zip(query, cv)) / (qn * cn)
        return float(Decimal(repr(raw)).quantize(Decimal("1e-6"),
                                                 rounding=ROUND_HALF_UP))
    probed = [c for c, _ in sorted(((c, cos(cv)) for c, cv in cents.items()),
                                   key=lambda t: (-t[1], t[0]))[:nprobe]]
    probed_assigns = assigns.filter(F.col("cell").isin(probed))
    cand = df.join(probed_assigns, df[id_col] == probed_assigns["id"],
                   "left_semi")
    return cosine_topk(cand, query, k, id_col, vec_col)


def cosine_topk(df: DataFrame, query: Sequence[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    scored = df.select(
        F.col(id_col),
        F.round(cosine_to_const(F.col(vec_col), query), 6).alias("score"))
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def probe_buckets(query: Sequence[float], planes: List[List[float]],
                  probe_bits: int = 0) -> List[str]:
    """The query's own bucket plus all buckets within Hamming ≤ probe_bits
    (multi-probe: the standard recall knob that avoids adding tables)."""
    from itertools import combinations
    home = bucket_of(query, planes)
    out = {home}
    flip = {"0": "1", "1": "0"}
    for r in range(1, min(probe_bits, len(home)) + 1):
        for idxs in combinations(range(len(home)), r):
            b = list(home)
            for i in idxs:
                b[i] = flip[b[i]]
            out.add("".join(b))
    return sorted(out)


def lsh_bucket_topk(df: DataFrame, query: Sequence[float], k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    planes: List[List[float]] | None = None,
                    probe_bits: int = 0) -> DataFrame:
    """Top-k within the query's LSH bucket(s). ``probe_bits=1`` probes the
    P one-bit-flip neighbor buckets too — at scale each bucket is a partition,
    so this reads P+1 partitions instead of 1, for a large recall gain."""
    planes = planes or lsh_planes()
    probes = probe_buckets(query, planes, probe_bits)
    candidates = df.filter(bucket_expr(F.col(vec_col), planes).isin(probes))
    return cosine_topk(candidates, query, k, id_col, vec_col)


def with_lsh_bucket(df: DataFrame, vec_col: str = "embedding",
                    planes: List[List[float]] | None = None) -> DataFrame:
    return df.withColumn("lsh_bucket", bucket_expr(F.col(vec_col), planes or lsh_planes()))


def banded_sig_expr(vec: Column, bands: int = LSH_BANDS,
                    rows: int = LSH_ROWS) -> Column:
    """All bands·rows sign bits as one string (bucket of band b = chars
    [b·rows, (b+1)·rows)). Computed once per vector, sliced per band."""
    return bucket_expr(vec, lsh_planes(bands * rows))


def _explode_bands(sig_df: DataFrame, bands: int, rows: int) -> DataFrame:
    """(id, sig) → (id, band, bucket) via ONE explode (a bands-way union
    would recompute the sig lineage per branch)."""
    return (sig_df.select("id", F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.substring("sig", b * rows + 1, rows).alias("bucket"))
        for b in range(bands)])).alias("bb"))
        .select("id", "bb.band", "bb.bucket"))


def banded_buckets(df: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding", bands: int = LSH_BANDS,
                   rows: int = LSH_ROWS) -> DataFrame:
    """(id, band, bucket) for every vector — the SAME banded layout
    cosine_pairs_above joins on (single source of truth; guard telemetry
    counts exactly the buckets the join would use)."""
    sig = df.select(F.col(id_col).alias("id"),
                    banded_sig_expr(F.col(vec_col), bands, rows).alias("sig"))
    return _explode_bands(sig, bands, rows)


LSH_TARGET_BUCKET = 32  # aimed-for mean bucket population per band
LSH_MAX_ROWS = 24       # plane-stream budget cap (24 bands × 24 rows planes)


def auto_rows(n_vectors: int, target_bucket: int = LSH_TARGET_BUCKET,
              floor: int = LSH_ROWS, cap: int = LSH_MAX_ROWS) -> int:
    """Planes-per-band for a corpus of ``n_vectors`` — the scaling rule the
    200k-vector soak pinned (BENCH/BASELINE.md): a band has 2^rows buckets,
    so rows must grow ~log₂(N / target bucket population) or every bucket
    degenerates to ~N/2^rows vectors and the guard (correctly) drops them
    all. floor=4 keeps the small-N layout at the 24×4 oracle pin; the cap
    bounds the plane-stream budget (2^24 buckets per band is already far
    beyond any bucket-population concern)."""
    import math
    if n_vectors <= target_bucket:
        return floor
    return min(cap, max(floor, math.ceil(math.log2(n_vectors / target_bucket))))


def _lsh_base_plan(df: DataFrame, id_col: str, vec_col: str,
                   bands: int, rows: int) -> DataFrame:
    """(id, v, nrm, sig) — THE plan cosine_pairs_above caches under the
    ``embed_lsh_base`` slot. Single source of truth: any consumer that
    wants to share that cache (guard telemetry) must build this exact
    shape, or sameSemantics cannot match and the 96-plane sign
    computation silently runs twice in a combined run."""
    from .dedup import _ensure_parallelism
    base = _ensure_parallelism(df).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("nrm"))
    return base.withColumn("sig", banded_sig_expr(F.col("v"), bands, rows))


def banded_buckets_shared(df: DataFrame, id_col: str = "vec_id",
                          vec_col: str = "embedding", bands: int = LSH_BANDS,
                          rows: int = LSH_ROWS) -> DataFrame:
    """(id, band, bucket) derived from the ``embed_lsh_base`` cache slot
    when a cosine_pairs_above run already populated it (opportunistic —
    a standalone telemetry run computes the signatures fresh WITHOUT
    paying a persist; see dedup._cache_slot_peek). Values are identical
    to banded_buckets: both slice the same banded_sig_expr string."""
    from .dedup import _cache_slot_peek
    base = _cache_slot_peek(
        "embed_lsh_base", _lsh_base_plan(df, id_col, vec_col, bands, rows))
    return _explode_bands(base.select("id", "sig"), bands, rows)


def candidate_pairs_from_banded(banded: DataFrame,
                                max_bucket: int | None = None) -> DataFrame:
    """Distinct (id_a, id_b) candidates from a (id, band, bucket) table —
    THE candidate join cosine_pairs_above verifies, exposed as one
    function so telemetry (tools/recall_report.py) counts exactly the
    production join instead of maintaining a hand-copied twin that can
    drift (e.g. if the guard default changes here)."""
    if max_bucket is not None:
        hot = (banded.groupBy("band", "bucket")
               .agg(F.count("*").alias("bsz"))
               .filter(F.col("bsz") > max_bucket).select("band", "bucket"))
        banded = banded.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
    ca, cb = banded.alias("ca"), banded.alias("cb")
    return (ca.join(cb, (F.col("ca.band") == F.col("cb.band"))
                    & (F.col("ca.bucket") == F.col("cb.bucket"))
                    & (F.col("ca.id") < F.col("cb.id")))
            .select(F.col("ca.id").alias("id_a"), F.col("cb.id").alias("id_b"))
            .distinct())


def cosine_pairs_above(df: DataFrame, threshold: float = 0.95,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       bucketed: bool = True, bands: int = LSH_BANDS,
                       rows: int | None = None,
                       max_bucket: int | None = None) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ threshold.

    ``bucketed=True`` (the scale path) generates candidates from a banded
    hyperplane LSH — docs agreeing exactly on any band of ``rows`` sign bits
    — then verifies every candidate with the exact cosine, so precision is
    1.0 and recall is 1-(1-p^rows)^bands. ``bucketed=False`` is the exact
    all-pairs small-N path (the oracle for the banded one).

    ``rows=None`` (default) SELF-SCALES the layout: one metadata count of
    the corpus feeds ``auto_rows`` (rows ≈ log₂(N / target bucket
    population)), so a caller at 200k vectors gets r≥12 instead of the
    degenerate 16-buckets-per-band small-N layout (the round-3 soak's
    manual override, now automatic). Pass rows explicitly to pin a layout
    — auto equals the 24×4 oracle pin only up to N = 2⁴·32 = 512 vectors,
    so oracle-compared callers (the driver queries) pass rows=LSH_ROWS.

    ``max_bucket`` (scale guard, off by default) drops band-buckets holding
    more than that many vectors before the self-join — a degenerate bucket
    of B vectors costs B² join rows; mirrors max_df in ngram_jaccard_pairs.
    """
    from .dedup import _ensure_parallelism
    dotprod = F.aggregate(
        F.zip_with(F.col("a.v").cast("array<double>"),
                   F.col("b.v").cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    verify = lambda pairs_ab: (  # noqa: E731 — shared exact-cosine verify
        pairs_ab.select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                        F.round(dotprod / (F.col("a.nrm") * F.col("b.nrm")), 6)
                         .alias("cosine"))
                .filter(F.col("cosine") >= threshold))
    if not bucketed:
        base = _ensure_parallelism(df).select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
            norm(F.col(vec_col)).alias("nrm"))
        a, b = base.alias("a"), base.alias("b")
        return verify(a.join(b, F.col("a.id") < F.col("b.id")))

    if rows is None:
        # self-scaling layout: ONE metadata count (parquet footer statistics
        # — no scan) picks rows ≈ log₂(N / target bucket population); the
        # chosen layout is logged so callers can see (and later pin) what
        # the auto path selected — it determines the candidate set (ADVICE r4)
        import logging
        n = df.count()
        rows = auto_rows(n)
        logging.getLogger(__name__).info(
            "cosine_pairs_above auto layout: n=%d -> bands=%d rows=%d",
            n, bands, rows)

    # sign bits for all bands·rows planes computed once; cached because the
    # candidate join consumes the banded table twice and the verify join
    # consumes base twice (bounded slot, see dedup._cache_slot). The plan
    # is built by _lsh_base_plan so guard telemetry can share the slot.
    from .dedup import _cache_slot
    base = _cache_slot(
        "embed_lsh_base", _lsh_base_plan(df, id_col, vec_col, bands, rows))
    banded = _explode_bands(base.select("id", "sig"), bands, rows)
    cand = candidate_pairs_from_banded(banded, max_bucket)
    a = base.select(F.col("id"), F.col("v"), F.col("nrm")).alias("a")
    b = base.select(F.col("id"), F.col("v"), F.col("nrm")).alias("b")
    pairs_ab = (cand.join(a, cand.id_a == F.col("a.id"))
                    .join(b, cand.id_b == F.col("b.id")))
    return verify(pairs_ab)
