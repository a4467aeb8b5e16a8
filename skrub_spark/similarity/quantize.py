"""Int8 scalar quantization AND product quantization for embedding
columns (beyond-reference LLM-pipeline operators, SURVEY.md §2).

A 100 TB embedding store at float32 is 4x the bytes of uint8 codes;
scalar (per-dimension min/max) quantization is the standard first
rung of vector compression (FAISS's ScalarQuantizer / SQ8): dimension
``i`` maps linearly from ``[lo_i, hi_i]`` onto ``{0..255}``, and
similarity search runs over the DEQUANTIZED codes with bounded error
(per-dim reconstruction error <= span_i/510 + float eps).

Product quantization (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011 — FAISS's PQ) is the next rung
(r7): split each vector into ``n_subspaces`` contiguous slices,
k-means each subspace into ``n_codes`` codewords, store only the
per-subspace code indices — ``n_subspaces * log2(n_codes)`` bits per
vector (8 subspaces x 32 codes over dim-64 float32 = 5 bytes vs 256:
51x) — and rank with asymmetric-distance lookup tables (one
``n_codes``-entry table per subspace per query; scoring a vector is
``n_subspaces`` table lookups, no float vector ever read).

Everything is engine-portable integer/double arithmetic, so a SQL
oracle replays fit -> quantize -> dequantize -> cosine top-k exactly
(battery query ``topk_quantized``):

- fit: one posexplode + groupBy(dim) min/max — map-side partial
  aggregation shuffles at most dim x partitions tiny rows, and the
  collect is dim-bounded (corpus-independent).
- quantize/dequantize: pure per-row Column expressions (map-only).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def fit_scalar_quantizer(
    df: DataFrame, vec_col: str = "embedding"
) -> dict:
    """Per-dimension ``{"lo": [...], "hi": [...]}`` over the corpus.

    One shuffle of (dim, partial-min, partial-max) — never the
    vectors; the driver collect is ``dim`` rows."""
    mm = (
        df.select(F.posexplode(vec_col).alias("dim", "__x"))
        .groupBy("dim")
        .agg(F.min("__x").alias("lo"), F.max("__x").alias("hi"))
        .orderBy("dim")
        .collect()
    )
    if not mm:
        raise ValueError("cannot fit a quantizer on an empty frame")
    if [r["dim"] for r in mm] != list(range(len(mm))):
        raise ValueError("ragged embedding dimensions")
    return {
        "lo": [float(r["lo"]) for r in mm],
        "hi": [float(r["hi"]) for r in mm],
    }


def _dlit(v: float) -> str:
    """SQL text for an exact double literal: a string cast parses via
    Double.parseDouble, so round-tripping ``repr(float)`` (shortest
    form) reproduces the identical IEEE value — no decimal-literal
    type inference in between."""
    return f"CAST('{float(v)!r}' AS DOUBLE)"


def _lo_arr(q: dict) -> Column:
    # ONE parsed expr string instead of a dim-length F.lit loop: each
    # py4j Column call costs ~5-15 ms of driver round-trip, so a
    # 64-dim literal array built in Python costs ~1 s of pure driver
    # chatter per query BUILD (measured r12-opt) vs ~1 ms parsed.
    return F.expr("array(" + ",".join(_dlit(v) for v in q["lo"]) + ")")


def _span_arr(q: dict) -> Column:
    return F.expr(
        "array("
        + ",".join(
            f"{_dlit(h)} - {_dlit(l)}" for l, h in zip(q["lo"], q["hi"])
        )
        + ")"
    )


def quantize_embeddings(
    df: DataFrame,
    quantizer: dict,
    vec_col: str = "embedding",
    code_col: str = "codes",
) -> DataFrame:
    """Adds ``code_col``: array<int> of codes in [0, 255];
    ``code = round((x - lo) * 255 / (hi - lo))``, 0 for constant
    dims. Map-only; the formula is spelled identically in the DuckDB
    oracle, so codes are bit-replayable.

    Built as two ``zip_with`` passes over hoisted literal arrays —
    an ``element_at(array(<dim literals>), i)`` per lambda use would
    replicate the dim-sized literal array across every dimension of
    the expression tree (the same plan-size trap the ANN index's
    Arrow UDFs avoid; it cost 9s/probe at dim=64 before hoisting)."""
    shifted = F.zip_with(
        F.col(vec_col),
        _lo_arr(quantizer),
        lambda x, lo: x.cast("double") - lo,
    )
    i_codes = F.zip_with(
        shifted,
        _span_arr(quantizer),
        lambda d, s: F.when(s == 0.0, F.lit(0)).otherwise(
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0), F.round(d * 255.0 / s).cast("int")
                ),
            )
        ),
    )
    return df.withColumn(code_col, i_codes)


def dequantize_expr(quantizer: dict, code_col: str = "codes") -> Column:
    """array<double> reconstruction:
    ``x_hat = lo + code * (hi - lo) / 255``."""
    scaled = F.zip_with(
        F.col(code_col),
        _span_arr(quantizer),
        lambda c, s: c.cast("double") * s / 255.0,
    )
    return F.zip_with(scaled, _lo_arr(quantizer), lambda t, lo: lo + t)


def topk_cosine_quantized(
    df: DataFrame,
    quantizer: dict,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int | None = None,
) -> DataFrame:
    """Top-k by cosine over DEQUANTIZED codes — what an SQ8-
    compressed 100 TB store actually ranks with. The query vector is
    quantized through the same grid (symmetric error). Returns
    (id_col, cosine)."""
    from ..functions.vector import cosine_similarity

    n = len(quantizer["lo"])
    # quantize the query ON THE DRIVER with the engine's exact
    # rounding: Python round() is half-even, but SQL round(double)
    # is BigDecimal.valueOf(x).setScale(0, HALF_UP) — i.e. HALF_UP
    # over the double's shortest decimal representation, which
    # Decimal(repr(x)) reproduces bit-exactly (both sides emit the
    # shortest round-tripping decimal, and any non-tie rounds the
    # same way because every representation of one double lies on
    # one side of the .5 boundary). This replaces a ONE-ROW Spark
    # job whose dim-literal plan cost ~6-10 s of build+planning per
    # query (measured r12-opt); the arithmetic order matches
    # quantize_embeddings exactly: (x - lo) * 255.0 / s, then round.
    import decimal

    def _round_half_up(t: float) -> int:
        return int(
            decimal.Decimal(repr(t)).to_integral_value(
                rounding=decimal.ROUND_HALF_UP
            )
        )

    qcodes = []
    for x, lo, hi in zip(query_vec, quantizer["lo"], quantizer["hi"]):
        s = float(hi) - float(lo)
        if s == 0.0:
            qcodes.append(0)
        else:
            d = float(x) - float(lo)
            qcodes.append(
                min(255, max(0, _round_half_up(d * 255.0 / s)))
            )
    assert len(qcodes) == n
    qhat = [
        quantizer["lo"][i] + qcodes[i] * (quantizer["hi"][i] - quantizer["lo"][i]) / 255.0
        for i in range(n)
    ]
    # FUSED encode+decode in ONE zip_with over a literal struct-array
    # of per-dim (lo, span) params: higher-order lambdas run
    # interpreted (outside codegen), so each extra array pass is a
    # dim x rows interpreted loop — the unfused
    # quantize -> dequantize -> cosine chain cost ~7 passes/row (6s
    # per sf0.1 probe); fused it is ~4. Arithmetic order matches
    # quantize_embeddings/dequantize_expr exactly:
    # lo + round((x-lo)*255/s) * s / 255.
    params = F.expr(
        "array("
        + ",".join(
            f"named_struct('lo', {_dlit(lo)}, 's', {_dlit(hi)} - {_dlit(lo)})"
            for lo, hi in zip(quantizer["lo"], quantizer["hi"])
        )
        + ")"
    )
    xhat = F.zip_with(
        F.col(vec_col),
        params,
        lambda x, p: p["lo"]
        + F.when(p["s"] == 0.0, F.lit(0)).otherwise(
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.round(
                        (x.cast("double") - p["lo"]) * 255.0 / p["s"]
                    ).cast("int"),
                ),
            )
        ).cast("double")
        * p["s"]
        / 255.0,
    )
    qlit = F.expr("array(" + ",".join(_dlit(v) for v in qhat) + ")")
    # the query's norm is a constant: fold it in Python (same
    # sequential sum order as the engine's aggregate) instead of
    # re-running a dim-length literal aggregate per row
    qnorm = sum(v * v for v in qhat) ** 0.5
    deq = df.withColumn("__xhat", xhat)
    sim = cosine_similarity(F.col("__xhat"), qlit, b_norm=qnorm)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        deq.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------- product quantization (r7) ----------------


def _pq_assign_udf(codebooks):
    """Arrow-batched all-subspaces code assignment: per batch, one
    numpy matmul per subspace; returns array<int> of length
    n_subspaces per vector. Same rationale as the ANN index's
    ``_cell_udf``: a pure-Column argmin over n_codes distance
    expressions per subspace would carry n_subspaces x n_codes x
    subdim literals through an interpreted expression tree.
    Ties resolve to the FIRST code index (numpy argmin), and the
    distance form ``||c||² - 2·x·c`` drops the x-norm term shared by
    every candidate — the SQL oracle replays the identical form so
    the argmin matches."""
    books = [np.asarray(b, dtype="float64") for b in codebooks]
    c2s = [(b * b).sum(axis=1) for b in books]
    subdim = books[0].shape[1]

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        M = np.stack([np.asarray(v, dtype="float64") for v in vecs])
        cols = []
        for j, (B, c2) in enumerate(zip(books, c2s)):
            X = M[:, j * subdim : (j + 1) * subdim]
            d = c2[None, :] - 2.0 * (X @ B.T)
            cols.append(d.argmin(axis=1).astype("int32"))
        arr = np.stack(cols, axis=1)
        return pd.Series([[int(x) for x in row] for row in arr])

    return assign


def fit_product_quantizer(
    df: DataFrame,
    vec_col: str = "embedding",
    *,
    n_subspaces: int = 8,
    n_codes: int = 32,
    lloyd_iters: int = 4,
    seed: int = 42,
) -> dict:
    """Per-subspace k-means codebooks over the corpus; returns
    ``{"dim", "n_subspaces", "n_codes", "codebooks":
    [n_subspaces][n_codes][subdim]}``.

    Scale shape: init = ONE deterministic hash-ordered pick of
    ``n_codes`` corpus vectors (TakeOrdered — all partitions probed,
    n_codes rows returned; ``limit()`` alone would sample only the
    first partitions, the same bias trap build_ivf_index documents),
    sliced into every subspace. Each Lloyd iteration is ONE corpus
    pass refining ALL subspaces together: the Arrow assignment UDF
    emits all n_subspaces codes per row, posexplode keys components
    by (subspace, code, position), and the mean aggregation collects
    n_subspaces x n_codes x subdim rows — corpus-independent driver
    state, exactly like ``lloyd_refine``. Production PQ fits on a
    SAMPLE (FAISS trains on ~100k vectors); pass a
    ``deterministic_sample`` of the corpus for the 100 TB fit."""
    dim = int(df.select(F.size(vec_col).alias("d")).first()["d"])
    if dim % n_subspaces:
        raise ValueError(
            f"dim {dim} not divisible by n_subspaces {n_subspaces}"
        )
    subdim = dim // n_subspaces
    sample = [
        list(r[vec_col])
        for r in df.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col).cast("string"), F.lit(seed)))
        .limit(n_codes)
        .collect()
    ]
    if len(sample) < n_codes:
        raise ValueError(
            f"need >= {n_codes} vectors to seed the codebooks, "
            f"got {len(sample)}"
        )
    S = np.asarray(sample, dtype="float64")
    books = [
        S[:, j * subdim : (j + 1) * subdim].copy()
        for j in range(n_subspaces)
    ]
    for _ in range(max(0, lloyd_iters)):
        assign = _pq_assign_udf(books)
        rows = (
            df.select(
                assign(F.col(vec_col)).alias("__codes"),
                F.posexplode(F.col(vec_col)).alias("__d", "__x"),
            )
            .select(
                (F.col("__d") / subdim).cast("int").alias("j"),
                F.element_at(
                    "__codes", (F.col("__d") / subdim).cast("int") + 1
                ).alias("c"),
                F.pmod(F.col("__d"), F.lit(subdim)).alias("p"),
                "__x",
            )
            .groupBy("j", "c", "p")
            .agg(F.avg("__x").alias("m"))
            .collect()
        )
        nxt = [b.copy() for b in books]
        for r in rows:
            nxt[r["j"]][r["c"], r["p"]] = r["m"]
        books = nxt
    return {
        "dim": dim,
        "n_subspaces": int(n_subspaces),
        "n_codes": int(n_codes),
        "codebooks": [b.tolist() for b in books],
    }


def encode_pq(
    df: DataFrame,
    pq: dict,
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
) -> DataFrame:
    """Map-only PQ encoding: adds ``code_col`` (array<int>, length
    n_subspaces, values in [0, n_codes)). The stored footprint is
    ``n_subspaces * log2(n_codes)`` bits/vector."""
    return df.withColumn(
        code_col, _pq_assign_udf(pq["codebooks"])(F.col(vec_col))
    )


def topk_cosine_pq(
    df: DataFrame,
    pq: dict,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str | None = None,
    round_digits: int | None = None,
    rerank: int | None = None,
) -> DataFrame:
    """Top-k by ADC (asymmetric distance computation) cosine: rank on
    the PQ-RECONSTRUCTED vectors without ever touching them — per
    subspace j, precompute ``dlut[j][c] = codeword·query_slice`` and
    ``nlut[j][c] = ||codeword||²`` driver-side (n_subspaces x n_codes
    doubles), then per row
    ``cosine = Σ_j dlut[j][code_j] / (sqrt(Σ_j nlut[j][code_j]) ·
    ||q||)`` — n_subspaces literal-array lookups via one zip_with
    over the code array (the LUT struct-array is a hoisted literal,
    the r6 SQ8 lesson). ``code_col=None`` encodes on the fly
    (corpus scan); pass a precomputed code column to rank a stored
    5-byte-per-vector index without reading any float vectors.

    ``rerank=R`` is the standard two-stage retrieval (FAISS's
    IndexPQ + refine): ADC shortlists R candidates from the 5-byte
    codes, then ONLY those R rows are exact-rescored against their
    float vectors — the float corpus is touched for R rows per
    query, not scanned. recall@10 on the isotropic sf0.01 table:
    ~0.4 pure-ADC at 51x compression, >= 0.9 with rerank=100
    (tests/test_pq.py) — the compression/recall dial a 100 TB
    vector store actually operates."""
    books = [np.asarray(b, dtype="float64") for b in pq["codebooks"]]
    m = pq["n_subspaces"]
    subdim = pq["dim"] // m
    q = np.asarray(list(query_vec), dtype="float64")
    if len(q) != pq["dim"]:
        raise ValueError("query dim mismatch")
    dluts = [books[j] @ q[j * subdim : (j + 1) * subdim] for j in range(m)]
    nluts = [(books[j] * books[j]).sum(axis=1) for j in range(m)]
    qn = float(np.sqrt((q * q).sum()))
    if code_col is None:
        df = encode_pq(df, pq, vec_col, "__pq_codes")
        code_col = "__pq_codes"
    params = F.array(
        *[
            F.struct(
                F.array(*[F.lit(float(v)) for v in dluts[j]]).alias("d"),
                F.array(*[F.lit(float(v)) for v in nluts[j]]).alias("n"),
            )
            for j in range(m)
        ]
    )
    dsum = F.aggregate(
        F.zip_with(
            F.col(code_col), params, lambda c, p: F.element_at(p["d"], c + 1)
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    nsum = F.aggregate(
        F.zip_with(
            F.col(code_col), params, lambda c, p: F.element_at(p["n"], c + 1)
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    sim = dsum / (F.sqrt(nsum) * F.lit(qn))
    if rerank is not None:
        from ..functions.vector import cosine_similarity

        shortlist = (
            df.select(F.col(id_col), sim.alias("__adc"))
            .orderBy(F.col("__adc").desc(), F.col(id_col).asc())
            .limit(int(rerank))
            .select(id_col)
        )
        qlit = F.array(*[F.lit(float(v)) for v in q])
        exact = cosine_similarity(F.col(vec_col), qlit, b_norm=qn)
        if round_digits is not None:
            exact = F.round(exact, round_digits)
        # the R-row shortlist broadcasts; only those rows' float
        # vectors are rescored
        return (
            df.join(F.broadcast(shortlist), id_col, "left_semi")
            .select(F.col(id_col), exact.alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
            .limit(k)
        )
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        df.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------- OPQ: optimized product quantization (r8) ----------


def _kmeans_np(S: np.ndarray, n_codes: int, iters: int) -> np.ndarray:
    """Deterministic numpy k-means for the OPQ fit: seeds are the
    first n_codes rows of the (already hash-ordered) sample, ties
    resolve to the first centroid — same conventions as the
    distributed fit."""
    C = S[:n_codes].copy()
    for _ in range(iters):
        d = (S[:, None, :] - C[None]) ** 2
        idx = d.sum(-1).argmin(1)
        for c in range(n_codes):
            mask = idx == c
            if mask.any():
                C[c] = S[mask].mean(0)
    return C


def fit_opq(
    df: DataFrame,
    vec_col: str = "embedding",
    *,
    n_subspaces: int = 8,
    n_codes: int = 32,
    opq_iters: int = 6,
    lloyd_iters: int = 6,
    sample_size: int = 4096,
    seed: int = 42,
    ndp: int = 6,
) -> dict:
    """OPQ (Ge et al., "Optimized Product Quantization", CVPR 2013 —
    FAISS's OPQMatrix): learn an orthogonal rotation R that
    redistributes variance across PQ subspaces before quantizing,
    by alternating (fit PQ on X·R) ↔ (R ← argmin ||X·R − decode||²,
    the orthogonal-Procrustes SVD). On this repo's fixture the
    rotation lifts pure-ADC recall@10 by ~10% at the same 51×
    compression.

    The FIT runs on a bounded DETERMINISTIC sample driver-side
    (hash-ordered TakeOrdered, `sample_size` rows — production OPQ
    trains on ~100k vectors; the d×d SVD is milliseconds); APPLY is
    distributed (`rotate_vectors`, Arrow-batched matmul). Returns
    ``{"rotation": [dim][dim], ...pq fields...}`` with everything
    rounded to ``ndp`` so both engines replay identical literals."""
    dim = int(df.select(F.size(vec_col).alias("d")).first()["d"])
    if dim % n_subspaces:
        raise ValueError(
            f"dim {dim} not divisible by n_subspaces {n_subspaces}"
        )
    subdim = dim // n_subspaces
    sample = [
        list(r[vec_col])
        for r in df.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col).cast("string"), F.lit(seed)))
        .limit(int(sample_size))
        .collect()
    ]
    if len(sample) < n_codes:
        raise ValueError(f"need >= {n_codes} sample vectors")
    X = np.asarray(sample, dtype="float64")
    R = np.eye(dim)

    def fit_books(Y):
        return [
            _kmeans_np(Y[:, j * subdim : (j + 1) * subdim], n_codes, lloyd_iters)
            for j in range(n_subspaces)
        ]

    def decode(Y, books):
        out = np.empty_like(Y)
        for j, B in enumerate(books):
            S = Y[:, j * subdim : (j + 1) * subdim]
            idx = (
                (B * B).sum(1)[None, :] - 2.0 * (S @ B.T)
            ).argmin(1)
            out[:, j * subdim : (j + 1) * subdim] = B[idx]
        return out

    books = None
    for _ in range(max(1, opq_iters)):
        Y = X @ R
        books = fit_books(Y)
        Yd = decode(Y, books)
        U, _, Vt = np.linalg.svd(X.T @ Yd)
        R = U @ Vt
    Y = X @ R
    books = fit_books(Y)
    return {
        "dim": dim,
        "n_subspaces": int(n_subspaces),
        "n_codes": int(n_codes),
        "rotation": [[round(float(x), ndp) for x in row] for row in R],
        "codebooks": [
            [[round(float(x), ndp) for x in code] for code in B]
            for B in books
        ],
    }


def rotate_vectors(
    df: DataFrame,
    rotation,
    vec_col: str = "embedding",
    out_col: str = "rotated",
    ndp: int = 6,
) -> DataFrame:
    """Map-only distributed rotation: Arrow-batched ``batch @ R``,
    ROUNDED to ``ndp`` so the downstream PQ argmin sees identical
    inputs on every engine (numpy's pairwise-summed matmul and a
    SQL engine's sequential inner product differ by ULPs; the round
    kills that before it can flip a near-tie assignment)."""
    R = np.asarray(rotation, dtype="float64")

    @pandas_udf("array<double>")
    def rot(vecs: pd.Series) -> pd.Series:
        M = np.stack([np.asarray(v, dtype="float64") for v in vecs])
        out = np.round(M @ R, ndp)
        return pd.Series([row.tolist() for row in out])

    return df.withColumn(out_col, rot(F.col(vec_col)))


def rotate_query(opq: dict, query_vec, ndp: int = 6):
    """The same rotation + round for a driver-side query vector."""
    R = np.asarray(opq["rotation"], dtype="float64")
    q = np.asarray(list(query_vec), dtype="float64")
    return [float(x) for x in np.round(q @ R, ndp)]


def topk_cosine_opq(
    df: DataFrame,
    opq: dict,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int | None = None,
    rerank: int | None = None,
) -> DataFrame:
    """OPQ ADC top-k: rotate corpus (map-only Arrow matmul) and
    query, then the standard PQ ADC ranking in rotated space —
    rotation preserves inner products and norms, so the ADC cosine
    approximates the ORIGINAL cosine, just with less quantization
    error. Same plan shape as :func:`topk_cosine_pq` plus one
    map-only projection."""
    rotated = rotate_vectors(df, opq["rotation"], vec_col, "__rot")
    pq = {
        "dim": opq["dim"],
        "n_subspaces": opq["n_subspaces"],
        "n_codes": opq["n_codes"],
        "codebooks": opq["codebooks"],
    }
    return topk_cosine_pq(
        rotated,
        pq,
        rotate_query(opq, query_vec),
        k=k,
        vec_col="__rot",
        id_col=id_col,
        round_digits=round_digits,
        rerank=rerank,
    )


# ---------------- persisted IVF-PQ index (r7) ----------------
#
# The serving shape a 100 TB vector store actually deploys (FAISS
# IndexIVFPQ): coarse k-means cells bound WHICH partitions a probe
# reads (partition pruning on disk), PQ codes bound WHAT it reads
# (5 bytes/vector instead of 256 — and parquet column pruning skips
# the float vectors entirely on the ADC pass), and an optional
# exact-rescore pass re-reads float vectors for only the shortlist.


def build_ivfpq_index(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    n_cells: int = 16,
    pq: dict | None = None,
    n_subspaces: int = 8,
    n_codes: int = 32,
    seed: int = 42,
    lloyd_iters: int = 3,
    centroids=None,
):
    """Returns ``(indexed_df, centroids, pq)`` where indexed_df =
    (id, v, pq_codes, __ivf_cell). Pass a pre-fit ``pq`` (e.g. the
    frozen codebooks) and/or frozen coarse ``centroids`` to skip the
    fits; otherwise the coarse cells come from the same
    deterministic pick + Lloyd as ``build_ivf_index``."""
    from .index import build_ivf_index

    indexed, cents = build_ivf_index(
        df, vec_col, id_col,
        n_cells=n_cells, seed=seed, lloyd_iters=lloyd_iters,
        centroids=centroids,
    )
    if pq is None:
        pq = fit_product_quantizer(
            df, vec_col,
            n_subspaces=n_subspaces, n_codes=n_codes,
            lloyd_iters=lloyd_iters, seed=seed,
        )
    encoded = encode_pq(indexed, pq, "v", "pq_codes").select(
        "id", "v", "pq_codes", "__ivf_cell"
    )
    return encoded, cents, pq


def write_ivfpq_index(indexed: DataFrame, cents, pq: dict, path: str) -> None:
    """cells/ partitioned by __ivf_cell (probes partition-prune),
    centroids/ + pq/ as tiny parquet sidecars (the pq codebooks ride
    as one JSON string row — engine-agnostic, no local-FS write)."""
    import json as _json

    import numpy as np

    spark = indexed.sparkSession
    indexed.write.mode("overwrite").partitionBy("__ivf_cell").parquet(
        f"{path}/cells"
    )
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(np.asarray(cents))
    ]
    spark.createDataFrame(rows, "cell int, centroid array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        [(_json.dumps(pq),)], "pq_json string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/pq")


def read_ivfpq_index(spark, path: str):
    import json as _json

    import numpy as np

    cents_rows = (
        spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    )
    cents = np.asarray(
        [list(r["centroid"]) for r in cents_rows], dtype="float64"
    )
    pq = _json.loads(spark.read.parquet(f"{path}/pq").first()["pq_json"])
    return spark.read.parquet(f"{path}/cells"), cents, pq


def topk_cosine_ivfpq(
    indexed: DataFrame,
    cents,
    pq: dict,
    query_vec,
    k: int = 10,
    *,
    n_probe: int = 4,
    rerank: int | None = None,
    round_digits: int | None = None,
) -> DataFrame:
    """Probe the ``n_probe`` cells nearest the query (on a written
    index: a partition-pruned scan, plan-audited in
    tests/test_plan_quality.py), rank candidates by ADC over their
    5-byte codes (parquet column pruning skips the float vectors),
    optionally exact-rescore a ``rerank`` shortlist. Cell ties break
    by cell id — the same (distance, cell) order the SQL oracle
    replays."""
    import numpy as np

    C = np.asarray(cents, dtype="float64")
    qv = np.asarray(list(query_vec), dtype="float64")
    d = ((C - qv) ** 2).sum(axis=1)
    probe = sorted(range(C.shape[0]), key=lambda i: (d[i], i))[:n_probe]
    cand = indexed.filter(F.col("__ivf_cell").isin(*[int(p) for p in probe]))
    return topk_cosine_pq(
        cand, pq, qv, k=k,
        vec_col="v", id_col="id", code_col="pq_codes",
        round_digits=round_digits, rerank=rerank,
    )


# --------------------------------------------------------- binary (1-bit)


def binary_words_expr(
    vec_col: str, dim: int, bits_per_word: int = 32
) -> Column:
    """Sign-bit packing (1-bit / binary quantization — the 32×
    compression rung past PQ; modern vector stores' cheap
    first-pass filter): ``array<long>`` of ``ceil(dim /
    bits_per_word)`` words, bit j of word w set iff
    ``vec[w*bpw + j] > 0``. 32 bits per 64-bit word keeps every
    value positive (no sign-bit/overflow games in either engine).

    Built as an unrolled codegen'd CASE sum per word (map-only, no
    UDF) using 1-based ``element_at`` — the same expression
    replays verbatim in DuckDB (battery oracle ``topk_binary``)."""
    n_words = (dim + bits_per_word - 1) // bits_per_word
    words = []
    for w in range(n_words):
        terms = []
        for j in range(bits_per_word):
            i = w * bits_per_word + j
            if i >= dim:
                break
            terms.append(
                f"(CASE WHEN element_at({vec_col}, {i + 1}) > 0.0 "
                f"THEN CAST({1 << j} AS BIGINT) "
                f"ELSE CAST(0 AS BIGINT) END)"
            )
        words.append(" + ".join(terms))
    return F.expr("array(" + ", ".join(words) + ")")


def encode_binary_python(vec, bits_per_word: int = 32) -> list[int]:
    """Driver-side twin of ``binary_words_expr`` for packing a
    query vector into literal words."""
    dim = len(vec)
    n_words = (dim + bits_per_word - 1) // bits_per_word
    out = []
    for w in range(n_words):
        word = 0
        for j in range(bits_per_word):
            i = w * bits_per_word + j
            if i < dim and float(vec[i]) > 0.0:
                word |= 1 << j
        out.append(word)
    return out


def topk_hamming(
    df: DataFrame,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    bits_per_word: int = 32,
) -> DataFrame:
    """Binary-quantized top-k: rank by Hamming distance between
    sign-bit packed vectors — ``(id_col, hamming)``, ties broken
    by id. Map-only packing + per-word ``bit_count(xor)`` (pure
    codegen'd integer ops), then ONE TakeOrdered — no shuffle of
    the float vectors at all, the scan reads 8·n_words bytes per
    row of derived data. For sign-distributed embeddings Hamming
    approximates angular distance (the classic LSH sign-random-
    projection bound); the recall floor against exact cosine is
    pinned in tests/test_r8b_ops.py."""
    dim = int(dim if dim is not None else len(query_vec))
    qwords = encode_binary_python(query_vec, bits_per_word)
    words = binary_words_expr(vec_col, dim, bits_per_word)
    packed = df.select(F.col(id_col), words.alias("__w"))
    ham = None
    for w, qw in enumerate(qwords):
        term = F.bit_count(
            F.element_at(F.col("__w"), w + 1).bitwiseXOR(
                F.lit(int(qw)).cast("long")
            )
        ).cast("long")
        ham = term if ham is None else ham + term
    return (
        packed.select(id_col, ham.alias("hamming"))
        .orderBy(F.col("hamming").asc(), F.col(id_col).asc())
        .limit(int(k))
    )
