"""Int8 scalar quantization for embedding columns (beyond-reference
LLM-pipeline operator, SURVEY.md §2).

A 100 TB embedding store at float32 is 4x the bytes of uint8 codes;
scalar (per-dimension min/max) quantization is the standard first
rung of vector compression (FAISS's ScalarQuantizer / SQ8): dimension
``i`` maps linearly from ``[lo_i, hi_i]`` onto ``{0..255}``, and
similarity search runs over the DEQUANTIZED codes with bounded error
(per-dim reconstruction error <= span_i/510 + float eps).

Everything is engine-portable integer/double arithmetic, so a SQL
oracle replays fit -> quantize -> dequantize -> cosine top-k exactly
(battery query ``topk_quantized``):

- fit: one posexplode + groupBy(dim) min/max — map-side partial
  aggregation shuffles at most dim x partitions tiny rows, and the
  collect is dim-bounded (corpus-independent).
- quantize/dequantize: pure per-row Column expressions (map-only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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


def _lo_arr(q: dict) -> Column:
    return F.array(*[F.lit(v).cast("double") for v in q["lo"]])


def _span_arr(q: dict) -> Column:
    return F.array(
        *[
            F.lit(h).cast("double") - F.lit(l).cast("double")
            for l, h in zip(q["lo"], q["hi"])
        ]
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
    # quantize the query through the SAME Column expression as the
    # corpus (a one-row job): Python round() is half-even while SQL
    # round is HALF_UP — routing both sides through the engine keeps
    # the codes bit-identical to what an oracle recomputes
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [([float(v) for v in query_vec],)], f"{vec_col} array<double>"
    )
    qcodes = list(
        quantize_embeddings(qdf, quantizer, vec_col, "__qc").first()["__qc"]
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
    params = F.array(
        *[
            F.struct(
                F.lit(lo).cast("double").alias("lo"),
                (F.lit(hi).cast("double") - F.lit(lo).cast("double")).alias(
                    "s"
                ),
            )
            for lo, hi in zip(quantizer["lo"], quantizer["hi"])
        ]
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
    qlit = F.array(*[F.lit(v).cast("double") for v in qhat])
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
