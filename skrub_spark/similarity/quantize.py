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


def _dims(q: dict) -> Column:
    return F.sequence(F.lit(0), F.lit(len(q["lo"]) - 1))


def _lo(q: dict, i: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(v).cast("double") for v in q["lo"]]), i + 1
    )


def _span(q: dict, i: Column) -> Column:
    hi = F.element_at(
        F.array(*[F.lit(v).cast("double") for v in q["hi"]]), i + 1
    )
    return hi - _lo(q, i)


def quantize_embeddings(
    df: DataFrame,
    quantizer: dict,
    vec_col: str = "embedding",
    code_col: str = "codes",
) -> DataFrame:
    """Adds ``code_col``: array<int> of codes in [0, 255];
    ``code = round((x - lo) * 255 / (hi - lo))``, 0 for constant
    dims. Map-only; the formula is spelled identically in the DuckDB
    oracle, so codes are bit-replayable."""
    i_codes = F.transform(
        _dims(quantizer),
        lambda i: F.when(_span(quantizer, i) == 0.0, F.lit(0)).otherwise(
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.round(
                        (
                            F.element_at(F.col(vec_col), i + 1).cast("double")
                            - _lo(quantizer, i)
                        )
                        * 255.0
                        / _span(quantizer, i)
                    ).cast("int"),
                ),
            )
        ),
    )
    return df.withColumn(code_col, i_codes)


def dequantize_expr(quantizer: dict, code_col: str = "codes") -> Column:
    """array<double> reconstruction:
    ``x_hat = lo + code * (hi - lo) / 255``."""
    return F.transform(
        _dims(quantizer),
        lambda i: _lo(quantizer, i)
        + F.element_at(F.col(code_col), i + 1).cast("double")
        * _span(quantizer, i)
        / 255.0,
    )


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
    coded = quantize_embeddings(df, quantizer, vec_col, "__codes")
    deq = coded.withColumn("__xhat", dequantize_expr(quantizer, "__codes"))
    qlit = F.array(*[F.lit(v).cast("double") for v in qhat])
    sim = cosine_similarity(F.col("__xhat"), qlit)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        deq.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
