"""Plan-audit helpers (r9) — the scale checklist as a public API.

Every 100 TB design review asks the same four questions of a plan:
how many shuffles, did the small side broadcast, did the filters
reach the parquet scan, and how much of the pipeline stays inside
whole-stage codegen. The repo's tests have been answering them with
ad-hoc string digs into ``queryExecution``; this module makes the
checks first-class so PIPELINES can assert their own plan shape
(e.g. a nightly job failing fast when a code change silently turns
a broadcast join into a 100 TB shuffle).

All helpers inspect the EXECUTED plan string — the same physical
plan ``df.explain()`` prints — and never trigger a job.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed-plan string (what ``df.explain()`` prints)."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (hash / range / single
    partition) — broadcast exchanges are NOT counted (they ship a
    bounded build side, not the corpus)."""
    plan = physical_plan(df)
    return len(
        re.findall(
            r"Exchange (?:hashpartitioning|rangepartitioning|"
            r"SinglePartition|RoundRobinPartitioning)",
            plan,
        )
    )


def has_broadcast_join(df: DataFrame) -> bool:
    """True when any join in the plan builds a broadcast side."""
    plan = physical_plan(df)
    return (
        "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """The predicates that reached the parquet scan (flattened from
    every ``PushedFilters: [...]`` in the plan). An empty list on a
    filtered scan means the filter runs AFTER reading every row."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def codegen_stages(df: DataFrame, finalize: bool = False) -> int:
    """Number of whole-stage-codegen spans. Fewer, wider spans mean
    more of the plan runs as fused JVM loops; a span count that
    jumps after a change usually marks a new interpreted boundary
    (python UDF, unsupported expression).

    Under AQE the codegen markers only exist on the FINAL plan —
    i.e. after THIS Dataset has executed (a new action like
    ``count()`` builds its own query execution and finalizes
    nothing here). ``finalize=True`` runs ``df.collect()`` first:
    use it on audit-sized frames (plan audits run on samples; a
    100 TB frame should be ``.limit()``-ed or sampled before
    auditing anyway). An un-executed adaptive plan reports 0."""
    if finalize:
        df.collect()
    plan = physical_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)


def audit_plan(df: DataFrame) -> dict:
    """One-call summary: ``{"exchanges", "broadcast_join",
    "pushed_filters", "codegen_stages", "has_python_udf"}`` — the
    four scale questions plus the slow-path tripwire."""
    plan = physical_plan(df)
    return {
        "exchanges": count_exchanges(df),
        "broadcast_join": has_broadcast_join(df),
        "pushed_filters": pushed_filters(df),
        "codegen_stages": codegen_stages(df),
        "has_python_udf": (
            "BatchEvalPython" in plan
            or "ArrowEvalPython" in plan
            or "MapInPandas" in plan
        ),
    }
