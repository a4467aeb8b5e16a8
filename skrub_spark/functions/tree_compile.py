"""Compile MLlib tree ensembles to Catalyst CASE expressions.

MLlib's ``model.transform`` scores through a JVM predictor object —
fine, but opaque: the plan shows a UDF-like black box, predictions
are not SQL-replayable, and every scored frame pays the
vector-assembly detour. For the FROZEN-model serving path this
module compiles a fitted GBT (regression or binary classification)
into a plain nested ``F.when`` Column over the raw feature columns:

- map-only, whole-stage-codegen'd scoring — no VectorAssembler, no
  model broadcast, no MLlib runtime on the scoring cluster;
- the SAME tree literals emit an identical ``CASE WHEN`` SQL string
  (:func:`trees_to_sql`), which is what promotes the
  InterpolationJoiner's learned-model path from rows-only to an
  exact DuckDB oracle (battery queries ``interpolation_gbt_frozen``
  / ``interpolation_clf_frozen``);
- the exported structure is a pure nested-list literal
  (leaf = ``[value]``, split = ``[feature_idx, threshold, left,
  right]``), committable in ``_frozen.py`` like every other frozen
  artifact.

Exactness: thresholds and leaf values are rounded to 6dp ONCE at
export; both engines then evaluate the identical literals with the
identical left-associated ``+`` chain over tree outputs, so the
ensemble sum is bit-exact across Spark and DuckDB (continuous splits
only — the integer-keyed features this repo feeds it never move
across a 6dp threshold round).

Reference parity: skrub's InterpolationJoiner default estimator is
HistGradientBoosting (_interpolation_joiner.py:19-20); this gives
its Spark counterpart a frozen, declaratively-scored serving form.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _export_node(jnode, ndp: int = 6):
    """Recursively export a JVM ml.tree Node to nested lists."""
    cls = jnode.getClass().getSimpleName()
    if "InternalNode" in cls:
        split = jnode.split()
        scls = split.getClass().getSimpleName()
        if "ContinuousSplit" not in scls:
            raise NotImplementedError(
                "only continuous splits are exportable; got " + scls
            )
        return [
            int(split.featureIndex()),
            round(float(split.threshold()), ndp),
            _export_node(jnode.leftChild(), ndp),
            _export_node(jnode.rightChild(), ndp),
        ]
    return [round(float(jnode.prediction()), ndp)]


def export_gbt(model, ndp: int = 6) -> dict:
    """Export a fitted GBTRegressionModel / GBTClassificationModel to
    a frozen dict ``{"trees": [...], "weights": [...], "kind":
    "regression" | "binary"}``. Tree weights come out 6dp-rounded
    like everything else (GBT weights are 1.0 / stepSize — exact at
    6dp for any sane step)."""
    kind = (
        "binary"
        if model.__class__.__name__.startswith("GBTClassification")
        else "regression"
    )
    trees = [
        _export_node(t._call_java("rootNode"), ndp) for t in model.trees
    ]
    weights = [round(float(w), ndp) for w in model.treeWeights]
    return {"trees": trees, "weights": weights, "kind": kind}


def _node_column(node, feats: list[Column]) -> Column:
    if len(node) == 1:
        return F.lit(float(node[0]))
    fi, thr, left, right = node
    return F.when(
        feats[fi] <= F.lit(float(thr)), _node_column(left, feats)
    ).otherwise(_node_column(right, feats))


def ensemble_margin(frozen: dict, feats: list[Column]) -> Column:
    """Raw ensemble output Σ weight_i · tree_i(x) as one Catalyst
    expression over ``feats`` (cast your features to double first if
    they aren't). For ``kind="regression"`` this IS the prediction;
    for ``kind="binary"`` it is the margin (> 0 ⇒ class index 1)."""
    feats = [f.cast("double") for f in feats]
    out = None
    for tree, w in zip(frozen["trees"], frozen["weights"]):
        term = _node_column(tree, feats) * F.lit(float(w))
        out = term if out is None else out + term
    return out


def _node_sql(node, feat_exprs: list[str]) -> str:
    # bare numeric literals parse as DECIMAL in DuckDB, which would
    # evaluate the whole ensemble in exact decimal arithmetic while
    # Spark uses IEEE doubles — CAST every literal so both engines
    # run the identical double computation
    if len(node) == 1:
        return f"CAST({float(node[0])!r} AS DOUBLE)"
    fi, thr, left, right = node
    return (
        f"CASE WHEN {feat_exprs[fi]} <= CAST({float(thr)!r} AS DOUBLE) "
        f"THEN {_node_sql(left, feat_exprs)} "
        f"ELSE {_node_sql(right, feat_exprs)} END"
    )


def trees_to_sql(frozen: dict, feat_exprs: list[str]) -> str:
    """The identical ensemble margin as an ANSI-SQL expression over
    ``feat_exprs`` (SQL strings for each feature, already cast to
    DOUBLE by the caller) — same literals, same left-associated sum,
    so DuckDB reproduces :func:`ensemble_margin` bit-exactly."""
    terms = [
        f"({_node_sql(tree, feat_exprs)}) * CAST({float(w)!r} AS DOUBLE)"
        for tree, w in zip(frozen["trees"], frozen["weights"])
    ]
    return "(" + " + ".join(terms) + ")"
