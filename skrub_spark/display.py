"""Display hooks — parity with skrub's patch_display / unpatch_display.

The reference monkeypatches pandas/polars HTML repr to show
TableReport in notebooks. Here the hook swaps DataFrame._repr_html_
for a TableReport-backed summary (computed on demand)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def _classes():
    # the classic subclass defines its own _repr_html_ (returning
    # None without eager eval), shadowing a base-class patch
    classes = [DataFrame]
    try:
        from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

        classes.append(ClassicDF)
    except ImportError:
        pass
    return classes


_originals: dict = {}


def patch_display() -> None:
    """Make DataFrame display as a TableReport summary in notebooks."""
    if _originals:
        return

    def _repr_html_(self):
        from .report import TableReport

        return TableReport(self)._repr_html_()

    for cls in _classes():
        _originals[cls] = cls.__dict__.get("_repr_html_")
        cls._repr_html_ = _repr_html_


def unpatch_display() -> None:
    for cls, orig in _originals.items():
        if orig is None:
            try:
                del cls._repr_html_
            except AttributeError:
                pass
        else:
            cls._repr_html_ = orig
    _originals.clear()


class OptunaParamSearch:  # pragma: no cover - env has no optuna
    """Parity placeholder for skrub.OptunaParamSearch: optuna is not
    available in this environment; use ParamSearch (grid) instead."""

    def __init__(self, *a, **k):
        raise ImportError(
            "optuna is not installed; use skrub_spark.ParamSearch "
            "(exhaustive grid) or skrub_spark.RandomizedParamSearch "
            "(budgeted random search + successive halving) instead"
        )
