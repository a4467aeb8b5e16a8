"""TableReport — parity with skrub/_reporting (TableReport).

Per-column summary statistics computed in ONE distributed agg pass
(+ one small pass for top values of string columns), returned as a
plain dict / JSON instead of HTML. No data-scale collects."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"double", "float", "int", "bigint", "smallint", "tinyint"}


class TableReport:
    def __init__(self, df: DataFrame, n_top_values: int = 10, title: str | None = None):
        self.df = df
        self.n_top_values = n_top_values
        self.title = title
        self._summary: dict | None = None

    def summary(self) -> dict:
        if self._summary is not None:
            return self._summary
        df = self.df
        dtypes = dict(df.dtypes)
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c, t in dtypes.items():
            aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
            aggs.append(F.approx_count_distinct(c).alias(f"{c}__dist"))
            if t in _NUMERIC:
                aggs += [
                    F.min(c).alias(f"{c}__min"),
                    F.max(c).alias(f"{c}__max"),
                    F.avg(c).alias(f"{c}__mean"),
                    F.stddev_samp(c).alias(f"{c}__std"),
                ]
            elif t.startswith("timestamp") or t == "date":
                aggs += [F.min(c).alias(f"{c}__min"), F.max(c).alias(f"{c}__max")]
        row = df.agg(*aggs).first().asDict()
        n = row["__n"]
        cols = {}
        for c, t in dtypes.items():
            info = {
                "dtype": t,
                "n_rows": n,
                "null_count": row.get(f"{c}__nulls"),
                "null_fraction": (row.get(f"{c}__nulls") or 0) / n if n else None,
                "approx_distinct": row.get(f"{c}__dist"),
            }
            for stat in ("min", "max", "mean", "std"):
                if f"{c}__{stat}" in row:
                    v = row[f"{c}__{stat}"]
                    info[stat] = str(v) if hasattr(v, "isoformat") else v
            if t == "string" and n:
                top = (
                    df.groupBy(c)
                    .count()
                    .orderBy(F.col("count").desc(), F.col(c).asc())
                    .limit(self.n_top_values)
                    .collect()
                )
                info["top_values"] = [
                    {"value": r[c], "count": r["count"]} for r in top
                ]
            cols[c] = info
        self._summary = {
            "title": self.title,
            "n_rows": n,
            "n_columns": len(dtypes),
            "columns": cols,
        }
        return self._summary

    def to_json(self) -> str:
        return json.dumps(self.summary(), default=str)

    def _repr_html_(self) -> str:  # minimal hook for notebooks
        s = self.summary()
        rows = "".join(
            f"<tr><td>{c}</td><td>{i['dtype']}</td><td>{i['null_count']}</td>"
            f"<td>{i['approx_distinct']}</td></tr>"
            for c, i in s["columns"].items()
        )
        return (
            f"<h3>{s['title'] or 'TableReport'}</h3>"
            f"<p>{s['n_rows']} rows × {s['n_columns']} cols</p>"
            f"<table><tr><th>column</th><th>dtype</th><th>nulls</th>"
            f"<th>distinct≈</th></tr>{rows}</table>"
        )
