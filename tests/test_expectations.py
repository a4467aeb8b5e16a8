"""Data-quality audit (Deequ shape) and BM25 retrieval contracts.

The battery oracles pin both queries exactly; these tests pin the
operator semantics on constructed fixtures — threshold logic, NULL
handling, the one-aggregation-pass plan shape, and a pure-python
BM25 replay with partitioning invariance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from skrub_spark.operators.bm25 import bm25_scores, bm25_topk
from skrub_spark.operators.expectations import (
    Check,
    RowRule,
    audit,
    quarantine,
    validate_rows,
)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "a", 10.0, "X"),
        (2, "b", None, "X"),
        (3, None, 30.0, "Y"),
        (3, "d", 40.0, "Y"),  # duplicate key 3
    ]
    return spark.createDataFrame(rows, "id long, name string, val double, grp string")


def test_audit_metrics_and_status(tiny):
    checks = [
        Check("row_count", min_value=4, max_value=4),
        Check("completeness", "name", min_value=1.0),      # fails: 3/4
        Check("completeness", "val", min_value=0.5),       # passes: 3/4
        Check("uniqueness", "id", min_value=1.0),          # fails: 2/4
        Check("distinctness", "grp", max_value=0.5),       # passes: 2/4
        Check("min", "val", min_value=0.0),
        Check("max", "val", max_value=40.0),
        Check("mean", "val", min_value=26.0, max_value=27.0),
        Check("compliance", predicate="grp IN ('X','Y')",
              name="compliance(grp_domain)", min_value=1.0),
    ]
    got = {r["constraint"]: r for r in audit(tiny, checks).collect()}
    assert len(got) == 9
    assert got["row_count(*)"]["metric"] == 4.0
    assert got["row_count(*)"]["passed"]
    assert got["completeness(name)"]["metric"] == 0.75
    assert not got["completeness(name)"]["passed"]
    assert got["completeness(val)"]["passed"]
    # id=3 occurs twice: 2 of 4 rows have a once-occurring value
    assert got["uniqueness(id)"]["metric"] == 0.5
    assert not got["uniqueness(id)"]["passed"]
    assert got["distinctness(grp)"]["metric"] == 0.5
    assert got["distinctness(grp)"]["passed"]
    # mean over non-null vals: (10+30+40)/3
    assert got["mean(val)"]["metric"] == pytest.approx(80.0 / 3, abs=1e-6)
    assert got["mean(val)"]["passed"]
    assert got["compliance(grp_domain)"]["metric"] == 1.0


def test_audit_row_level_is_one_aggregate_pass(tiny):
    """All row-level analyzers share ONE scan + ONE Aggregate (the
    suite must not rescan the table per constraint)."""
    checks = [
        Check("row_count"),
        Check("completeness", "name"),
        Check("min", "val"),
        Check("max", "val"),
        Check("mean", "val"),
        Check("compliance", predicate="grp = 'X'", name="c"),
    ]
    plan = audit(tiny, checks)._jdf.queryExecution().optimizedPlan().toString()
    # one logical scan of the fixture, however many constraints
    assert plan.count("LogicalRDD") == 1


def test_validate_rows_null_and_sorting(spark):
    df = spark.createDataFrame(
        [(1, None, 5), (2, "en", 200), (3, "zz", 50)],
        "doc_id long, lang string, n int",
    )
    rules = [
        RowRule("n_big", "n >= 100"),
        RowRule("lang_known", "lang IN ('en','de')"),
    ]
    got = {
        r["doc_id"]: r["violations"]
        for r in validate_rows(df, rules, ["doc_id"]).collect()
    }
    # NULL lang -> violation; arrays sorted by rule name
    assert got[1] == ["lang_known", "n_big"]
    assert got[2] == []
    assert got[3] == ["lang_known", "n_big"]
    q = quarantine(df, rules, ["doc_id"]).collect()
    assert sorted(r["doc_id"] for r in q) == [1, 3]


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    import re

    toks = {i: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
            for i, s in docs}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        hit = 0
        for t in sorted(set(terms)):
            tf = v.count(t)
            if tf == 0 or df[t] == 0:
                continue
            hit += 1
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            contrib = idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(v) / avgdl)
            )
            s += round(contrib, 6)
        if hit:
            out[i] = (hit, round(s, 6))
    return out


def test_bm25_matches_python_replay(spark):
    docs = [
        (1, "hash join beats merge join on small tables"),
        (2, "sort merge join wins when both sides are sorted"),
        (3, "a scan then a filter then nothing relevant"),
        (4, "hash hash hash join"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_hit"], round(r["score"], 6))
        for r in bm25_scores(df, ["hash", "join", "merge"]).collect()
    }
    exp = _py_bm25(docs, ["hash", "join", "merge"])
    assert got == exp
    assert 3 not in got  # no query term -> no row


def test_bm25_partitioning_invariant(spark):
    docs = [(i, f"hash join term{i % 7} merge sort row scan " * (1 + i % 3))
            for i in range(50)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = bm25_topk(df, "hash merge sort", k=5).collect()
    b = bm25_topk(df.repartition(16), "hash merge sort", k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]
    # scores strictly ordered desc, ties broken by id
    s = [(r["score"], -r["doc_id"]) for r in a]
    assert s == sorted(s, reverse=True)


def test_bm25_index_prunes_partitions_and_matches_direct(spark, tmp_path):
    """The persisted-index probe must (a) push the bucket filter
    into PartitionFilters — only the query terms' buckets are read —
    and (b) return exactly the direct computation's ranking."""
    from skrub_spark.operators.bm25 import (
        bm25_search_indexed,
        bm25_topk,
        build_bm25_index,
        write_bm25_index,
    )

    docs = [(i, f"hash join term{i % 7} merge sort row scan " * (1 + i % 3))
            for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    path = str(tmp_path / "bm25idx")
    write_bm25_index(build_bm25_index(df), path)
    got = bm25_search_indexed(spark, path, "hash merge", k=5)
    direct = bm25_topk(df, "hash merge", k=5)
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == [
        (r["doc_id"], r["score"]) for r in direct.collect()
    ]
    import re as _re

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert _re.search(r"PartitionFilters: \[bucket#\d+ IN \(", plan)


def test_percentile_normalize(spark):
    """Ties share a min-rank percentile; NULL scores get NULL pct;
    bounds are [0, 1]; layout-invariant."""
    from skrub_spark.functions.ranknorm import percentile_normalize

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 20.0), (4, 30.0), (5, None)],
        "id long, s double",
    )
    got = {r["id"]: (r["rank"], r["pct"])
           for r in percentile_normalize(df, "s", rank_col="rank").collect()}
    assert got[1] == (1, 0.0)
    assert got[2] == (2, 1 / 3) and got[3] == (2, 1 / 3)  # tie shares
    assert got[4] == (4, 1.0)
    assert got[5] == (None, None)
    a = percentile_normalize(df, "s").collect()
    b = percentile_normalize(df.repartition(5), "s").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_chunk_documents_boundaries(spark):
    """Window/stride math: short doc = one chunk; exact-fit doc = one
    chunk; overlap tokens repeat between neighbors; every token
    appears in >=1 chunk; last chunk is flush (may be short)."""
    from skrub_spark.operators.packing import chunk_documents

    docs = [
        (1, "a b c"),                                   # 3 toks, 1 chunk
        (2, " ".join(f"t{i}" for i in range(8))),        # exact fit
        (3, " ".join(f"t{i}" for i in range(10))),       # 2 chunks
        (4, " ".join(f"t{i}" for i in range(20))),       # 3 chunks
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents(df, "text", "doc_id", chunk_tokens=8, overlap=2)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk_text"] == "a b c"
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_tokens"] == 8
    # doc 3: stride 6 -> chunks [0..8), [6..10): overlap t6 t7
    c3 = sorted(by_doc[3], key=lambda r: r["chunk_id"])
    assert len(c3) == 2
    assert c3[0]["chunk_text"].split()[-2:] == ["t6", "t7"]
    assert c3[1]["chunk_text"].split()[:2] == ["t6", "t7"]
    assert c3[1]["n_chunk_tokens"] == 4  # flush tail
    # doc 4: ceil((20-8)/6)+1 = 3 chunks, all 20 tokens covered
    c4 = sorted(by_doc[4], key=lambda r: r["chunk_id"])
    assert len(c4) == 3
    covered = set()
    for r in c4:
        covered.update(r["chunk_text"].split())
    assert covered == {f"t{i}" for i in range(20)}


def test_key_skew_report(spark):
    from skrub_spark.report.skew import key_skew_report

    rows = [(1,)] * 70 + [(2,)] * 20 + [(3,)] * 10
    df = spark.createDataFrame(rows, "k long")
    got = {r["rank"]: r for r in key_skew_report(df, "k", top_k=2).collect()}
    assert len(got) == 2
    assert got[1]["key"] == 1 and got[1]["cnt"] == 70
    assert got[1]["share"] == 0.70
    assert got[2]["cum_share"] == 0.90
    # deterministic tie-break by key value
    t = spark.createDataFrame([(5,), (4,), (4,), (5,)], "k long")
    ranks = {r["key"]: r["rank"]
             for r in key_skew_report(t, "k", top_k=2).collect()}
    assert ranks == {4: 1, 5: 2}


def test_psi_drift_contracts(spark):
    """Identical frames score ~0; a planted shift scores > 0.25;
    missing bins and NULLs land in their own rows with frac 0."""
    from skrub_spark.report.drift import DriftSpec, psi_report

    ref = spark.createDataFrame(
        [(float(i % 10), "a" if i % 2 else "b") for i in range(200)],
        "x double, c string",
    )
    specs = [
        DriftSpec("x", "numeric", edges=(3.0, 6.0)),
        DriftSpec("c", "categorical", categories=("a", "b")),
    ]
    same = psi_report(ref, ref, specs).collect()
    assert all(abs(r["psi"]) < 1e-9 for r in same)
    assert len(same) == 4 + 4  # 3 numeric bins + null; 2 cats + other + null

    # planted shift: current mass moves to high x and category 'b'
    cur = spark.createDataFrame(
        [(float(7 + i % 3), "b") for i in range(200)] + [(None, None)],
        "x double, c string",
    )
    drifted = {(r["column"], r["bin"]): r for r in
               psi_report(ref, cur, specs).collect()}
    assert drifted[("x", "[6,inf)")]["psi"] > 0.25
    assert drifted[("c", "a")]["psi"] > 0.25
    # empty-on-current low bin has cur_frac 0 but still a row
    assert drifted[("x", "(-inf,3)")]["cur_frac"] == 0.0
    # the NULL row is counted on the current side
    assert drifted[("x", "<null>")]["cur_frac"] > 0.0


def test_countmin_contracts(spark):
    """est >= true always; est <= true + eN whp; cell-wise sum of
    two shard sketches == the union's sketch exactly."""
    import math as m

    from skrub_spark.functions.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    rows = [(f"t{i % 37}",) for i in range(2000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, "tok string")
    w, d = 512, 4
    sk = countmin_sketch(df, "tok", width=w, depth=d, salt="s")
    probes = spark.createDataFrame(
        [("hot",), ("t0",), ("never",)], "term string"
    )
    est = {r["term"]: r["est"]
           for r in countmin_estimate(sk, probes, "term",
                                      width=w, depth=d, salt="s").collect()}
    true = {"hot": 500, "t0": 2000 // 37 + 1, "never": 0}
    n = 2500
    eps = m.e / w
    for t, tv in true.items():
        assert est[t] >= tv                      # never underestimates
        assert est[t] <= tv + eps * n * 3        # generous whp bound
    # mergeability: sketch(A) + sketch(B) == sketch(A union B)
    a = spark.createDataFrame(rows[:1000], "tok string")
    b = spark.createDataFrame(rows[1000:], "tok string")
    merged = (
        countmin_sketch(a, "tok", width=w, depth=d, salt="s")
        .unionByName(countmin_sketch(b, "tok", width=w, depth=d, salt="s"))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = countmin_sketch(df, "tok", width=w, depth=d, salt="s")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_bm25_postings_filter_precedes_shuffle(spark):
    """The query-term filter must sit below the (doc, term) exchange
    — at 100 TB the shuffle carries only matching postings."""
    df = spark.createDataFrame(
        [(1, "hash join"), (2, "merge sort")], "doc_id long, text string"
    )
    plan = bm25_scores(df, ["hash"])._jdf.queryExecution().executedPlan().toString()
    i_filter = plan.find("hash")  # the isin literal
    assert i_filter != -1
    # the literal filter appears in the plan; the explode+filter are
    # in the same codegen stage as the scan (no exchange between)
    gen = plan.find("Generate")
    exch = plan.find("Exchange")
    assert gen != -1 and exch != -1
