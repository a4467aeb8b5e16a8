"""Property-based tests (hypothesis) for the invariants that matter
at scale: partitioning-independence, output-set equality against
plain-Python reference implementations, and statistical bounds.

Pure-Python properties run hundreds of examples; Spark-backed ones
run a handful (each example is a job)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from skrub_spark.dedup.minhash import auto_bands
from skrub_spark.report.associations import cramer_v_from_counts

# ---------------- pure python, many examples ----------------


@given(
    st.lists(
        st.tuples(
            st.integers(0, 5), st.integers(0, 5), st.integers(1, 50)
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=200)
def test_cramer_v_bounds(cells):
    """Cramér's V from any contingency table lies in [0, 1] (up to
    float noise) and is 0 for single-row/col tables."""
    merged = {}
    for a, b, c in cells:
        merged[(a, b)] = merged.get((a, b), 0) + c
    flat = [(a, b, c) for (a, b), c in merged.items()]
    n = sum(c for _, _, c in flat)
    v = cramer_v_from_counts(flat, n)
    assert -1e-9 <= v <= 1.0 + 1e-9
    if len({a for a, _, _ in flat}) == 1 or len({b for _, b, _ in flat}) == 1:
        assert v == 0.0


@given(
    st.integers(8, 256),
    st.floats(0.05, 0.95),
)
@settings(max_examples=200)
def test_auto_bands_recall_floor(n_components, threshold):
    """auto_bands picks the largest rows-per-band meeting the 0.95
    recall floor at J=threshold; when even OR-only r=1 can't reach it
    (few components x low threshold), it falls back to r=1 — the
    maximum-recall banding that exists."""
    b = auto_bands(n_components, threshold)
    r = n_components // b
    assert b >= 1 and r >= 1

    def recall(r_):
        b_ = n_components // r_
        return 1.0 - (1.0 - threshold**r_) ** b_

    if recall(1) >= 0.95:
        assert recall(r) >= 0.95 - 1e-9
    else:
        assert r == 1  # best achievable


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=100)
def test_bmp_codec_rejects_or_roundtrips(payload):
    """decode_bmp never raises on arbitrary bytes: it returns None or
    a valid array (fuzz guard for the mapInPandas hot path)."""
    from skrub_spark.multimodal import decode_bmp

    out = decode_bmp(payload)
    assert out is None or out.ndim == 3


@given(
    st.integers(1, 8),
    st.integers(1, 8),
)
@settings(max_examples=50)
def test_bmp_roundtrip_any_shape(w, h):
    import numpy as np

    from skrub_spark.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(w * 31 + h)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


# ---------------- spark-backed, few examples ----------------


@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=25,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_match_union_find(spark, edges):
    """Distributed label propagation == plain union-find on any edge
    list: same partition of nodes into components."""
    from skrub_spark.dedup.components import connected_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent[find(a)] = find(b)

    for a, b in edges:
        union(a, b)
    want = {}
    for a, b in edges:
        for x in (a, b):
            want.setdefault(find(x), set()).add(x)
    want_sets = {frozenset(s) for s in want.values()}

    df = spark.createDataFrame(edges, "id_a int, id_b int")
    # local_threshold=0 forces the DISTRIBUTED star algorithm — the
    # driver-side fast path IS union-find, so testing it against
    # union-find would be vacuous; its equivalence to the distributed
    # labels is pinned by test_connected_components_local_matches.
    got = {}
    rows = connected_components(
        df, "id_a", "id_b", local_threshold=0
    ).collect()
    for r in rows:
        got.setdefault(r["component"], set()).add(r["id"])
    got_sets = {frozenset(s) for s in got.values()}
    assert got_sets == want_sets


# width=16: half-precision values keep diffs/squares far from the
# double subnormal range. Full-width floats can make the engine's
# squared-euclidean metric underflow ((1e-175)**2 -> 0.0), turning a
# strict |diff| ordering into a tie resolved by tiebreak_cols — a
# genuine IEEE behavior, not a bug, but unreplicable with |diff| math.
@given(
    st.lists(
        st.floats(-100, 100, allow_nan=False, width=16),
        min_size=2, max_size=12,
    ),
    st.floats(-100, 100, allow_nan=False, width=16),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fuzzy_join_numeric_matches_bruteforce(spark, rights, probe):
    """fuzzy_join on a numeric key returns exactly the nearest right
    value (ties -> smallest tiebreak), matching a python argmin."""
    from skrub_spark import fuzzy_join

    left = spark.createDataFrame([(0, float(probe))], "id int, x double")
    right = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(rights)], "rid int, rx double"
    )
    out = fuzzy_join(
        left, right, left_on="x", right_on="rx",
        strategy="levenshtein", tiebreak_cols=["rx", "rid"],
    ).first()
    best = min(range(len(rights)), key=lambda i: (abs(rights[i] - probe), rights[i], i))
    assert out["rx"] == rights[best]


@given(
    st.lists(  # left: (key 0-2, ts-minute 0-120)
        st.tuples(st.integers(0, 2), st.integers(0, 120)),
        min_size=1, max_size=10,
    ),
    st.lists(  # right: (key, ts-minute, payload)
        st.tuples(st.integers(0, 2), st.integers(0, 120), st.integers(0, 99)),
        min_size=1, max_size=10,
    ),
    st.sampled_from(["backward", "forward"]),
    st.booleans(),
    st.sampled_from([None, 600.0]),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_join_matches_pandas_merge_asof(
    spark, lrows, rrows, direction, exact, tol
):
    """asof_join == pandas.merge_asof for every (direction,
    allow_exact_matches, tolerance) combination on random keyed
    time series — pandas defines the reference semantics."""
    import datetime as dt

    import pandas as pd

    from skrub_spark import asof_join

    t0 = dt.datetime(2024, 1, 1)
    lpd = pd.DataFrame(
        [(k, t0 + dt.timedelta(minutes=m), i) for i, (k, m) in enumerate(lrows)],
        columns=["k", "ts", "lid"],
    )
    # merge_asof forbids duplicate right keys at identical ts only in
    # some modes; dedupe (k, ts) to keep the reference well-defined
    rpd = pd.DataFrame(
        [(k, t0 + dt.timedelta(minutes=m), p) for (k, m, p) in rrows],
        columns=["k", "ts", "price"],
    ).drop_duplicates(subset=["k", "ts"])

    want = pd.merge_asof(
        lpd.sort_values("ts", kind="stable"),
        rpd.sort_values("ts", kind="stable"),
        on="ts", by="k",
        direction=direction,
        allow_exact_matches=exact,
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    want_map = {
        int(r.lid): (None if pd.isna(r.price) else int(r.price))
        for r in want.itertuples()
    }

    left = spark.createDataFrame(lpd, "k int, ts timestamp, lid int")
    right = spark.createDataFrame(rpd, "k int, ts timestamp, price int")
    got = {
        r["lid"]: r["price"]
        for r in asof_join(
            left, right, by="k",
            direction=direction,
            allow_exact_matches=exact,
            tolerance_s=tol,
        ).collect()
    }
    assert got == want_map


@given(
    st.lists(  # (start-minute, duration-minutes) pairs
        st.tuples(st.integers(0, 600), st.integers(0, 240)),
        min_size=1, max_size=8,
    ),
    st.lists(
        st.tuples(st.integers(0, 600), st.integers(0, 240)),
        min_size=1, max_size=8,
    ),
    st.sampled_from(["1 hour", "2 hours", "45 minutes", "1 day"]),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_range_join_matches_bruteforce(spark, lints, rints, bucket):
    """Bucketed range join == brute-force closed-interval overlap for
    every bucket width, including widths that don't divide the
    truncation unit evenly — with correct per-pair multiplicity."""
    import datetime as dt

    from skrub_spark import range_join

    t0 = dt.datetime(2024, 1, 1)

    def iv(rows):
        return [
            (i, t0 + dt.timedelta(minutes=s), t0 + dt.timedelta(minutes=s + d))
            for i, (s, d) in enumerate(rows)
        ]

    lrows, rrows = iv(lints), iv(rints)
    left = spark.createDataFrame(lrows, "lid int, s timestamp, e timestamp")
    right = spark.createDataFrame(rrows, "rid int, s timestamp, e timestamp")
    got = sorted(
        (r["lid"], r["rid"])
        for r in range_join(
            left, right,
            left_start="s", left_end="e",
            right_start="s", right_end="e",
            bucket=bucket,
        ).collect()
    )
    want = sorted(
        (li, ri)
        for li, ls, le in lrows
        for ri, rs, re in rrows
        if ls <= re and rs <= le
    )
    assert got == want


@given(
    st.lists(
        st.lists(
            st.sampled_from(
                list("abcz 019.@-+\n") + ["\n\n", "word ", "dup line\n"]
            ),
            max_size=40,
        ).map("".join),
        min_size=1,
        max_size=6,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_repetition_stats_match_python(spark, texts):
    """repetition_stats == a pure-Python reference on arbitrary text
    (same line/word tokenization rules), regardless of content."""
    import re

    from skrub_spark.operators.repetition import repetition_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    for i, t in enumerate(texts):
        ls = [x.strip() for x in t.split("\n")]
        ls = [x for x in ls if x]
        ws = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        from collections import Counter

        lc, wc = Counter(ls), Counter(ws)
        n_lines, n_words = len(ls), len(ws)
        dup_line = 1 - len(lc) / n_lines if n_lines else 0.0
        tot = sum(c * len(x) for x, c in lc.items())
        dup_chars = sum(c * len(x) for x, c in lc.items() if c > 1)
        dup_char_frac = dup_chars / tot if tot else 0.0
        top_word = max(wc.values()) / n_words if n_words else 0.0
        r = got[i]
        assert r["n_lines"] == n_lines and r["n_words"] == n_words
        assert abs(r["dup_line_frac"] - dup_line) < 1e-12
        assert abs(r["dup_line_char_frac"] - dup_char_frac) < 1e-12
        assert abs(r["top_word_frac"] - top_word) < 1e-12


@given(
    st.lists(
        st.lists(
            st.sampled_from(
                list("ab2 .@-+")
                + ["x@y.com ", "10.0.0.1 ", "+1 5550001234 ", "a.b@c.io"]
            ),
            max_size=25,
        ).map("".join),
        min_size=1,
        max_size=6,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_redact_pii_matches_python_re(spark, texts):
    """redact_pii == the same pattern chain via Python re (the
    patterns avoid engine-specific constructs by design)."""
    import re

    from pyspark.sql import functions as F

    from skrub_spark.functions.text import _PII_PATTERNS, redact_pii

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: r["red"]
        for r in df.select(
            "doc_id", redact_pii(F.col("text")).alias("red")
        ).collect()
    }
    for i, t in enumerate(texts):
        want = t
        for pat, repl in _PII_PATTERNS:
            want = re.sub(pat, repl, want)
        assert got[i] == want, (t, got[i], want)


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs"),
                whitelist_characters="\n&?#:/=.",
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_canonical_url_idempotent(spark, texts):
    """canonical_url is idempotent on arbitrary strings — including
    junk that isn't a URL at all (passthrough) and decorated URLs
    built from random fragments: canonical(canonical(u)) ==
    canonical(u). A non-idempotent canonicalizer would make URL
    dedup depend on how many times a pipeline stage ran."""
    from pyspark.sql import functions as F

    from skrub_spark.operators.domains import canonical_url

    urls = list(texts) + [
        "https://Host.Example.com:443/" + (texts[0] or "x").replace("\n", "")
        + "?b=2&utm_source=" + (texts[-1] or "y").replace("\n", "")[:10]
        + "&a=1#frag"
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    rows = df.select(
        canonical_url("u").alias("c1"),
    ).withColumn("c2", canonical_url("c1")).collect()
    for r in rows:
        assert r["c1"] == r["c2"], (r["c1"], r["c2"])


@given(
    st.lists(
        st.text(alphabet="ab \n", min_size=0, max_size=120),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=2, max_value=5),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_token_span_counts_only_matches_full(spark, texts, window):
    """dedup_token_spans(counts_only=True) returns EXACTLY the full
    path's (n_tokens, n_removed) on adversarial tiny-alphabet texts
    (maximal window collisions) — the pretraining pipeline's narrow
    mode must never drift from the rebuild path."""
    from skrub_spark.operators.span_dedup import dedup_token_spans

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    full = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"])
        for r in dedup_token_spans(df, window=window).collect()
    }
    fast = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"])
        for r in dedup_token_spans(df, window=window, counts_only=True).collect()
    }
    assert full == fast
    # and the full path's clean_text re-splits to exactly the
    # surviving token count
    for r in dedup_token_spans(df, window=window).collect():
        kept = len([t for t in r["clean_text"].split() if t])
        assert kept == r["n_tokens"] - r["n_removed"]


@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-100, max_value=100,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=4, max_size=4,
        ),
        min_size=2, max_size=12,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scalar_quantizer_roundtrip_bound_property(spark, vecs):
    """For ANY float32 vectors: codes land in [0,255] and per-dim
    reconstruction error <= (hi-lo)/510 + eps — the grid's
    half-step, the SQ8 contract independent of data distribution."""
    from pyspark.sql import functions as F

    from skrub_spark.similarity.quantize import (
        dequantize_expr, fit_scalar_quantizer, quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    quant = fit_scalar_quantizer(df, "embedding")
    out = (
        quantize_embeddings(df, quant, "embedding", "codes")
        .withColumn("xhat", dequantize_expr(quant, "codes"))
        .collect()
    )
    spans = [h - l for l, h in zip(quant["lo"], quant["hi"])]
    orig = {r["vec_id"]: r["embedding"] for r in df.collect()}
    for r in out:
        for j, (c, xh) in enumerate(zip(r["codes"], r["xhat"])):
            assert 0 <= c <= 255
            bound = spans[j] / 510.0 + 1e-5 + abs(orig[r["vec_id"]][j]) * 1e-6
            assert abs(xh - orig[r["vec_id"]][j]) <= bound


@given(
    st.lists(
        st.text(alphabet="abcd ", min_size=0, max_size=80),
        min_size=1,
        max_size=5,
    )
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_minhash_incremental_invariants(spark, texts):
    """Two invariants of incremental near-dedup on arbitrary
    tiny-alphabet texts (maximal shingle collisions): (a) a batch
    doc IDENTICAL to a history doc is always dropped when it has
    shingles (same signature -> same buckets -> history hit), and
    (b) growing the history never lets MORE docs survive
    (monotonicity — the bucket set only grows)."""
    from skrub_spark.dedup.minhash import minhash_buckets, minhash_incremental

    hist = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(texts)]
        + [(500, "zz qq ww ee rr tt yy uu")],
        "doc_id long, text string",
    )
    seen_full = minhash_buckets(hist).select("band_idx", "band_key").distinct()
    seen_half = (
        minhash_buckets(hist.filter("doc_id % 2 = 0"))
        .select("band_idx", "band_key")
        .distinct()
    )
    surv_full = {
        r["doc_id"] for r in minhash_incremental(batch, seen_full).collect()
    }
    surv_half = {
        r["doc_id"] for r in minhash_incremental(batch, seen_half).collect()
    }
    # (a) identical-to-history docs with shingles never survive the
    # full history (shingle-less docs always survive by contract)
    shingled = {
        r["doc_id"] for r in minhash_buckets(batch).select("doc_id").distinct().collect()
    }
    for i, t in enumerate(texts):
        if 100 + i in shingled:
            assert 100 + i not in surv_full, t
    # (b) monotonic: more history -> never more survivors
    assert surv_full <= surv_half


# ---------------------------------------------------------------- r8


def _spread2(c: int, bits: int) -> int:
    """Python replay of the 2-column bit interleave for one column."""
    z = 0
    for i in range(bits):
        z += ((c >> i) & 1) << (2 * i)
    return z


@given(
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=255),
)
@settings(max_examples=200, deadline=None)
def test_zorder_interleave_bijective_and_monotone(a, b):
    """Bit-spreading is order-preserving (strictly increasing), so
    the z-value is monotone in each cell coordinate with the other
    fixed, and (a, b) -> z is a bijection on the cell grid."""
    za = _spread2(a, 8)
    if a < 255:
        assert _spread2(a + 1, 8) > za
    z = za + (_spread2(b, 8) << 1)
    # invert: de-interleave recovers (a, b)
    ra = sum(((z >> (2 * i)) & 1) << i for i in range(8))
    rb = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
    assert (ra, rb) == (a, b)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=4),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pagerank_mass_bounded_and_deterministic(spark, edges, n_iter):
    from skrub_spark.operators.graph import SCALE, pagerank

    edges = sorted({(s, d) for s, d in edges if s != d})
    if not edges:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, pagerank(df, n_iter=n_iter).collect()))
    b = sorted(map(tuple, pagerank(df, n_iter=n_iter).collect()))
    assert a == b  # fixed point is a pure function of the graph
    n = len({v for e in edges for v in e})
    total = sum(r[1] for r in a)
    # floor losses only shrink mass below the conserved n*SCALE
    assert 0 < total <= n * SCALE


@given(st.integers(min_value=1, max_value=500))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_distinct_sketch_rate_one_is_exact(spark, n):
    """rate=1 keeps every value: the 'sketch' degenerates to the
    exact distinct count for any input."""
    from skrub_spark.functions.sketches import distinct_sketch

    df = spark.createDataFrame(
        [(f"v{i % 37}",) for i in range(n)], "v string"
    )
    est = distinct_sketch(df, "v", rate=1).collect()[0]["distinct_est"]
    assert est == min(n, 37)
