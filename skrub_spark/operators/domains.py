"""URL / domain analysis for web-corpus curation (beyond-reference
LLM-pipeline operator, SURVEY.md §2).

Web-scale training pipelines score and filter documents by SOURCE
DOMAIN (C4's badwords/domain filters, RefinedWeb's URL filtering):
extract every URL's host, aggregate per-domain document counts, and
drop documents citing blocklisted domains. All pure Catalyst —
`regexp_extract_all` with an RE2-compatible pattern (so a DuckDB
oracle replays it exactly), explode, groupBy; the blocklist filter
is a broadcast anti-semi-join, never a scan of the blocklist per
row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# group 1 = the host; deliberately RE2-compatible (no lookarounds)
URL_HOST_PATTERN = r"https?://([A-Za-z0-9.-]+)"


def extract_url_domains(col: Column | str) -> Column:
    """array<string> of lowercased URL hosts appearing in the text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.regexp_extract_all(c, F.lit(URL_HOST_PATTERN), 1),
        lambda h: F.lower(h),
    )


def domain_stats(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-domain (domain, n_docs, n_occurrences): how many distinct
    documents cite the domain and how many times it appears in
    total. One explode + one groupBy with map-side partial
    aggregation (distinct doc counting via a pre-deduped frame, not
    count(distinct) over the raw explode)."""
    hits = df.select(
        F.col(id_col).alias("id"),
        F.explode(extract_url_domains(content_col)).alias("domain"),
    )
    occ = hits.groupBy("domain").agg(F.count(F.lit(1)).alias("n_occurrences"))
    docs = (
        hits.dropDuplicates(["id", "domain"])
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return docs.join(occ, on="domain")


# group 1 = the href value; RE2-compatible (no lookarounds)
A_HREF_PATTERN = r'<a\s[^>]*href="([^"]*)"'


def extract_outlinks(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per ``<a href="...">`` anchor: ``(id_col, href,
    host)`` — ``host`` is the lowercased absolute-URL host, NULL
    for relative/anchor-only links. Map-only
    regexp_extract_all + explode (RE2-compatible patterns, so a SQL
    oracle replays it byte-exactly) — the first half of webgraph
    construction from raw crawl HTML."""
    links = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.col(content_col), F.lit(A_HREF_PATTERN), 1
            )
        ).alias("href"),
    )
    host = F.lower(
        F.regexp_extract(F.col("href"), URL_HOST_PATTERN, 1)
    )
    return links.select(
        id_col,
        "href",
        F.when(host != F.lit(""), host).alias("host"),
    )


def host_edges(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    src_host_col: str = "src_host",
) -> DataFrame:
    """Host-level link graph from anchor tags:
    ``(src_host, dst_host, n_links)`` aggregating every absolute
    outlink of every document, self-links dropped — the edge list
    ``pagerank``/``hits``/``label_propagation`` consume. The
    explode + ONE map-side-combined groupBy is the only
    corpus-scale work; at 100 TB this is exactly how the Common
    Crawl host webgraph is built."""
    out = extract_outlinks(df, content_col, id_col)
    return (
        df.select(
            F.col(id_col), F.col(src_host_col).alias("src_host")
        )
        .join(out, id_col)
        .filter(F.col("host").isNotNull())
        .filter(F.col("host") != F.col("src_host"))
        .groupBy("src_host", F.col("host").alias("dst_host"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_links"))
    )


def drop_blocked_domains(
    df: DataFrame,
    blocklist: DataFrame | list[str],
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop documents citing ANY blocklisted domain. ``blocklist`` is
    a list of hosts or a 1-column DataFrame; it is broadcast into the
    semi-join side, so the corpus is scanned once regardless of
    blocklist size (dim-sized, the realistic shape)."""
    spark = df.sparkSession
    if not isinstance(blocklist, DataFrame):
        blocklist = spark.createDataFrame(
            [(d.lower(),) for d in blocklist], "domain string"
        )
    else:
        blocklist = blocklist.select(
            F.lower(F.col(blocklist.columns[0])).alias("domain")
        )
    hits = df.select(
        F.col(id_col).alias("__id"),
        F.explode(extract_url_domains(content_col)).alias("domain"),
    )
    blocked_ids = (
        hits.join(F.broadcast(blocklist), on="domain", how="left_semi")
        .select("__id")
        .distinct()
    )
    return df.join(
        blocked_ids.withColumnRenamed("__id", id_col), on=id_col, how="left_anti"
    )


# query parameters that never change the resource: tracking/campaign
# ids (the CCNet/RefinedWeb URL-dedup prerequisite). RE2-compatible.
TRACKING_PARAM_PATTERN = (
    r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid|ref_src|ref)="
)


def canonical_url(col: Column | str) -> Column:
    """Canonical form of a URL for URL-level deduplication:

    - scheme and host lowercased,
    - default ports dropped (:80 for http, :443 for https),
    - fragment dropped,
    - tracking query params removed (``TRACKING_PARAM_PATTERN``),
      remaining params sorted bytewise,
    - empty path normalized to ``/``.

    Two crawls of ``HTTP://Site.com:80/a?utm_source=x&b=1#frag`` and
    ``http://site.com/a?b=1`` collide — the standard first step of
    web-corpus URL dedup (crawl frontiers revisit the same resource
    through decorated links). Pure Catalyst regexp/array expressions,
    spelled identically in the DuckDB oracle (``url_canonical``)."""
    u = F.col(col) if isinstance(col, str) else col
    nofrag = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    hostport = F.lower(
        F.regexp_extract(nofrag, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)", 1)
    )
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    path = F.regexp_extract(
        nofrag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]+([^?]*)", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_PATTERN),
        )
    )
    qpart = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.when(scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), host, path, qpart)
    )
