"""URL / domain operators for web-corpus curation.

Web pipelines (C4, RefinedWeb, Dolma) filter and aggregate by URL
long before they read text: blocklist the domain, dedup by
(registered domain, path), report per-domain volume. These are the
Catalyst-only pieces of that stage:

  url_parts(col)          -> (scheme, host, path) via RE2-safe regex
  registered_domain(host) -> eTLD+1 under a documented two-level-
                             suffix heuristic
  domain_filter(df, ...)  -> broadcast anti-join against a blocklist

Scale shape: parsing is map-only regexp_extract inside whole-stage
codegen; the blocklist is a broadcast dim (real blocklists are
100k-1M rows — far under the broadcast threshold); per-domain stats
are one map-side-combined groupBy on the extracted key. All RE2-safe,
so every extraction replays in DuckDB.

Honest scope: real eTLD+1 needs the Mozilla Public Suffix List
(thousands of entries, updated continuously). The heuristic here —
last two labels, or three when the last two are a known second-level
suffix — covers the common cases and keeps the function a pure
deterministic expression; at deploy time the suffix set is a config
input loaded from the PSL, same mechanism.

Reference parity: TxtLogParser has no URL concept; training-pipeline
extension (SURVEY.md §2 beyond-reference ops).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# second-level public suffixes the heuristic recognizes (a documented
# subset of the PSL; swap in the full list via the suffixes argument)
TWO_LEVEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk",
    "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)

_SCHEME_RE = "^([a-z][a-z0-9+.-]*)://"
_HOST_RE = "^[a-z][a-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"


def url_parts(url: Column) -> Column:
    """struct(scheme, host, path) from an absolute URL. host drops
    userinfo and port; a non-matching string yields '' fields (the
    C4 behavior: junk URLs fall out at the filter, not as errors)."""
    raw_host = F.regexp_extract(url, _HOST_RE, 1)
    # strip userinfo (everything through the last '@'), then the port
    host = F.element_at(F.split(raw_host, "@"), -1)
    host = F.element_at(F.split(host, ":"), 1)
    return F.struct(
        F.regexp_extract(url, _SCHEME_RE, 1).alias("scheme"),
        F.lower(host).alias("host"),
        F.regexp_extract(url, _PATH_RE, 1).alias("path"),
    )


def registered_domain(
    host: Column, suffixes: tuple[str, ...] = TWO_LEVEL_SUFFIXES
) -> Column:
    """eTLD+1 of a host: the last two labels, or the last three when
    the final two form a recognized second-level suffix. A host with
    fewer labels than that returns itself."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    take3 = last2.isin(*suffixes) & (n >= F.lit(3))
    dom3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return (
        F.when(n <= F.lit(2), host).when(take3, dom3).otherwise(last2)
    )


def domain_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    keep: bool = False,
) -> DataFrame:
    """Drop (or with keep=True, retain only) rows whose registered
    domain appears in `blocklist` (a 1-column 'domain' frame). The
    list joins broadcast; the fact table never shuffles."""
    dom = registered_domain(url_parts(F.col(url_col))["host"])
    tagged = df.withColumn("_rd", dom)
    # no distinct(): semi/anti membership is insensitive to duplicate
    # list rows, and dropping it keeps the list side exchange-free
    bl = F.broadcast(blocklist.select(F.col("domain").alias("_rd")))
    how = "left_semi" if keep else "left_anti"
    return tagged.join(bl, "_rd", how).drop("_rd")


def domain_stats(
    df: DataFrame, url_col: str = "url", key: str = "doc_id"
) -> DataFrame:
    """Per-registered-domain volume report: doc count, distinct hosts,
    id-sum digest — the artifact a crawl-curation pass ranks and
    blocklists from. One map-side-combined groupBy on the extracted
    key."""
    p = url_parts(F.col(url_col))
    return (
        df.select(
            F.col(key),
            p["host"].alias("host"),
            registered_domain(p["host"]).alias("domain"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct("host").cast("long").alias("n_hosts"),
            F.sum(key).cast("long").alias("sum_ids"),
        )
    )
