"""Web-curation operators: URL canonicalization and domain blocking.

A web-scale training-data pipeline dedups by CANONICAL URL before it ever
fetches or hashes content (the same page is linked as http/HTTPS, with and
without :443, with utm_* tracking params, param-order shuffles, fragments,
trailing slashes), and drops entire registered domains from blocklists that
match by SUFFIX (blocking example.com must block a.b.example.com). Both are
pure string/array expression chains here — JVM-side, no Python in the hot
path, and every step replays verbatim in ANSI SQL so the ops hash-gate
cross-engine.

Canonicalization applied (the conservative, loss-free subset used by crawl
dedup — it never merges two URLs that could serve different content):
  * scheme and host lowercased;
  * default ports stripped (http:80, https:443), other ports kept;
  * fragment dropped (never sent to the server);
  * tracking params dropped (utm_*, fbclid, gclid), remaining params sorted
    byte-wise (param order is almost never significant; sorting is the
    standard crawler normalization);
  * trailing slashes stripped from the path ('' and '/' collapse).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_RE = "^(utm_[A-Za-z0-9_]*|fbclid|gclid)="

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def parse_url(url: Column | str) -> Column:
    """Struct(scheme, host, port, path, query) parsed with anchored
    regexp_extract — no lookbehind, portable to RE2 engines. ``port`` is the
    explicit port string ('' when absent); ``query`` excludes '?' and the
    fragment. Userinfo (user:pass@host) is stripped before the host/port
    split — without it the ':' in the credentials would be read as the port
    separator and 'user' as the host. IPv6 bracket hosts are out of scope
    (documented seam: they canonicalize by string identity only)."""
    u = F.col(url) if isinstance(url, str) else url
    hostport = F.regexp_replace(F.regexp_extract(u, _HOSTPORT_RE, 1), "^[^@]*@", "")
    return F.struct(
        F.lower(F.regexp_extract(u, _SCHEME_RE, 1)).alias("scheme"),
        F.lower(F.regexp_extract(hostport, "^([^:]+)", 1)).alias("host"),
        F.regexp_extract(hostport, ":([0-9]+)$", 1).alias("port"),
        F.regexp_extract(u, _PATH_RE, 1).alias("path"),
        F.regexp_extract(u, _QUERY_RE, 1).alias("query"),
    )


def canonical_url(url: Column | str) -> Column:
    """The canonical form as one string expression (see module docstring).
    Unparseable inputs (no scheme://host) canonicalize to '' — filter on
    that to quarantine junk rows."""
    p = parse_url(url)
    default_port = ((p["scheme"] == "http") & (p["port"] == "80")) | (
        (p["scheme"] == "https") & (p["port"] == "443")
    )
    portpart = F.when(
        (p["port"] == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), p["port"]))
    path = F.regexp_replace(p["path"], "/+$", "")
    kept = F.filter(
        F.split(p["query"], "&"),
        lambda x: (F.length(x) > 0) & ~x.rlike(TRACKING_PARAM_RE),
    )
    qpart = F.when(F.size(kept) == 0, F.lit("")).otherwise(
        F.concat(F.lit("?"), F.array_join(F.array_sort(kept), "&"))
    )
    return F.when((p["scheme"] == "") | (p["host"] == ""), F.lit("")).otherwise(
        F.concat(p["scheme"], F.lit("://"), p["host"], portpart, path, qpart)
    )


def url_dup_groups(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id", min_docs: int = 2
) -> DataFrame:
    """Crawl-frontier dedup: group rows by canonical URL, report groups with
    >= ``min_docs`` members as (canonical_url, n_docs, n_raw_forms,
    keep_id) — keep_id is the smallest id (first-crawled survives). One
    canonical-key shuffle; group sizes bounded by true URL duplication."""
    c = df.select(
        F.col(id_col).alias("id"),
        F.col(url_col).alias("raw"),
        canonical_url(url_col).alias("canonical_url"),
    ).filter(F.col("canonical_url") != "")
    return (
        c.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("raw").alias("n_raw_forms"),
            F.min("id").alias("keep_id"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def host_suffixes(host: Column | str) -> Column:
    """Every dot-suffix of a hostname: a.b.example.com ->
    [a.b.example.com, b.example.com, example.com, com]. Expression-only;
    the blocklist join key."""
    h = F.col(host) if isinstance(host, str) else host
    parts = F.split(h, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."),
    )


def domain_suffix_filter(
    df: DataFrame, blocked: DataFrame, host_col: str = "host"
) -> DataFrame:
    """Keep rows whose host is NOT equal to or under any blocked domain.
    Suffix matching by construction: the host explodes into its O(labels)
    dot-suffixes and one keyed equality join against the blocklist finds
    every hit — no per-row regex scan over the blocklist, so a million-entry
    blocklist costs one hash join, not a million pattern matches per row.
    Distinct hosts are matched once regardless of how many rows share them
    (at crawl scale hosts repeat heavily). ``blocked``'s first column is the
    domain."""
    hosts = df.select(F.col(host_col).alias("__h")).distinct()
    sfx = hosts.select("__h", F.explode(host_suffixes("__h")).alias("__sfx"))
    bad = (
        sfx.join(blocked.select(F.col(blocked.columns[0]).alias("__sfx")), "__sfx")
        .select("__h")
        .distinct()
    )
    return df.join(bad.withColumnRenamed("__h", host_col), [host_col], "left_anti")
