"""URL canonicalization + registrable-domain extraction — the
CommonCrawl curation stage between WARC ingestion (c1 exposes
WARC-Target-URI) and source-level quality gating (t10). Reference
parity: the manifest classifier keys rows by normalized source ids
(/root/reference/src/mf_etl/ingest/manifest.py); for a web corpus
the analogous key is the canonical URL / registrable domain.

Pure JVM column algebra (regexp extraction + higher-order array
functions) — zero Python, the shape this runs at 100 TB. A DuckDB twin
of every builder keeps the oracle independent of Spark.

Canonicalization rules (applied in order):
1. drop the fragment;
2. lowercase scheme and host (never the path/query);
3. strip the scheme's DEFAULT port only (http:80 / https:443 —
   https://h:80 is a real non-default port and is kept);
4. collapse duplicate slashes in the path; empty path -> '/';
   strip one trailing slash except for the root path;
5. drop tracking parameters (utm_*, fbclid, gclid, ref), preserving
   the relative order of everything kept; drop '?' when nothing is.

Registrable domain: hostname minus one leading 'www.', reduced to the
last two labels — or three when the second-level label is a common
delegated zone under a 2-letter ccTLD (co/com/org/net/gov/ac/edu, the
'example.co.uk' family). A full public-suffix list is data, not code;
this rule is the documented approximation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tracking parameters stripped by rule 5 (anchored name= match)
TRACKING_PARAM_RE = "^(utm_[a-z]+|fbclid|gclid|ref)="

#: delegated second-level zones under 2-letter ccTLDs (rule: 3 labels)
_CC_SECOND = "(co|com|org|net|gov|ac|edu)"


# ---------------------------------------------------------------------------
# Spark (JVM column) side
# ---------------------------------------------------------------------------


def _scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def _hostport(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))


def _path_query(url: Column) -> Column:
    """path+query with the fragment excluded."""
    return F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1)


def _canon_hostport(scheme: Column, hostport: Column) -> Column:
    return (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )


def _strip_trailing_slash(p: Column) -> Column:
    return F.when(
        (F.length(p) > 1) & p.endswith("/"),
        p.substr(F.lit(1), F.length(p) - 1),
    ).otherwise(p)


def _kept_params(query: Column) -> Column:
    """Array of non-tracking 'name=value' params, original order."""
    return F.when(query == "", F.array().cast("array<string>")).otherwise(
        F.filter(
            F.split(query, "&"),
            lambda x: ~x.rlike(TRACKING_PARAM_RE),
        )
    )


def url_canonical_columns(url: Column) -> dict[str, Column]:
    """All canonicalization outputs from one raw-URL column:
    canon_url, domain, scheme, had_fragment, had_tracking,
    n_params_kept. Compose with .alias() at the query layer."""
    scheme = _scheme(url)
    hostport = _canon_hostport(scheme, _hostport(url))
    pq = _path_query(url)
    raw_path = F.regexp_extract(pq, r"^([^?]*)", 1)
    raw_query = F.regexp_extract(pq, r"^[^?]*\?(.*)$", 1)
    path = _strip_trailing_slash(
        F.when(
            F.regexp_replace(raw_path, "/{2,}", "/") == "", F.lit("/")
        ).otherwise(F.regexp_replace(raw_path, "/{2,}", "/"))
    )
    kept = _kept_params(raw_query)
    qs = F.array_join(kept, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    hostname = F.regexp_replace(hostport, ":[0-9]+$", "")
    bare = F.regexp_replace(hostname, r"^www\.", "")
    domain = F.when(
        bare.rlike(r"\." + _CC_SECOND + r"\.[a-z][a-z]$"),
        F.regexp_extract(bare, r"([^.]+\.[^.]+\.[^.]+)$", 1),
    ).otherwise(F.regexp_extract(bare, r"([^.]+\.[^.]+)$", 1))
    return {
        "canon_url": canon,
        "domain": domain,
        "scheme": scheme,
        "had_fragment": url.contains("#"),
        "had_tracking": raw_query.rlike("(^|&)(utm_[a-z]+|fbclid|gclid|ref)="),
        "n_params_kept": F.size(kept).cast("long"),
    }


# ---------------------------------------------------------------------------
# DuckDB twin — same rules as SQL fragments over a raw-URL expression
# ---------------------------------------------------------------------------


def url_canonical_sql(url: str) -> dict[str, str]:
    scheme = f"lower(regexp_extract({url}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport_raw = (
        f"lower(regexp_extract({url}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))"
    )
    hostport = (
        f"(CASE WHEN {scheme} = 'http' THEN "
        f"regexp_replace({hostport_raw}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN "
        f"regexp_replace({hostport_raw}, ':443$', '') "
        f"ELSE {hostport_raw} END)"
    )
    pq = (
        f"regexp_extract({url}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)', 1)"
    )
    raw_path = f"regexp_extract({pq}, '^([^?]*)', 1)"
    raw_query = f"regexp_extract({pq}, '^[^?]*\\?(.*)$', 1)"
    collapsed = f"regexp_replace({raw_path}, '/{{2,}}', '/', 'g')"
    nonempty = f"(CASE WHEN {collapsed} = '' THEN '/' ELSE {collapsed} END)"
    path = (
        f"(CASE WHEN length({nonempty}) > 1 AND {nonempty} LIKE '%/' "
        f"THEN substr({nonempty}, 1, length({nonempty}) - 1) "
        f"ELSE {nonempty} END)"
    )
    kept = (
        f"(CASE WHEN {raw_query} = '' THEN [] ELSE "
        f"list_filter(string_split({raw_query}, '&'), "
        f"x -> NOT regexp_matches(x, '{TRACKING_PARAM_RE}')) END)"
    )
    # DuckDB's array_to_string returns NULL for an EMPTY list
    qs = f"COALESCE(array_to_string({kept}, '&'), '')"
    canon = (
        f"({scheme} || '://' || {hostport} || {path} || "
        f"(CASE WHEN {qs} = '' THEN '' ELSE '?' || {qs} END))"
    )
    hostname = f"regexp_replace({hostport}, ':[0-9]+$', '')"
    bare = f"regexp_replace({hostname}, '^www\\.', '')"
    domain = (
        f"(CASE WHEN regexp_matches({bare}, "
        f"'\\.{_CC_SECOND}\\.[a-z][a-z]$') "
        f"THEN regexp_extract({bare}, '([^.]+\\.[^.]+\\.[^.]+)$', 1) "
        f"ELSE regexp_extract({bare}, '([^.]+\\.[^.]+)$', 1) END)"
    )
    return {
        "canon_url": canon,
        "domain": domain,
        "scheme": scheme,
        "had_fragment": f"({url} LIKE '%#%')",
        "had_tracking": (
            f"regexp_matches({raw_query}, '(^|&)(utm_[a-z]+|fbclid|gclid|ref)=')"
        ),
        "n_params_kept": f"CAST(len({kept}) AS BIGINT)",
    }
