"""HTML → text extraction — the boilerplate-strip step of web-corpus
curation (the pass between WARC ingestion and every text-quality
operator).

One PATTERN TABLE drives three parallel implementations so they cannot
drift:

- ``html_to_text_column`` — a chain of JVM-side ``regexp_replace``
  expressions (whole-stage codegen, zero Python in the hot path; at
  100 TB this is a map-only projection).
- ``html_to_text`` — the pure-Python reference (library tests and
  driver-side tooling).
- ``html_to_text_sql`` — the same chain as a DuckDB expression, so the
  future query registration (r11: ``c1_warc_extract`` /
  ``t15_html_extract``) gets its oracle for free and tests can assert
  three-way parity TODAY.

Every regex is written to the intersection of Java regex and RE2:
inline ``(?is)`` flags only — no backreferences, no lookaround (RE2
has neither). Entity decoding is the fixed six-entity chain real
boilerplate strippers special-case, applied with ``&amp;`` LAST so
double-escaped text decodes one level only (the HTML semantics).

Reference parity: none — the reference pipeline is OHLCV-only; this is
engine ADDITION for the LLM-training-data surface.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (pattern, replacement) — applied IN ORDER. Block elements whose
#: CONTENT must go (script/style/noscript), then comments, then every
#: remaining tag. Replacement is a space so ``word<br>word`` cannot
#: fuse into one token; the whitespace collapse at the end normalizes.
HTML_STRIP_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?is)<noscript[^>]*>.*?</noscript>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]*>", " "),
)

#: (entity, char) — fixed decode chain; ``&amp;`` MUST stay last.
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&#35;", "#"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

_TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
_LINK_RE = r"(?is)<a\s[^>]*href"


def html_to_text(html: str) -> str:
    """Pure-Python reference of the strip chain (tests + driver tools)."""
    s = html
    for pat, rep in HTML_STRIP_PATTERNS:
        s = re.sub(pat, rep, s)
    for ent, ch in HTML_ENTITIES:
        s = s.replace(ent, ch)
    return re.sub(r"\s+", " ", s).strip()


def html_to_text_column(col: Column) -> Column:
    """The strip chain as JVM column expressions — map-only, codegen'd."""
    out = col
    for pat, rep in HTML_STRIP_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    for ent, ch in HTML_ENTITIES:
        # entities contain no regex metacharacters; literal-safe
        out = F.regexp_replace(out, ent, ch)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def html_to_text_sql(expr: str) -> str:
    """The identical chain as a DuckDB expression (RE2 semantics; the
    patterns are written to the Java∩RE2 subset, see module doc)."""
    out = expr
    for pat, rep in HTML_STRIP_PATTERNS:
        out = f"regexp_replace({out}, {_sql_quote(pat)}, {_sql_quote(rep)}, 'g')"
    for ent, ch in HTML_ENTITIES:
        out = f"replace({out}, {_sql_quote(ent)}, {_sql_quote(ch)})"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


def html_title_column(col: Column) -> Column:
    """<title> text (empty string when absent — regexp_extract's
    no-match contract on both engines)."""
    return F.regexp_extract(col, _TITLE_RE, 1)


def html_title_sql(expr: str) -> str:
    return f"regexp_extract({expr}, {_sql_quote(_TITLE_RE)}, 1)"


def html_link_count_column(col: Column) -> Column:
    """Outbound-link count (href'd <a> tags) — a routing feature web
    curation filters on (link farms have hundreds)."""
    return F.regexp_count(col, F.lit(_LINK_RE))


def html_link_count_sql(expr: str) -> str:
    return f"length(regexp_extract_all({expr}, {_sql_quote(_LINK_RE)}))"
