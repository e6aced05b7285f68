"""HTML → text extraction — the first transform of every web-crawl
training corpus (boilerplate/script/markup removal before any quality
or dedup stage). Pure JVM column expressions: a chain of
``regexp_replace``/``replace`` calls, no Python in the hot path, fully
replayable in the DuckDB oracle because every pattern is written in
the RE2 ∩ java.util.regex common dialect (the same portability rule
as functions/text.py's PII patterns).

This is deliberately a REGEX extractor, not a DOM parser: at corpus
scale the standard practice for bulk text extraction is exactly this
(strip non-content containers, strip tags, decode the common
entities, collapse whitespace); a full HTML5 tree builder is a
per-document Python cost that buys little for statistical pipelines.
Malformed markup degrades to leaving fragments in place — never an
exception.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["extract_text", "html_entity_decode", "strip_tags"]

# non-content containers whose INNER TEXT must go, not just the tags.
# One pattern per container (no backreference — RE2, the oracle's
# engine, has none), each matching its OWN closing tag non-greedily.
_CONTAINERS = ("script", "style", "noscript", "nav", "header", "footer", "aside")
_CONTAINER_PATTERNS = [
    rf"(?is)<{name}\b[^>]*>.*?</{name}\s*>" for name in _CONTAINERS
]
# comments, then any remaining tag
_COMMENT_PATTERN = r"(?s)<!--.*?-->"
_TAG_PATTERN = r"(?s)<[^>]+>"

# the entities that actually occur in bulk; applied AFTER tag removal
# (so &lt;script&gt; text can never become live markup), longest-first
# with &amp; LAST (the standard double-escape ordering: "&amp;lt;"
# must decode to "&lt;" the TEXT, not to "<")
_ENTITIES = [
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
]


def strip_tags(col) -> Column:
    """Remove non-content containers (with their text), comments, and
    all remaining markup tags. Block-level separation is preserved as
    whitespace (tags are replaced by a space, so ``<p>a</p><p>b</p>``
    yields ``a b``, not ``ab``)."""
    c = col if isinstance(col, Column) else F.col(col)
    for pat in _CONTAINER_PATTERNS:
        c = F.regexp_replace(c, pat, " ")
    c = F.regexp_replace(c, _COMMENT_PATTERN, " ")
    return F.regexp_replace(c, _TAG_PATTERN, " ")


def html_entity_decode(col) -> Column:
    c = col if isinstance(col, Column) else F.col(col)
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def extract_text(col) -> Column:
    """The full chain: containers → comments → tags → entities →
    whitespace collapse + trim."""
    c = html_entity_decode(strip_tags(col))
    return F.trim(F.regexp_replace(c, r"\s+", " "))
