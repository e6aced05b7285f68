"""HTML text extraction (functions/html.py): container/tag/entity
semantics, double-escape ordering, malformed-markup degradation."""

from __future__ import annotations

import pytest

from acorn_hybrid_vector_search_spark.functions.html import extract_text


@pytest.fixture(scope="module")
def run(spark):
    def _run(html: str) -> str:
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(html,)], "h string")
        return df.select(extract_text("h").alias("t")).head()["t"]

    return _run


def test_containers_lose_their_text(run):
    assert run(
        "<body><script>var kill_me = 1;</script><p>keep</p>"
        "<style>.x{}</style><nav>Home | About</nav></body>"
    ) == "keep"


def test_block_tags_become_word_separators(run):
    assert run("<p>a</p><p>b</p>") == "a b"


def test_comments_and_attrs_stripped(run):
    assert run('<!-- secret --><a href="http://x.test">link</a>') == "link"


def test_entity_double_escape_ordering(run):
    # "&amp;lt;" is the TEXT "&lt;" — it must NOT become "<"
    assert run("<p>&amp;lt;tag&amp;gt; and Tom &amp; Jerry &lt;3</p>") == (
        "&lt;tag&gt; and Tom & Jerry <3"
    )


def test_escaped_script_is_text_not_markup(run):
    # entities decode AFTER tag stripping: &lt;script&gt; can never
    # become a live container
    assert run("<p>&lt;script&gt;x&lt;/script&gt;</p>") == "<script>x</script>"


def test_malformed_markup_degrades_not_raises(run):
    assert run("<p>unclosed <b>bold") == "unclosed bold"
    # unclosed container: the container pattern needs the closing tag,
    # so only the opening tag is stripped (as a plain tag) — text kept
    assert run("<script>never closed") == "never closed"
    # documented regex-extractor cost: a bare '<'...'>' span reads as a
    # tag (real bulk extractors share this; HTML entities &lt;/&gt; are
    # the correct encoding and round-trip fine)
    assert run("3 < 5 and 7 > 2") == "3 2"
    assert run("3 &lt; 5 and 7 &gt; 2") == "3 < 5 and 7 > 2"


def test_nbsp_collapses_with_whitespace(run):
    assert run("a&nbsp;&nbsp;b   c") == "a b c"
