from qendpoint_spark.extraction.html_text import extract_text_udf, render_html
from qendpoint_spark.extraction.triples import (
    extract_triples_from_documents,
    extract_triples_from_pages,
    mentions_udf,
)

__all__ = [
    "extract_text_udf",
    "render_html",
    "extract_triples_from_documents",
    "extract_triples_from_pages",
    "mentions_udf",
]
