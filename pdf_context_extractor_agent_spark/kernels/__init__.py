"""Layout stratum: Arrow-vectorized kernels (the only imperative parsing).

Mirrors the reference's pdfplumber layer (src/pdf_reader.py:17-136 and the
table/word/position accessors used at src/parsers/batch_notes_extractor.py:
454,497) — re-expressed as ``mapInPandas`` kernels over the ``html binary``
column so all parsing happens inside Arrow batches on executors.
"""

from .html_layout import (  # noqa: F401
    PAGE_SCHEMA,
    extract_pages,
    extracted_text,
    parse_doc,
    parse_html_doc,
)
from .pdfish_layout import parse_pdfish  # noqa: F401
