"""Sources/sinks: pages-table scan, salted repartition, testdata loaders."""

from .pages import (  # noqa: F401
    decomposed_pages,
    read_pages,
    salted_repartition,
    skew_partitioned,
    sniff_content_type,
    split_by_size,
    split_html_chunks,
)
from .testdata import load_table, register_views  # noqa: F401
