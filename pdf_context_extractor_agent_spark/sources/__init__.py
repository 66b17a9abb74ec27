"""Sources/sinks: pages-table scan, salted repartition, testdata loaders."""

from .pages import read_pages, salted_repartition, skew_partitioned, split_by_size  # noqa: F401
from .testdata import load_table, register_views  # noqa: F401
