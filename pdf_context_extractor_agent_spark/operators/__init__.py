"""Relational stratum: every reference operator as DataFrame algebra.

SURVEY.md §2 mapping — P* (boundary.py), M* (merge.py), C* (columns.py),
SI* (structure.py), J* (match.py), V* (validate.py), N* (notes.py).
No RDDs, no row-at-a-time Python UDFs; the two pandas UDFs in columns.py
are the designated per-document layout-analysis kernels.
"""

from .boundary import balance_boundaries, prune_rows_to_boundary  # noqa: F401
from .compare import (  # noqa: F401
    choice_statistics,
    compare_column_maps,
    resolve_choices,
)
from .merge import merged_clean_rows, rows_long, tables_long  # noqa: F401
from .structure import identify_structures  # noqa: F401
from .match import match_items  # noqa: F401
from .columns import extract_items  # noqa: F401
from .validate import validation_checks, validation_summary  # noqa: F401
from .notes import extract_notes, notes_continuity  # noqa: F401
