"""Column-level building blocks (pure `pyspark.sql.functions` — JVM-side)."""

from .text import (  # noqa: F401
    clean_cells,
    is_header_row,
    joined_row_text,
    name_from_cell,
    nonempty_row_text,
    rlike_any,
    to_num,
)
