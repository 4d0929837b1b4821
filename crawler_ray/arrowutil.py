"""Arrow interop helpers shared across stages.

``pa.Table.from_pandas`` attaches a ``b'pandas'`` schema-metadata
blob to every converted table. PyArrow's ``Schema.__eq__`` ignores
metadata, so schema-pinning checks (e.g. ``dedup._grouped_apply``)
pass such tables through unnormalized — and Ray Data's streaming
executor then fails to hash the schema for its dedup cache
("Failed to hash the schemas (for deduplication): unhashable type:
'dict'"), re-serializing the schema per block. Every pandas→Arrow
conversion that feeds a Dataset stage output therefore goes through
:func:`table_from_pandas`, which drops the metadata.
"""
from __future__ import annotations

import pandas as pd
import pyarrow as pa


def table_from_pandas(df: pd.DataFrame, *, schema: pa.Schema | None = None
                      ) -> pa.Table:
    """``pa.Table.from_pandas(df, preserve_index=False)`` with the
    pandas schema-metadata stripped (see module docstring)."""
    t = pa.Table.from_pandas(df, preserve_index=False, schema=schema)
    if t.schema.metadata:
        t = t.replace_schema_metadata(None)
    return t
