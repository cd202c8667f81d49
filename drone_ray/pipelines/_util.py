"""Shared pipeline helpers."""

from __future__ import annotations

import pyarrow as pa


def pin_schema(schema: pa.Schema):
    """map_batches shim that casts every block to ``schema`` — zero-block
    datasets out of a groupby lose their schema, and downstream unions /
    drivers need a stable one. Empty input → typed empty table."""

    def fix(b: pa.Table) -> pa.Table:
        return b.cast(schema) if b.num_columns else schema.empty_table()

    return fix
