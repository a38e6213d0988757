"""Hash-join helper.

Ray 2.49's ``Dataset.join`` emits KEY-ONLY empty blocks for empty hash
partitions; anything downstream that expects the full schema (including a
second join) then fails.  ``hash_join`` wraps the join with a schema-
normalizing ``map_batches`` so every block — empty or not — carries the
declared output schema in declared order.
"""

from __future__ import annotations

import pyarrow as pa


def hash_join(left, right, *, on: tuple[str, ...], num_partitions: int,
              out_schema: dict[str, pa.DataType], join_type: str = "inner"):
    """left ⋈ right on ``on`` with a guaranteed output schema.

    ``out_schema`` maps every expected output column to its Arrow type;
    empty blocks are rebuilt to that schema, non-empty blocks are
    projected/ordered to it."""
    j = left.join(right, join_type=join_type, num_partitions=num_partitions, on=on)

    def fix(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({k: pa.array([], type=t) for k, t in out_schema.items()})
        return pa.table({k: b[k].cast(t) if b.schema.field(k).type != t else b[k]
                         for k, t in out_schema.items()})

    out = j.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)
    # Coalesce away empty partition blocks: Ray 2.49's hash shuffle skips
    # its schema broadcast when the FIRST block it shuffles is empty, so an
    # empty block flowing into a downstream join makes aggregator-side
    # Acero fail with "No match for key field on left side". A lightweight
    # (non-shuffling) repartition removes the hazard for chained joins.
    return out.repartition(num_partitions)
