"""icebox — an Iceberg-semantics table layer over Parquet + JSON manifests.

The sandbox has no Iceberg/Delta runtime jars, so the engine ships its own
minimal snapshot-committed table format with the four Iceberg properties
the north rule needs:

  1. atomic snapshot commits (manifest written once, CURRENT pointer
     swapped by atomic rename — crash before the swap leaves only orphan
     data files, never a torn table);
  2. idempotent tagged commits (each commit may carry a tag, e.g.
     ``batch:17``; replaying a tagged commit is a no-op → exactly-once);
  3. schema evolution (add nullable column, int→long / float→double
     widening; every data file remembers the schema it was written under
     and readers reconcile to the current schema);
  4. time travel (any snapshot id readable forever; data files are
     immutable).

Partition spec is ``bucket(doc_id) = pmod(xxhash64(doc_id), n_buckets)``;
copy-on-write MERGE rewrites only touched buckets. On a networked cluster
the same engine logic runs against real Iceberg via a thin adapter — all
merge logic is plain DataFrame code either way.

Reference parity: versioned immutable publishes + ADD PARTITION
(/root/reference/athena-schema/add-buildings-partitions.js:4-10),
Overwrite idempotency (/root/reference/footprint-res/resolve-footprints.scala:207),
Hive path partitioning (/root/reference/grid-and-attrs/app.js:53-69).
"""

from .cursor import ChangeCursor
from .table import ConcurrentCommitError, IceboxTable, SchemaEvolutionError

__all__ = [
    "ChangeCursor",
    "ConcurrentCommitError",
    "IceboxTable",
    "SchemaEvolutionError",
]
