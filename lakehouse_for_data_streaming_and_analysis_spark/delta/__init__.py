"""Delta-protocol-shaped transaction log over Spark parquet writes.

The reference stores every table as Delta Lake and leans on the
transaction log concretely: SCD merges (Sourcecode/spark/
populate_dim.py:153-163), OPTIMIZE/VACUUM (delta_manager.py:4-24), and
the latency notebooks parse per-commit file statistics straight out of
``_delta_log/*.json`` (TimeDelay.ipynb cell 0). delta-spark is not
installable in this sandbox (DECISIONS.md §11), so this package
implements the log itself from the PUBLIC Delta protocol spec
(github.com/delta-io/delta PROTOCOL.md): newline-delimited JSON commit
files named ``_delta_log/<version 020d>.json`` carrying ``protocol`` /
``metaData`` / ``add`` / ``remove`` / ``commitInfo`` actions, with
per-file ``stats`` (numRecords / minValues / maxValues) — written and
read by plain Python around Spark parquet writers.

In scope (tested in tests/test_deltalog.py):
  atomic put-if-absent commits + optimistic concurrency, snapshot
  replay resuming from parquet checkpoints (`<v>.checkpoint.parquet` +
  `_last_checkpoint`, auto-written every 10 commits), time travel,
  history, schema enforcement + mergeSchema/overwriteSchema evolution,
  per-file footer statistics, stats- and partition-based file
  skipping, file-pruned MERGE (upsert and whenMatchedUpdate SET),
  OPTIMIZE bin-packing (dataChange=false), Z-ORDER clustering, VACUUM
  with the tombstone retention window, table-as-stream reads
  (append-only guard), and a streaming foreachBatch sink with the
  `txn` action for exactly-once micro-batch retries.

Out of scope, documented: checkpoint rows are JSON-encoded action
columns rather than the spec's typed nested structs; multi-cluster
LogStores (atomic create is the local/HDFS put-if-absent contract; S3
needs an external coordination service, same as OSS Delta); and
column-mapping / deletion-vector reader features.
"""

from .log import ConcurrentCommitError, commit_stats_df
from .table import DeltaishTable

__all__ = ["DeltaishTable", "ConcurrentCommitError", "commit_stats_df"]
