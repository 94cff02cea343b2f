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
  replay, time travel, history, per-file footer statistics, stats- and
  partition-based file skipping, file-pruned MERGE upsert, OPTIMIZE
  bin-packing (dataChange=false), Z-ORDER clustering, VACUUM with the
  tombstone retention window, and a streaming foreachBatch sink that
  commits one version per micro-batch.

Out of scope, documented: parquet checkpoint files + _last_checkpoint
(replay starts at version 0 — fine below ~10^4 commits; production
Delta writes a checkpoint every 10), multi-cluster LogStores (atomic
create is the local/HDFS put-if-absent contract; S3 needs an external
coordination service, same as OSS Delta), and column-mapping /
deletion-vector reader features.
"""

from .log import ConcurrentCommitError, commit_stats_df
from .table import DeltaishTable

__all__ = ["DeltaishTable", "ConcurrentCommitError", "commit_stats_df"]
