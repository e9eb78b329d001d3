"""Checkpoint policy for operator-internal materialization.

Several operators materialize a bounded intermediate relation that
multiple consumers re-read within one query (LSH signature rows,
connected-components label frontiers, merge working sets). Locally
that is ``DataFrame.localCheckpoint()`` — cheap, no configuration —
but localCheckpoint stores blocks on EXECUTOR-LOCAL disk/memory and is
not fault-tolerant: on a real cluster, losing any executor that holds
a block kills the job (Spark recomputes lineage-truncated plans from
nothing). At 100 TB, corpus-proportional checkpoints (signatures are
|corpus|·n_tables·n_probes rows) also pin executor storage.

POLICY (r15): :func:`materialize_once` uses the RELIABLE checkpoint
(``DataFrame.checkpoint()`` — written to the fault-tolerant
``sparkContext.setCheckpointDir`` location, survives executor loss)
whenever the session has a checkpoint directory configured, and falls
back to ``localCheckpoint`` otherwise. A cluster deployment opts in
with one line (``spark.sparkContext.setCheckpointDir("hdfs://...")``),
the local bench/test path is unchanged, and both forms materialize the
same rows — the choice is durability, never semantics.

The txlog merge/delete paths keep their LAZY ``localCheckpoint
(eager=False)`` working sets deliberately: those relations are
O(update rows / matched keys), consumed within one commit's action
set, and an executor loss there fails a transaction that is designed
to be re-run (the commit protocol's no-partial-commit promise makes
the retry safe) — durability would buy nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["materialize_once"]


def materialize_once(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` once for multi-consumer reuse: reliable
    ``checkpoint()`` when the session has a checkpoint dir (cluster
    fault-tolerance escape hatch), ``localCheckpoint()`` otherwise."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
