"""Plan pinning with a cluster-mode durability switch.

Iterative operators (connected components, PageRank, BPE) and multi-
consumer intermediates (LSH candidate relations, tiny aggregates read by
several branches) materialize a DataFrame once so downstream consumers
don't re-run the producing subplan. Locally ``localCheckpoint`` is the
right tool — executor-memory/disk blocks, no external storage, eager.

On a REAL cluster it has a sharp edge: localCheckpoint truncates lineage
and stores the blocks only on executors, so losing an executor loses the
blocks and FAILS the job instead of recomputing. The reference's own
cluster runs on spot instances (``jobs/confluent.json:84-98`` —
``availability: SPOT_WITH_FALLBACK``), exactly the environment where
that trade is wrong. ``pin`` therefore routes every pin site through one
switch:

* ``local`` (default) — ``df.localCheckpoint(eager=True)``. Fastest;
  not fault-tolerant. Right for local[] runs, benchmarks, tests.
* ``reliable`` — ``df.checkpoint(eager=True)`` to the SparkContext
  checkpoint dir (set it via ``SPARK_GRAFT_CHECKPOINT_DIR`` or
  ``sc.setCheckpointDir``). Survives executor loss; costs a write to
  reliable storage (HDFS/S3). Right for spot-instance clusters.
* ``persist`` — ``DISK_ONLY`` persist + eager materialization. Keeps
  lineage, so lost blocks are RECOMPUTED rather than fatal, without
  needing external storage; the trade is that the lineage (and its
  re-execution cost) stays live, and the block stays cached until the
  app ends or the caller unpersists.

Select globally with ``SPARK_GRAFT_PIN_MODE`` or per call with
``pin(df, mode=...)``.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_VALID = ("local", "reliable", "persist")

_warned_frozen_sites: set[str] = set()


def pin_mode() -> str:
    mode = os.environ.get("SPARK_GRAFT_PIN_MODE", "local")
    if mode not in _VALID:
        raise ValueError(
            f"SPARK_GRAFT_PIN_MODE={mode!r}; expected one of {_VALID}"
        )
    return mode


def pin(
    df: DataFrame,
    mode: str | None = None,
    *,
    require_frozen: bool = False,
    site: str | None = None,
) -> DataFrame:
    """Materialize ``df`` once and truncate (or freeze) its lineage so
    multiple consumers / iterative rounds don't re-run the producing
    subplan. See module docstring for the mode trade-offs.

    ``require_frozen=True`` declares that recomputing this plan could
    change its RESULT, not just cost time — e.g. range-partitioned
    global ranking (repartitionByRange re-samples bounds per job, so a
    recompute assigns different ranks) or a relation whose lineage reads
    a path the caller is about to overwrite (the bloom bitmap). The
    'persist' mode keeps lineage and recomputes lost blocks, which
    would silently corrupt such results; under persist mode frozen
    sites therefore route to a RELIABLE checkpoint when a checkpoint
    dir is configured (keeping the fault tolerance the user chose
    persist for), else fall back to localCheckpoint with a one-time
    warning (reliable mode already truncates lineage and stays as
    chosen)."""
    mode = mode or pin_mode()
    if require_frozen and mode == "persist":
        # Frozen sites can't use persist's recompute-on-loss semantics.
        # If reliable storage is configured, route them there so they
        # KEEP fault tolerance (the reason the user chose persist);
        # otherwise fall back to localCheckpoint with a one-time warning
        # so operators know which pins remain non-fault-tolerant.
        has_ckpt_dir = bool(
            os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
        ) or not df.sparkSession.sparkContext._jsc.sc().getCheckpointDir().isEmpty()  # noqa: SLF001
        if has_ckpt_dir:
            mode = "reliable"
        else:
            # one warning per frozen SITE, not per process: operators
            # need to see every pin that remains non-fault-tolerant
            # under persist mode, not just the first one hit. Unlabeled
            # sites warn every time (loud beats silent).
            if site is None or site not in _warned_frozen_sites:
                if site is not None:
                    _warned_frozen_sites.add(site)
                import warnings

                warnings.warn(
                    f"SPARK_GRAFT_PIN_MODE=persist: frozen pin site "
                    f"{site or '(unlabeled)'} must not "
                    "recompute, so it uses localCheckpoint and stays "
                    "NON-fault-tolerant. Set SPARK_GRAFT_CHECKPOINT_DIR "
                    "to route frozen sites to reliable checkpoints "
                    "instead.",
                    stacklevel=2,
                )
            mode = "local"
    if mode == "local":
        return df.localCheckpoint(eager=True)
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():  # noqa: SLF001
            ckpt = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
            if not ckpt:
                raise RuntimeError(
                    "pin mode 'reliable' needs a checkpoint dir: set "
                    "SPARK_GRAFT_CHECKPOINT_DIR or call "
                    "sc.setCheckpointDir first"
                )
            sc.setCheckpointDir(ckpt)
        return df.checkpoint(eager=True)
    # persist: recompute-on-loss semantics; eager so the single
    # materialization happens here, not per consumer
    df = df.persist(StorageLevel.DISK_ONLY)
    df.count()
    return df
