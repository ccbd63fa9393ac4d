"""Multi-host (multi-process) execution.

The reference scales across hosts only by launching independent SLURM jobs
and manually merging their outputs (reference: tutorials/
6_preprocessing_large_datasets.md:1-31, tools/combine_HDFs.py:120-189).
Here multi-host is first-class:

* :func:`init_distributed` wires ``jax.distributed.initialize`` from config
  or environment, after which ``jax.devices()`` spans every host and one
  jitted train step runs SPMD across all of them (collectives over ICI
  within a slice, DCN across slices -- placed by XLA, SURVEY.md §2.2);
* each host feeds its own disjoint shard of the training blocks through
  ``BlockLoader(shard_index=process_index, num_shards=process_count)``;
  :func:`make_global_placer` assembles the per-host local batches into
  global ``jax.Array``s without ever materialising a global batch on any
  single host (``jax.make_array_from_process_local_data``);
* every host must dispatch the same programs in the same order, so the
  per-epoch step count is the *minimum* over all hosts' shard lengths
  (:func:`global_steps_per_epoch`) -- computable locally because the block
  layout is a pure function of the dataset size.

Launch recipe (documented in docs/9_performance_and_parallelism.md):
every process runs the same job with ``coordinator_address`` set (host 0's
``ip:port``), ``num_processes`` and a unique ``process_id`` -- via input.csv
or the GRAPHINVENT_COORDINATOR / GRAPHINVENT_NUM_PROCESSES /
GRAPHINVENT_PROCESS_ID environment variables.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import numpy as np

from graphinvent_tpu.config import GraphInventConfig


def _env(name: str, default: Optional[str] = None) -> Optional[str]:
    v = os.environ.get(name, default)
    return v if v not in ("", None) else None


def init_distributed(cfg: Optional[GraphInventConfig] = None) -> bool:
    """Calls ``jax.distributed.initialize`` when multi-process execution is
    configured; returns True iff it did.  Safe to call unconditionally (and
    more than once): a single-process config is a no-op.

    Configuration sources (config fields win over environment):
      coordinator_address | GRAPHINVENT_COORDINATOR   host0's ip:port
      num_processes       | GRAPHINVENT_NUM_PROCESSES total process count
      process_id          | GRAPHINVENT_PROCESS_ID    this process's rank
    """
    coord = (getattr(cfg, "coordinator_address", "") or
             _env("GRAPHINVENT_COORDINATOR"))
    if not coord:
        return False
    nproc = int(getattr(cfg, "num_processes", 0) or
                _env("GRAPHINVENT_NUM_PROCESSES") or 0)
    pid = getattr(cfg, "process_id", -1)
    if pid is None or int(pid) < 0:
        pid = int(_env("GRAPHINVENT_PROCESS_ID") or 0)
    if nproc <= 1:
        return False

    import jax
    if jax.distributed.is_initialized():
        return True
    # NOTE: nothing before this point may touch the XLA backend
    # (jax.devices(), jax.process_count(), any computation) -- initialize()
    # must run first.
    # CPU-simulated multi-host (tests, dry runs) needs gloo collectives;
    # on TPU the PJRT plugin ignores this setting.
    if _env("JAX_PLATFORMS") == "cpu" or jax.config.read("jax_platforms") == "cpu":
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=int(pid))
    return True


def process_index() -> int:
    import jax
    return jax.process_index()


def process_count() -> int:
    import jax
    return jax.process_count()


def is_primary() -> bool:
    return process_index() == 0


def make_global_placer(mesh, specs: Dict) -> Callable:
    """-> place(local_batch) assembling per-host arrays into global
    ``jax.Array``s sharded per ``specs`` over ``mesh``.  Each host passes
    its *local* rows; the global batch is their concatenation in process
    order along the ``data`` axis."""
    import jax
    from jax.sharding import NamedSharding

    from jax.sharding import PartitionSpec
    shardings = {k: NamedSharding(mesh, s) for k, s in specs.items()}
    # keys outside the spec (the bitpacked "nodes_p"/"edges_p" wire format)
    # are row-major too -> data-sharded
    row = NamedSharding(mesh, PartitionSpec("data"))

    def place(local_batch):
        return {k: jax.make_array_from_process_local_data(
                    shardings.get(k, row), np.asarray(v))
                for k, v in local_batch.items()}

    return place


def to_host(tree):
    """Host-local numpy copy of a (replicated) pytree of global arrays.
    Each leaf must be replicated over the mesh -- true for params and
    optimizer state in multi-host runs, where tensor-parallel head sharding
    is disabled (mesh.py:_shardable_head)."""
    import jax

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)

    return jax.tree_util.tree_map(fetch, tree)


def scalar(x) -> float:
    """float() that also accepts a replicated global array."""
    if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
        return float(np.asarray(x.addressable_data(0)))
    return float(x)


def global_steps_per_epoch(n_rows: int, local_batch: int, block_size: int,
                           num_shards: int, drop_last: bool = False) -> int:
    """Per-epoch step count every host can agree on without communicating:
    the minimum over all shards' batch counts for the round-robin block
    layout of ``BlockLoader`` (data/loader.py:77-92)."""
    n_blocks = (n_rows + block_size - 1) // block_size
    counts = []
    for shard in range(num_shards):
        total = 0
        for b in range(shard, n_blocks, num_shards):
            rows = min((b + 1) * block_size, n_rows) - b * block_size
            total += rows // local_batch if drop_last else \
                (rows + local_batch - 1) // local_batch
        counts.append(total)
    return min(counts) if counts else 0
