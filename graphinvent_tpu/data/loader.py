"""Block-shuffled HDF input pipeline.

TPU-native rebuild of BlockDatasetLoader.py: the two-level scheme is kept
(sequential block reads from disk, shuffling *within* a block -- avoids
random row reads, reference BlockDatasetLoader.py:11-63) but the
implementation is NumPy + host prefetch instead of nested torch DataLoaders:

* batches have a *fixed* shape (last partial batch is zero-padded and
  carries a ``valid`` row mask) so one jitted train step serves the whole
  epoch -- no recompilation on remainder batches;
* a ``shard_index / num_shards`` pair slices blocks round-robin across
  hosts for multi-host data parallelism (the reference had no multi-host
  input path; SURVEY.md §2.2);
* an optional background thread prefetches the next block while the
  accelerator trains on the current one.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional, Tuple

import h5py
import numpy as np


class HDFDataset:
    """Reads the three datasets written by preprocessing: ``nodes``,
    ``edges``, ``APDs`` (same layout as the reference,
    BlockDatasetLoader.py:117-147)."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._file = h5py.File(path, "r", swmr=True)
        self.nodes = self._file["nodes"]
        self.edges = self._file["edges"]
        self.apds = self._file["APDs"]
        self.n_subgraphs = int(self.nodes.shape[0])

    def __len__(self) -> int:
        return self.n_subgraphs

    def read_block(self, start: int, end: int,
                   dtype=np.float32) -> Dict[str, np.ndarray]:
        return {
            "nodes": np.asarray(self.nodes[start:end], dtype=dtype),
            "edges": np.asarray(self.edges[start:end], dtype=dtype),
            "apds": np.asarray(self.apds[start:end], dtype=dtype),
        }

    def close(self) -> None:
        self._file.close()


def pack_rows(a: np.ndarray) -> np.ndarray:
    """0/1 int8 rows -> bitpacked uint8 ``(B, ceil(prod(shape[1:])/8))``.

    The streamed-training wire format: node/edge tensors are 0/1 one-hots,
    so 8 rows of bits per byte cut the host->device upload 8x (through the
    ~50 MB/s tunnel the per-batch upload was 0.65 s at N=80 B=500 -- the
    same trick the sampler uses device->host, sampling/generator.py).
    ``train.step.batch_arrays`` unpacks on device inside the jitted step."""
    B = a.shape[0]
    return np.packbits(np.ascontiguousarray(a).reshape(B, -1), axis=1)


def sparse_apds(apds: np.ndarray, cap: int
                ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """APD target rows -> fixed-width (indices uint16, values int8) pairs,
    or None when any row carries more than ``cap`` nonzeros (caller falls
    back to the dense wire for that batch).

    APD rows are extremely sparse -- a decoding step targets one action
    (plus duplicate-subgraph merges, DataProcesser.py:207-231): measured
    max 8 nonzeros over 200k rows of the round-5 100k-molecule set -- yet
    the dense int8 row (dim_apd bytes, e.g. 2561 at N=40) dominated the
    streamed upload at ~70% of the wire bytes.  32 slots x 3 bytes is a
    ~27x cut on that component.  Reconstruction on device is a scatter-add
    (train/step.batch_arrays), so padded (0, 0) slots are exact no-ops and
    the loss trajectory is byte-identical to the dense wire."""
    B, A = apds.shape
    if A > np.iinfo(np.uint16).max:
        return None
    nz_b, nz_j = np.nonzero(apds)
    counts = np.bincount(nz_b, minlength=B)
    if len(nz_b) and counts.max() > cap:
        return None
    idx = np.zeros((B, cap), np.uint16)
    val = np.zeros((B, cap), apds.dtype)
    pos = np.arange(len(nz_b)) - np.repeat(np.cumsum(counts) - counts,
                                           counts)
    idx[nz_b, pos] = nz_j
    val[nz_b, pos] = apds[nz_b, nz_j]
    return idx, val


class BlockLoader:
    """Iterates fixed-shape batches over an :class:`HDFDataset`."""

    def __init__(self, dataset: HDFDataset, batch_size: int,
                 block_size: int, shuffle: bool = True, seed: int = 0,
                 shard_index: int = 0, num_shards: int = 1,
                 drop_last: bool = False, prefetch: bool = True,
                 packed: bool = False, apd_nnz: int = 0) -> None:
        if block_size < batch_size:
            raise ValueError("block_size must be >= batch_size "
                             "(reference: BlockDatasetLoader.py:85)")
        self.dataset = dataset
        self.batch_size = batch_size
        self.block_size = block_size
        self.shuffle = shuffle
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.drop_last = drop_last
        self.prefetch = prefetch
        # packed: yield the bitpacked wire format ("nodes_p"/"edges_p"
        # uint8 + int8 "apds") instead of float32 tensors -- ~8x smaller
        # host->device uploads; the jitted steps unpack on device.
        # apd_nnz > 0 additionally ships APD targets sparse ("apds_i"/
        # "apds_v", see sparse_apds) with automatic per-batch dense
        # fallback on overflow
        self.packed = packed
        self.apd_nnz = apd_nnz
        self._epoch = 0

    # ------------------------------------------------------------------
    def _my_blocks(self) -> list:
        n = len(self.dataset)
        n_blocks = (n + self.block_size - 1) // self.block_size
        blocks = [(b * self.block_size, min((b + 1) * self.block_size, n))
                  for b in range(n_blocks)]
        return blocks[self.shard_index::self.num_shards]

    def __len__(self) -> int:
        total = 0
        for start, end in self._my_blocks():
            rows = end - start
            if self.drop_last:
                total += rows // self.batch_size
            else:
                total += (rows + self.batch_size - 1) // self.batch_size
        return total

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    # ------------------------------------------------------------------
    def _iter_blocks(self) -> Iterator[Dict[str, np.ndarray]]:
        blocks = self._my_blocks()
        rng = np.random.default_rng((self.seed, self._epoch))
        if self.shuffle:
            rng.shuffle(blocks)
        dtype = np.int8 if self.packed else np.float32
        if not self.prefetch or len(blocks) <= 1:
            for start, end in blocks:
                yield self.dataset.read_block(start, end, dtype)
            return
        q: "queue.Queue" = queue.Queue(maxsize=1)
        stop = object()

        def worker() -> None:
            try:
                for start, end in blocks:
                    q.put(self.dataset.read_block(start, end, dtype))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        t.join()

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng((self.seed + 1, self._epoch))
        bs = self.batch_size
        for block in self._iter_blocks():
            rows = block["nodes"].shape[0]
            order = rng.permutation(rows) if self.shuffle else np.arange(rows)
            n_batches = rows // bs if self.drop_last \
                else (rows + bs - 1) // bs
            for k in range(n_batches):
                idx = order[k * bs:(k + 1) * bs]
                nodes = block["nodes"][idx]
                edges = block["edges"][idx]
                apds = block["apds"][idx]
                n_valid = len(idx)
                if n_valid < bs:   # zero-pad the remainder batch
                    pad = bs - n_valid
                    nodes = np.concatenate(
                        [nodes, np.zeros((pad,) + nodes.shape[1:], nodes.dtype)])
                    edges = np.concatenate(
                        [edges, np.zeros((pad,) + edges.shape[1:], edges.dtype)])
                    apds = np.concatenate(
                        [apds, np.zeros((pad,) + apds.shape[1:], apds.dtype)])
                valid = np.zeros(bs, np.float32)
                valid[:n_valid] = 1.0
                if self.packed:
                    out = {"nodes_p": pack_rows(nodes),
                           "edges_p": pack_rows(edges), "valid": valid}
                    sp = (sparse_apds(apds, self.apd_nnz)
                          if self.apd_nnz else None)
                    if sp is not None:
                        out["apds_i"], out["apds_v"] = sp
                    else:
                        out["apds"] = apds
                    yield out
                else:
                    yield {"nodes": nodes, "edges": edges, "apds": apds,
                           "valid": valid}
        self._epoch += 1
