"""Two-phase straggler harvest for the sampling loop (round-5 occupancy
study, BASELINE.md).

The single-program sampler (generator.py) runs its while_loop until EVERY
row terminates; the round-occupancy measurement (tools/occupancy.py) showed
the tail is nearly empty at N=80 -- 96 rounds run while mean actions/row is
58, so late rounds pay full forwards for mostly-frozen rows (60.4% mean
occupancy, ideal-compaction bound 1.66x, amortized two-phase ceiling 1.26x).
The reference answered the same waste with slot recycling inside its Python
loop (reference: GraphGenerator.py:99-161); on TPU the static-shape answer
is this two-phase scheme:

* **phase 1**: the normal jitted loop capped at ``phase1_rounds`` (~ the
  p50 action count).  Rows still live at the cap come back frozen
  mid-build with ``done=0`` in the packed buffer.
* **continuation**: live rows from many phase-1 batches are COMPACTED into
  full batches of their carried state (bit-packed wire rows, re-uploaded
  as-is) and the identical loop resumes them to completion.

This is state continuation, not molecule resampling: a carried row's
action distribution at every step is exactly what the single-phase loop
would have sampled, so there is no length or termination bias (the naive
alternative -- discarding stragglers and sampling fresh rows -- would bias
toward short molecules).  Phase-1-complete rows are byte-identical to the
single-phase sampler's output for the same key (tests/test_sampler.py).
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graphinvent_tpu.config import GraphInventConfig
from graphinvent_tpu.models import apply_model
from graphinvent_tpu.sampling.generator import (GraphSampler, Params,
                                                SampleResult, _pack_outputs,
                                                _sample_loop)


def _row_layout(cfg: GraphInventConfig) -> dict:
    """Byte offsets of the packed-buffer row (generator._pack_outputs)."""
    N, Fn, E = cfg.max_n_nodes, cfg.n_node_features, cfg.n_edge_features
    L = cfg.gen_action_budget
    nb = (N * Fn + 7) // 8
    eb = (N * N * E + 7) // 8
    off = {}
    o = 0
    for name, width in (("nodes", nb), ("edges", eb), ("n_nodes", 1),
                        ("term", 1), ("done", 1), ("t_lo", 1), ("t_hi", 1),
                        ("acts_lo", L), ("acts_hi", L), ("ll", 4 * L),
                        ("rounds", 2)):
        off[name] = (o, o + width)
        o += width
    off["row_bytes"] = o
    return off


def _device_unpack_state(cfg: GraphInventConfig, packed: jnp.ndarray) -> dict:
    """Packed uint8 rows -> the sampler's loop-carry state, on device.
    Exact inverse of the relevant _pack_outputs fields; runs inside the
    continuation program so the host uploads only the 8x-bitpacked rows."""
    N, Fn, E = cfg.max_n_nodes, cfg.n_node_features, cfg.n_edge_features
    L = cfg.gen_action_budget
    B = packed.shape[0]
    off = _row_layout(cfg)
    sl = lambda k: packed[:, off[k][0]:off[k][1]]
    unbits = lambda x, n: jnp.unpackbits(x, axis=1, count=n)
    nodes = unbits(sl("nodes"), N * Fn).reshape(B, N, Fn)
    edges = unbits(sl("edges"), N * N * E).reshape(B, N, N, E)
    t = (sl("t_lo")[:, 0].astype(jnp.int32)
         | (sl("t_hi")[:, 0].astype(jnp.int32) << 8))
    acts = (sl("acts_lo").astype(jnp.int32)
            | (sl("acts_hi").astype(jnp.int32) << 8))
    ll = jax.lax.bitcast_convert_type(
        sl("ll").reshape(B, L, 4), jnp.float32)
    return dict(nodes=nodes, edges=edges,
                n_nodes=sl("n_nodes")[:, 0].astype(jnp.int32), t=t,
                ll=ll, acts=acts,
                done=sl("done")[:, 0] != 0, term=sl("term")[:, 0] != 0)


class TwoPhaseSampler:
    """Capped phase-1 rollout + compacted continuation of stragglers.

    Drop-in throughput alternative to looping ``GraphSampler.sample``:
    :meth:`sample_many` produces the same ``n_batches`` x ``batch_size``
    molecules (per-batch SampleResults, phase-1-complete rows
    byte-identical), trading one extra upload + program dispatch per
    continuation batch for the empty tail rounds.  Worthwhile only where
    the occupancy tail is long (N=80: amortized ceiling 1.26x;
    at N<=40 the overhead exceeds the saved rounds -- BASELINE.md)."""

    def __init__(self, cfg: GraphInventConfig, batch_size: int,
                 phase1_rounds: int,
                 apply_fn: Optional[Callable] = None) -> None:
        self.cfg = cfg
        self.batch_size = batch_size
        self.phase1_rounds = phase1_rounds
        self._off = _row_layout(cfg)
        apply_fn = apply_fn or (
            lambda params, nodes, edges: apply_model(cfg, params, nodes,
                                                     edges))
        B = batch_size

        p1 = jax.jit(lambda params, key: _pack_outputs(
            *_sample_loop(cfg, params, key, B, apply_fn,
                          stop_round=phase1_rounds)))
        cont = jax.jit(lambda params, key, packed: _pack_outputs(
            *_sample_loop(cfg, params, key, B, apply_fn,
                          init_state=_device_unpack_state(cfg, packed))))

        def wrap(fn):
            def run(*args):
                from graphinvent_tpu.models.fused_enn import fused_inference
                with fused_inference():       # grad-free rollout
                    return fn(*args)
            return run

        self._p1 = wrap(p1)
        self._cont = wrap(cont)

    # ------------------------------------------------------------------
    def sample_many(self, params: Params, key: jax.Array, n_batches: int,
                    quiet: bool = True) -> Tuple[List[SampleResult], dict]:
        """``n_batches`` batches; returns per-batch SampleResults (same
        contract as ``GraphSampler.sample`` per batch, elapsed_s amortized;
        ``n_rounds`` reports the PHASE-1 rounds for the batch -- per-row
        work lives in ``t_counts``) and a stats dict (straggler count,
        continuation batches, wall)."""
        B = self.batch_size
        d0, d1 = self._off["done"]
        r0, r1 = self._off["rounds"]
        t0 = time.time()

        buffers: List[np.ndarray] = []
        pool: List[Tuple[int, int]] = []         # (batch, row) of stragglers
        for b in range(n_batches):
            # np.array (copy): rows are scatter-written by the continuation
            packed = np.array(self._p1(params, jax.random.fold_in(key, b)))
            buffers.append(packed)
            for i in np.nonzero(packed[:, d0] == 0)[0]:
                pool.append((b, int(i)))

        n_straggler = len(pool)
        n_cont = 0
        while pool:
            take = pool[:B]
            pool = pool[B:]
            rows = np.stack([buffers[b][i] for b, i in take])
            if len(take) < B:                    # pad with done rows
                pad = np.repeat(rows[-1:], B - len(take), axis=0)
                pad[:, d0] = 1
                rows = np.concatenate([rows, pad])
            out = np.asarray(self._cont(
                params, jax.random.fold_in(key, n_batches + n_cont),
                jnp.asarray(rows)))
            for k, (b, i) in enumerate(take):
                rounds_bytes = buffers[b][i, r0:r1].copy()
                buffers[b][i] = out[k]
                # keep the batch-uniform phase-1 rounds field: the decoder
                # reads n_rounds from row 0, and the continuation program's
                # own (restarted) counter is not this batch's round count
                buffers[b][i, r0:r1] = rounds_bytes
            n_cont += 1

        wall = time.time() - t0
        per_batch = wall / max(n_batches, 1)
        results = [self._decode_packed(buf, per_batch, quiet)
                   for buf in buffers]
        stats = dict(n_stragglers=n_straggler, n_continuation=n_cont,
                     wall_s=wall,
                     straggler_frac=n_straggler / max(n_batches * B, 1))
        return results, stats

    # decode reuse: GraphSampler._decode_packed only touches cfg/batch_size
    _decode_packed = GraphSampler._decode_packed
