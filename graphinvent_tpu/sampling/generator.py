"""On-device autoregressive graph generation.

Rebuilds GraphGenerator (GraphGenerator.py:21-657) as a single jitted
``jax.lax.while_loop``: the whole batch state -- node/edge tensors, node
counts, per-action log-likelihood slots, done flags and the PRNG key -- is
the loop carry, and one model forward runs per action round.  Chemistry
(validity, SMILES) runs on host only after the loop exits.

Design deltas vs the reference (SURVEY.md §7 + TPU profiling):
  * no dummy graph pinned at slot 0 (GraphGenerator.py:387-423) -- the dense
    MPNN formulation handles all-empty graphs natively;
  * no slot recycling / finished-graph output buffers
    (GraphGenerator.py:340-465).  The reference recycles slots so one call
    can yield more than batch_size graphs, then truncates back to
    batch_size; here each slot builds exactly one graph and freezes when it
    terminates.  The returned contract is identical (batch_size graphs,
    properly_terminated flags, per-action likelihoods) and the copy-out
    scatters -- which lower to ~100us/row serial loops on TPU -- disappear
    entirely.  All indexed reads/writes in the loop are one-hot
    contractions (see sampling/actions.py);
  * action sampled with ``jax.random.categorical`` on the APD logits
    (equivalent to Multinomial on the softmax);
  * a graph exceeding its likelihood-slot budget (cfg.gen_action_budget,
    default 2*max_n_nodes actions,
    the reference's buffer size) is force-invalidated instead of silently
    overflowing (GraphGenerator.py:172);
  * final log-likelihood is the principled sum of per-action log
    probabilities.  (The reference computes ``log(sum_t p_t)`` --
    GraphGenerator.py:81-83 -- which we treat as a latent bug and do not
    replicate.)
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graphinvent_tpu.config import GraphInventConfig
from graphinvent_tpu.models import apply_model
from graphinvent_tpu.sampling.actions import (
    apply_actions, decode_actions, onehot, select_rows,
)
from graphinvent_tpu.chem.molgraph import MolGraph

Params = Any


@dataclass
class SampleResult:
    graphs: List[MolGraph]               # batch_size generated graphs
    action_nlls: np.ndarray              # concatenated -log p per action
    final_loglikelihoods: np.ndarray     # (batch_size,) sum of log p
    properly_terminated: np.ndarray      # (batch_size,) 0/1
    n_rounds: int
    elapsed_s: float
    actions: Optional[np.ndarray] = None   # (batch_size, L) action ids
    t_counts: Optional[np.ndarray] = None  # (batch_size,) actions per graph
    unpack_s: float = 0.0                  # host unpack + MolGraph wrap time
    done: Optional[np.ndarray] = None      # 0/1; 0 only for phase-1-capped
                                           # rows (two_phase.py stragglers)

    @property
    def graphs_per_s(self) -> float:
        return len(self.graphs) / max(self.elapsed_s, 1e-9)


def _sample_loop(cfg: GraphInventConfig, params: Params, key: jax.Array,
                 batch_size: int, apply_fn: Callable,
                 mesh=None, fixed_rounds: Optional[int] = None,
                 stop_round: Optional[int] = None,
                 init_state: Optional[dict] = None
                 ) -> Tuple[jnp.ndarray, ...]:
    """``fixed_rounds``: run exactly that many action rounds via
    ``lax.fori_loop`` instead of the early-exit ``while_loop`` -- identical
    body; used by the sampler roofline (tools/roofline.py) where a static
    trip count makes per-round cost attribution exact.

    ``stop_round`` / ``init_state`` are the two-phase straggler-harvest
    hooks (sampling/two_phase.py): phase 1 caps the while_loop at
    ``stop_round`` rounds (rows still live then come back with done=0);
    the continuation pass restarts the identical loop from ``init_state``
    (the phase-1 carry for a compacted batch of live rows).  State
    continuation, not resampling -- a row's action distribution is
    unchanged, so the scheme is unbiased (BASELINE.md round-5 occupancy
    study)."""
    B = batch_size
    N = cfg.max_n_nodes
    Fn = cfg.n_node_features
    E = cfg.n_edge_features
    L = cfg.gen_action_budget          # likelihood slots (config.py; the
    max_rounds = L + 4                 # reference sizes this 2*max_n_nodes)
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    init = dict(
        key=key,
        nodes=jnp.zeros((B, N, Fn), dt),
        edges=jnp.zeros((B, N, N, E), dt),
        n_nodes=jnp.zeros((B,), jnp.int32),
        t=jnp.zeros((B,), jnp.int32),            # actions taken per graph
        ll=jnp.zeros((B, L), jnp.float32),       # log p per action
        acts=jnp.zeros((B, L), jnp.int32),       # action ids
        done=jnp.zeros((B,), jnp.bool_),
        term=jnp.zeros((B,), jnp.bool_),         # properly terminated
        rounds=jnp.zeros((), jnp.int32),
    )
    if init_state is not None:
        # continuation: resume frozen mid-build rows (fresh key + rounds=0;
        # the t/ll/acts budget carries, so overflow invalidation still
        # bounds every row)
        init.update({k: jnp.asarray(v).astype(init[k].dtype)
                     for k, v in init_state.items()})
    if mesh is not None:
        # data-parallel sampling: every batched loop-carry shards its batch
        # axis over ``data`` (rows are independent -- the whole rollout
        # partitions with zero collectives, reference GraphGenerator.py:48-96
        # had one GPU)
        from jax.sharding import NamedSharding, PartitionSpec as P
        row_sh = NamedSharding(mesh, P("data"))
        init = {k: (jax.lax.with_sharding_constraint(v, row_sh)
                    if hasattr(v, "ndim") and v.ndim >= 1 and
                    v.shape[0] == B else v)
                for k, v in init.items()}

    def cond(c):
        live = (~jnp.all(c["done"])) & (c["rounds"] < max_rounds)
        if stop_round is not None:
            live = live & (c["rounds"] < stop_round)
        return live

    def body(c):
        key, sub = jax.random.split(c["key"])
        logits = apply_fn(params, c["nodes"], c["edges"]).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=1)
        action = jax.random.categorical(sub, logits, axis=1)
        logp_sel = select_rows(logp, action)

        live = ~c["done"]
        acts = decode_actions(cfg, action, c["n_nodes"], c["edges"])
        overflow = c["t"] >= (L - 1)
        invalid = live & (acts.invalid | (overflow & ~acts.is_term))
        done_term = live & acts.is_term & ~invalid

        # record this action's log-likelihood + id (one-hot slot update)
        slot_oh = onehot(jnp.clip(c["t"], 0, L - 1), L)
        rec = live.astype(jnp.float32)[:, None] * slot_oh
        ll = c["ll"] * (1.0 - rec) + rec * logp_sel[:, None]
        acts_rec = jnp.where(rec > 0, action[:, None], c["acts"])
        t = c["t"] + live.astype(jnp.int32)

        # apply actions only to live, continuing graphs
        cont = live & ~invalid & ~acts.is_term
        acts_m = acts._replace(is_add=acts.is_add & cont,
                               is_conn=acts.is_conn & cont)
        nodes, edges, n_nodes = apply_actions(
            cfg, acts_m, c["nodes"], c["edges"], c["n_nodes"])

        done = c["done"] | done_term | invalid
        term = c["term"] | done_term
        return dict(key=key, nodes=nodes, edges=edges, n_nodes=n_nodes,
                    t=t, ll=ll, acts=acts_rec, done=done, term=term,
                    rounds=c["rounds"] + 1)

    if fixed_rounds is not None:
        final = jax.lax.fori_loop(0, fixed_rounds, lambda _, c: body(c), init)
    else:
        final = jax.lax.while_loop(cond, body, init)
    return (final["nodes"].astype(jnp.uint8), final["edges"].astype(jnp.uint8),
            final["n_nodes"], final["ll"], final["acts"],
            final["term"].astype(jnp.uint8), final["done"].astype(jnp.uint8),
            final["t"], final["rounds"])


def _pack_outputs(nodes, edges, n_nodes, ll, acts, term, done, t, rounds):
    """Packs all sampler outputs into ONE uint8 buffer: device->host
    transfers pay a fixed ~tens-of-ms latency each on tunneled TPU setups,
    so a single fetch beats eight.  Graphs are 0/1, so node/edge tensors are
    BIT-packed (packbits: 8 slots/byte) -- the edge tensor dominates the
    buffer (B x N x N x E; 6.4 of 7.2 MB at N=40 B=1000) and the tunnel
    moves ~50 MB/s, so the 8x cut is ~150 ms/batch of transfer at N=40.
    Compiled into the same program as the sampling loop so one dispatch
    covers loop+pack (saves one host round trip per batch)."""
    B = nodes.shape[0]
    bits = lambda x: jnp.packbits(x.reshape(B, -1).astype(jnp.uint8), axis=1)
    ll_bytes = jax.lax.bitcast_convert_type(ll, jnp.uint8).reshape(B, -1)
    acts16 = acts.astype(jnp.uint16)
    t16 = t.astype(jnp.uint16)
    rounds16 = rounds.astype(jnp.uint16)
    # t and rounds are packed lo/hi (two bytes each): max_rounds =
    # 2*max_n_nodes+4 exceeds 255 once max_n_nodes > 125 (ChEMBL-scale)
    return jnp.concatenate([
        bits(nodes), bits(edges),
        n_nodes.astype(jnp.uint8)[:, None],
        term.astype(jnp.uint8)[:, None],
        done.astype(jnp.uint8)[:, None],   # 0 => phase-1 straggler (r5)
        (t16 & 0xFF).astype(jnp.uint8)[:, None],
        (t16 >> 8).astype(jnp.uint8)[:, None],
        (acts16 & 0xFF).astype(jnp.uint8),
        (acts16 >> 8).astype(jnp.uint8),
        ll_bytes,
        jnp.broadcast_to((rounds16 & 0xFF).astype(jnp.uint8), (B,))[:, None],
        jnp.broadcast_to((rounds16 >> 8).astype(jnp.uint8), (B,))[:, None],
    ], axis=1)


class GraphSampler:
    """Batched on-device sampler (reference: GraphGenerator.sample,
    GraphGenerator.py:48-96)."""

    def __init__(self, cfg: GraphInventConfig, batch_size: int,
                 apply_fn: Optional[Callable] = None, mesh=None) -> None:
        """``mesh``: optional device mesh with a ``data`` axis; the rollout
        then runs data-parallel across it (rows are independent, so
        throughput scales with the axis size)."""
        self.cfg = cfg
        self.batch_size = batch_size
        self.mesh = mesh
        apply_fn = apply_fn or (
            lambda params, nodes, edges: apply_model(cfg, params, nodes, edges))
        # loop + pack in ONE program: a single dispatch and a single
        # device->host fetch per batch
        jitted = jax.jit(
            lambda params, key: _pack_outputs(
                *_sample_loop(cfg, params, key, batch_size, apply_fn, mesh)))

        def run(params, key):
            # the rollout is grad-free: enable the fused inference Pallas
            # kernels while (and only while) this program traces
            # (models/fused_enn.fused_inference -- grad-bearing programs
            # like the RL replay must keep the XLA path)
            from graphinvent_tpu.models.fused_enn import fused_inference
            with fused_inference():
                return jitted(params, key)

        self._jitted = run

    def sample_async(self, params: Params, key: jax.Array):
        """Dispatches one sampling batch WITHOUT waiting: returns the
        on-device packed buffer (JAX async dispatch).  Pair with
        :meth:`finish`.  Lets a caller run batch k+1 on the device while it
        fetches/decodes batch k.  NOTE: on the tunneled axon backend this
        was measured SLOWER than the synchronous loop (the server
        serializes the fetch behind the queued program; docs/9), so
        generation_phase stays synchronous -- the API is the right
        structure for runtimes whose transfers overlap execution."""
        return self._jitted(params, key), time.time()

    def finish(self, handle, quiet: bool = False) -> SampleResult:
        """Fetch + unpack a :meth:`sample_async` handle."""
        dev, t0 = handle
        packed = np.asarray(dev)                         # single transfer
        return self._decode_packed(packed, time.time() - t0, quiet)

    def sample(self, params: Params, key: jax.Array,
               quiet: bool = False) -> SampleResult:
        return self.finish(self.sample_async(params, key), quiet)

    def _decode_packed(self, packed: np.ndarray, elapsed: float,
                       quiet: bool = False) -> SampleResult:
        cfg = self.cfg
        B = self.batch_size
        N, Fn, E = cfg.max_n_nodes, cfg.n_node_features, cfg.n_edge_features
        L = cfg.gen_action_budget
        t_unpack = time.time()

        o = 0
        def take(n):
            nonlocal o
            out = packed[:, o:o + n]
            o += n
            return out

        def take_bits(n):
            # inverse of _pack_outputs' packbits: n one-bit slots per row
            return np.unpackbits(np.ascontiguousarray(take((n + 7) // 8)),
                                 axis=1, count=n)
        nodes = take_bits(N * Fn).reshape(B, N, Fn).astype(np.float32)
        edges = take_bits(N * N * E).reshape(B, N, N, E).astype(np.float32)
        n_nodes = take(1)[:, 0].astype(np.int32)
        term = take(1)[:, 0].astype(np.int8)
        done = take(1)[:, 0].astype(np.int8)
        t_lo = take(1)[:, 0].astype(np.uint16)
        t_hi = take(1)[:, 0].astype(np.uint16)
        t_count = (t_lo | (t_hi << 8)).astype(np.int32)
        acts_lo = take(L).astype(np.uint16)
        acts_hi = take(L).astype(np.uint16)
        acts = (acts_lo | (acts_hi << 8)).astype(np.int32)
        ll = np.ascontiguousarray(take(L * 4)).view(np.float32)
        if ll.shape != (B, L):
            ll = ll.reshape(B, L)
        rounds = int(take(1)[0, 0]) | (int(take(1)[0, 0]) << 8)

        graphs = [MolGraph(self.cfg, nodes[i], edges[i], int(n_nodes[i]))
                  for i in range(self.batch_size)]
        # per-action NLLs: only the slots actually used by each graph
        mask = np.arange(ll.shape[1])[None, :] < t_count[:, None]
        action_nlls = -ll[mask]
        final_ll = ll.sum(axis=1)

        unpack_s = time.time() - t_unpack
        if not quiet:
            n = self.batch_size
            print(f"Generated {n} molecules in {elapsed:.4} s "
                  f"({n / max(elapsed, 1e-9):.5} molecules/s)", flush=True)
        return SampleResult(graphs=graphs, action_nlls=action_nlls,
                            final_loglikelihoods=final_ll,
                            properly_terminated=term.astype(np.int8),
                            n_rounds=int(rounds), elapsed_s=elapsed,
                            actions=acts, t_counts=t_count,
                            unpack_s=unpack_s, done=done)
