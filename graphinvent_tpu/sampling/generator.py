"""On-device autoregressive graph generation.

Rebuilds GraphGenerator (GraphGenerator.py:21-657) as a single jitted
``jax.lax.while_loop``: the whole batch state -- node/edge tensors, node
counts, per-action likelihood accumulators, done-graph output buffers and
the PRNG key -- is the loop carry, and one model forward runs per action
round.  Termination is data-dependent (``n_done < batch_size``) exactly like
the reference's Python while loop (GraphGenerator.py:118-158), but stays on
device; RDKit-style chemistry (validity, SMILES) runs on host only after
the loop exits.

Design deltas vs the reference (SURVEY.md §7):
  * no dummy graph pinned at slot 0 (GraphGenerator.py:387-423) -- the dense
    MPNN formulation handles all-empty graphs natively;
  * action probabilities are sampled with ``jax.random.categorical`` on the
    APD logits (equivalent to Multinomial on the softmax);
  * per-graph action-slot counters replace the global generation-round index
    (the reference overflows its likelihood buffer after 2*max_n_nodes
    rounds); a graph exceeding its slot budget is force-invalidated;
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
from graphinvent_tpu.sampling.actions import apply_actions, decode_actions
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

    @property
    def graphs_per_s(self) -> float:
        return len(self.graphs) / max(self.elapsed_s, 1e-9)


def _sample_loop(cfg: GraphInventConfig, params: Params, key: jax.Array,
                 batch_size: int, apply_fn: Callable) -> Tuple[jnp.ndarray, ...]:
    B = batch_size
    N = cfg.max_n_nodes
    Fn = cfg.n_node_features
    E = cfg.n_edge_features
    L = cfg.max_n_nodes * 2            # likelihood slots (reference sizing)
    OUT = 2 * B                        # finished-graph buffer (reference sizing)
    max_rounds = 4 * L + 16            # hard safety bound; every live graph is
    #                                   force-invalidated within L rounds
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    init = dict(
        key=key,
        nodes=jnp.zeros((B, N, Fn), dt),
        edges=jnp.zeros((B, N, N, E), dt),
        n_nodes=jnp.zeros((B,), jnp.int32),
        t=jnp.zeros((B,), jnp.int32),            # per-graph action slot
        ll=jnp.zeros((B, L), jnp.float32),       # log p per action (live)
        acts=jnp.zeros((B, L), jnp.int32),       # action ids (live)
        out_nodes=jnp.zeros((OUT, N, Fn), dt),
        out_edges=jnp.zeros((OUT, N, N, E), dt),
        out_n_nodes=jnp.zeros((OUT,), jnp.int32),
        out_ll=jnp.zeros((OUT, L), jnp.float32),
        out_acts=jnp.zeros((OUT, L), jnp.int32),
        out_term=jnp.zeros((OUT,), jnp.int32),
        out_t=jnp.zeros((OUT,), jnp.int32),
        n_done=jnp.zeros((), jnp.int32),
        rounds=jnp.zeros((), jnp.int32),
    )

    def cond(c):
        return (c["n_done"] < B) & (c["rounds"] < max_rounds)

    def body(c):
        key, sub = jax.random.split(c["key"])
        logits = apply_fn(params, c["nodes"], c["edges"]).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=1)
        action = jax.random.categorical(sub, logits, axis=1)
        logp_sel = logp[jnp.arange(B), action]

        acts = decode_actions(cfg, action, c["n_nodes"], c["edges"])
        overflow = c["t"] >= (L - 1)
        invalid = (acts.invalid | (overflow & ~acts.is_term))
        done_term = acts.is_term
        done = done_term | invalid

        # record this action's log-likelihood + id in the live slot
        slot = jnp.clip(c["t"], 0, L - 1)
        ll = c["ll"].at[jnp.arange(B), slot].set(logp_sel)
        acts_rec = c["acts"].at[jnp.arange(B), slot].set(action.astype(jnp.int32))
        t = c["t"] + 1

        # ---- copy finished graphs to the output buffers -------------------
        # ordering within a round: properly-terminated first, then invalid
        # (reference: GraphGenerator.py:127-137)
        term_i = done_term.astype(jnp.int32)
        inv_i = invalid.astype(jnp.int32)
        n_term = jnp.sum(term_i)
        pos_term = jnp.cumsum(term_i) - 1
        pos_inv = n_term + jnp.cumsum(inv_i) - 1
        pos = jnp.where(done_term, c["n_done"] + pos_term,
                        jnp.where(invalid, c["n_done"] + pos_inv, OUT))
        # (pos == OUT for live graphs -> dropped by scatter mode="drop")
        out_nodes = c["out_nodes"].at[pos].set(c["nodes"], mode="drop")
        out_edges = c["out_edges"].at[pos].set(c["edges"], mode="drop")
        out_n = c["out_n_nodes"].at[pos].set(c["n_nodes"], mode="drop")
        out_ll = c["out_ll"].at[pos].set(ll, mode="drop")
        out_acts = c["out_acts"].at[pos].set(acts_rec, mode="drop")
        out_term = c["out_term"].at[pos].set(term_i, mode="drop")
        out_t = c["out_t"].at[pos].set(t, mode="drop")
        n_done = c["n_done"] + jnp.sum(done.astype(jnp.int32))

        # ---- apply actions, then reset finished slots ---------------------
        nodes, edges, n_nodes = apply_actions(
            cfg, acts, c["nodes"], c["edges"], c["n_nodes"])
        keep = ~done
        nodes = jnp.where(keep[:, None, None], nodes, 0.0)
        edges = jnp.where(keep[:, None, None, None], edges, 0.0)
        n_nodes = jnp.where(keep, n_nodes, 0)
        ll = jnp.where(keep[:, None], ll, 0.0)
        acts_rec = jnp.where(keep[:, None], acts_rec, 0)
        t = jnp.where(keep, t, 0)

        return dict(key=key, nodes=nodes, edges=edges, n_nodes=n_nodes,
                    t=t, ll=ll, acts=acts_rec, out_nodes=out_nodes,
                    out_edges=out_edges, out_n_nodes=out_n, out_ll=out_ll,
                    out_acts=out_acts, out_term=out_term,
                    out_t=out_t, n_done=n_done,
                    rounds=c["rounds"] + 1)

    final = jax.lax.while_loop(cond, body, init)
    return (final["out_nodes"][:B], final["out_edges"][:B],
            final["out_n_nodes"][:B], final["out_ll"][:B],
            final["out_acts"][:B], final["out_term"][:B], final["out_t"][:B],
            final["rounds"])


class GraphSampler:
    """Batched on-device sampler (reference: GraphGenerator.sample,
    GraphGenerator.py:48-96)."""

    def __init__(self, cfg: GraphInventConfig, batch_size: int,
                 apply_fn: Optional[Callable] = None) -> None:
        self.cfg = cfg
        self.batch_size = batch_size
        apply_fn = apply_fn or (
            lambda params, nodes, edges: apply_model(cfg, params, nodes, edges))
        self._jitted = jax.jit(
            lambda params, key: _sample_loop(cfg, params, key, batch_size,
                                             apply_fn))

    def sample(self, params: Params, key: jax.Array,
               quiet: bool = False) -> SampleResult:
        t0 = time.time()
        (nodes, edges, n_nodes, ll, acts, term, t_count, rounds) = \
            jax.block_until_ready(self._jitted(params, key))
        elapsed = time.time() - t0

        nodes = np.asarray(nodes, np.float32)
        edges = np.asarray(edges, np.float32)
        n_nodes = np.asarray(n_nodes)
        ll = np.asarray(ll)
        acts = np.asarray(acts)
        term = np.asarray(term)
        t_count = np.asarray(t_count)

        graphs = [MolGraph(self.cfg, nodes[i], edges[i], int(n_nodes[i]))
                  for i in range(self.batch_size)]
        # per-action NLLs: only the slots actually used by each graph
        mask = np.arange(ll.shape[1])[None, :] < t_count[:, None]
        action_nlls = -ll[mask]
        final_ll = ll.sum(axis=1)

        if not quiet:
            n = self.batch_size
            print(f"Generated {n} molecules in {elapsed:.4} s "
                  f"({n / max(elapsed, 1e-9):.5} molecules/s)", flush=True)
        return SampleResult(graphs=graphs, action_nlls=action_nlls,
                            final_loglikelihoods=final_ll,
                            properly_terminated=term.astype(np.int8),
                            n_rounds=int(rounds), elapsed_s=elapsed,
                            actions=acts, t_counts=t_count)
