"""Functional NN building blocks: SELU MLPs, GRU/LSTM cells, AlphaDropout.

Parameters are plain pytrees (nested dicts of jnp arrays) so that models are
trivially copyable (RL agent/prior/best-agent-so-far are three pytrees, see
reference Workflow.py:164-206) and shardable with jax.sharding.

Initialisation and cell conventions match PyTorch so that per-layer
activation parity with the reference can be verified (BASELINE.md):
  * MLP linear: Xavier-uniform weight + U(-1/sqrt(fan_in), ..) bias
    (reference: gnn/modules.py:144-164)
  * GRUCell / LSTMCell: torch gate ordering ([r,z,n] / [i,f,g,o]) and
    U(-1/sqrt(hidden), ..) init.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# SELU constants (match torch.nn.SELU / AlphaDropout)
_SELU_ALPHA = 1.6732632423543772
_SELU_SCALE = 1.0507009873554805
_ALPHA_PRIME = -_SELU_ALPHA * _SELU_SCALE


# --------------------------------------------------------------------------
# Linear / MLP
# --------------------------------------------------------------------------

def init_linear(key: jax.Array, in_f: int, out_f: int,
                xavier: bool = True) -> Params:
    wkey, bkey = jax.random.split(key)
    if xavier:
        limit = math.sqrt(6.0 / (in_f + out_f))
    else:  # torch default (kaiming uniform a=sqrt(5)) == U(-1/sqrt(in), ..)
        limit = 1.0 / math.sqrt(in_f)
    w = jax.random.uniform(wkey, (out_f, in_f), jnp.float32, -limit, limit)
    blim = 1.0 / math.sqrt(in_f)
    b = jax.random.uniform(bkey, (out_f,), jnp.float32, -blim, blim)
    return {"w": w, "b": b}


def linear(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params["w"].T.astype(x.dtype) + params["b"].astype(x.dtype)


def alpha_dropout(key: jax.Array, x: jnp.ndarray, p: float) -> jnp.ndarray:
    """torch.nn.AlphaDropout: SELU-preserving dropout."""
    if p <= 0.0:
        return x
    q = 1.0 - p
    keep = jax.random.bernoulli(key, q, x.shape)
    a = (q + _ALPHA_PRIME ** 2 * q * p) ** -0.5
    b = -a * (1.0 - q) * _ALPHA_PRIME
    return a * jnp.where(keep, x, _ALPHA_PRIME) + b


def init_mlp(key: jax.Array, in_features: int,
             hidden_layer_sizes: Sequence[int], out_features: int) -> Params:
    """MLP with SELU after *every* layer including the last
    (reference: gnn/modules.py:111-170)."""
    sizes = [in_features, *hidden_layer_sizes, out_features]
    keys = jax.random.split(key, len(sizes) - 1)
    return {"layers": [init_linear(k, i, o)
                       for k, i, o in zip(keys, sizes[:-1], sizes[1:])]}


def init_stacked_mlp(key: jax.Array, n_stack: int, in_features: int,
                     hidden_layer_sizes: Sequence[int],
                     out_features: int) -> Params:
    """``n_stack`` independent SELU MLPs with identical shapes, stored as
    stacked weights (E, out, in) so all of them evaluate as ONE batched
    matmul.  Replaces lists of per-edge-type MLPs (reference:
    gnn/mpnn.py:238-247,314-333) -- 3x fewer, 3x larger matmuls, much
    better MXU utilisation.  Per-stack init matches init_mlp exactly."""
    keys = jax.random.split(key, n_stack)
    per = [init_mlp(k, in_features, hidden_layer_sizes, out_features)
           for k in keys]
    n_layers = len(per[0]["layers"])
    return {"layers": [
        {"w": jnp.stack([p["layers"][l]["w"] for p in per]),
         "b": jnp.stack([p["layers"][l]["b"] for p in per])}
        for l in range(n_layers)]}


def stacked_mlp(params: Params, x: jnp.ndarray, dropout_p: float = 0.0,
                train: bool = False, rng: Optional[jax.Array] = None
                ) -> jnp.ndarray:
    """x (..., I) shared input -> (E, ..., O): every stacked MLP applied to
    the same input via one einsum per layer."""
    n_layers = len(params["layers"])
    if train and dropout_p > 0.0 and rng is not None:
        keys = jax.random.split(rng, n_layers)
    else:
        keys = [None] * n_layers
    first = params["layers"][0]
    dt = x.dtype
    y = jnp.einsum("...i,eoi->e...o", x, first["w"].astype(dt),
                   preferred_element_type=jnp.float32).astype(dt)
    y = jax.nn.selu(y + jnp.expand_dims(first["b"].astype(dt),
                                        tuple(range(1, y.ndim - 1))))
    if keys[0] is not None:
        y = alpha_dropout(keys[0], y, dropout_p)
    for lp, k in zip(params["layers"][1:], keys[1:]):
        y = jnp.einsum("e...i,eoi->e...o", y, lp["w"].astype(dt),
                       preferred_element_type=jnp.float32).astype(dt)
        y = jax.nn.selu(y + jnp.expand_dims(lp["b"].astype(dt),
                                            tuple(range(1, y.ndim - 1))))
        if k is not None:
            y = alpha_dropout(k, y, dropout_p)
    return y


def mlp(params: Params, x: jnp.ndarray, dropout_p: float = 0.0,
        train: bool = False, rng: Optional[jax.Array] = None) -> jnp.ndarray:
    n_layers = len(params["layers"])
    if train and dropout_p > 0.0 and rng is not None:
        keys = jax.random.split(rng, n_layers)
    else:
        keys = [None] * n_layers
    for lp, k in zip(params["layers"], keys):
        x = jax.nn.selu(linear(lp, x))
        if k is not None:
            x = alpha_dropout(k, x, dropout_p)
    return x


# --------------------------------------------------------------------------
# Recurrent cells (torch conventions)
# --------------------------------------------------------------------------

def init_gru_cell(key: jax.Array, input_size: int, hidden_size: int) -> Params:
    limit = 1.0 / math.sqrt(hidden_size)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -limit, limit)
    return {
        "w_ih": u(k1, (3 * hidden_size, input_size)),
        "w_hh": u(k2, (3 * hidden_size, hidden_size)),
        "b_ih": u(k3, (3 * hidden_size,)),
        "b_hh": u(k4, (3 * hidden_size,)),
    }


def gru_cell(params: Params, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.GRUCell: gates ordered [reset, update, new]."""
    dt = x.dtype
    gi = x @ params["w_ih"].T.astype(dt) + params["b_ih"].astype(dt)
    gh = h @ params["w_hh"].T.astype(dt) + params["b_hh"].astype(dt)
    H = h.shape[-1]
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def init_lstm_cell(key: jax.Array, input_size: int, hidden_size: int) -> Params:
    limit = 1.0 / math.sqrt(hidden_size)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -limit, limit)
    return {
        "w_ih": u(k1, (4 * hidden_size, input_size)),
        "w_hh": u(k2, (4 * hidden_size, hidden_size)),
        "b_ih": u(k3, (4 * hidden_size,)),
        "b_hh": u(k4, (4 * hidden_size,)),
    }


def lstm_cell(params: Params, x: jnp.ndarray, h: jnp.ndarray,
              c: jnp.ndarray) -> tuple:
    """torch.nn.LSTMCell: gates ordered [input, forget, cell, output]."""
    dt = x.dtype
    g = (x @ params["w_ih"].T.astype(dt) + params["b_ih"].astype(dt)
         + h @ params["w_hh"].T.astype(dt) + params["b_hh"].astype(dt))
    H = h.shape[-1]
    i = jax.nn.sigmoid(g[..., :H])
    f = jax.nn.sigmoid(g[..., H:2 * H])
    gg = jnp.tanh(g[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(g[..., 3 * H:])
    c_new = f * c + i * gg
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def count_params(params: Params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
