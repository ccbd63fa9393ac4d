"""Fused stacked edge-type ENN as a Pallas TPU kernel.

The sampler forward at ChEMBL dims is bound by the stacked ENN's per-layer
HBM intermediates: XLA fuses dot+bias+SELU per layer but writes every
``bf16[E, B, N, 250]`` hidden tensor (~80 MB at N=40 B=1000) to HBM and
reads it back for the next layer — ~2.5 GB of avoidable traffic per round
across 3 message passes (round-4 trace, BASELINE.md "sampler attribution";
reference hot loop: GraphGenerator.py:121 + summation_mpnn.py:128-144).

This kernel runs the whole layer stack for a tile of rows with every
intermediate in VMEM, writing only the final (E, rows, message_size)
output.  Design per the round-4 post-mortem of the failed kernel (docs/9
"Negative results"): rows are B·N FLATTENED — tiles are plain (T, F)
matrices, so Mosaic never sees the (tile_b, N_pad, F) row-merges whose
~1.5k-row ceiling sank the previous attempt.  Weights arrive as separate
2D (in, out) refs per type per layer: no in-kernel reshape of stacked
dims, no non-128-aligned lane slicing — the two Mosaic traps hit while
building this.

Numerics: dots take bf16 inputs with f32 accumulation; bias-add + SELU
evaluate in f32 (Mosaic cannot lower bf16 transcendentals) and round to
bf16 between layers.  In f32 this is bit-compatible with
``core.stacked_mlp`` (tests/test_models.py::test_fused_enn_matches_stacked);
in bf16 it deliberately DIFFERS in low bits — XLA rounds the accumulator
to bf16 before the bias/SELU, the kernel keeps f32 through them — and is
measurably CLOSER to the f32 truth (GGNN APD logits max |Δ| from f32:
0.126 fused vs 0.372 XLA-bf16 at N=40 B=1000; BASELINE.md round 5), so
bf16 molecule streams shift within bf16 noise when the kernel toggles.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from graphinvent_tpu.models.core import _SELU_ALPHA, _SELU_SCALE

Params = Any


def _selu_f32(x: jnp.ndarray) -> jnp.ndarray:
    return _SELU_SCALE * jnp.where(
        x > 0, x, _SELU_ALPHA * (jnp.exp(x) - 1.0))


def _kernel(n_layers: int, E: int, *refs):
    """refs = (x, w[l][e]..., b[l][e]..., out) with weights ordered
    layer-major then type-major: w_0_0, b_0_0, w_0_1, b_0_1, ..."""
    x_ref = refs[0]
    out_ref = refs[-1]
    wb = refs[1:-1]
    x = x_ref[...]                                   # (T, I) bf16
    ys = [x] * E
    for l in range(n_layers):
        new = []
        for e in range(E):
            w = wb[2 * (l * E + e)][...]             # (I_l, O_l)
            b = wb[2 * (l * E + e) + 1][...]         # (1, O_l)
            a = jax.lax.dot_general(ys[e], w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            a = _selu_f32(a + b.astype(jnp.float32))
            new.append(a if l == n_layers - 1 else a.astype(x.dtype))
        ys = new
    for e in range(E):
        out_ref[e, :, :] = ys[e].astype(out_ref.dtype)


def _flatten_weights(params: Params, dtype) -> tuple:
    """Stacked (E, O, I) layer weights -> per-type 2D (I, O) arrays +
    (1, O) biases, layer-major."""
    flat = []
    for lp in params["layers"]:
        w, b = lp["w"], lp["b"]                      # (E, O, I), (E, O)
        for e in range(w.shape[0]):
            flat.append(jnp.transpose(w[e]).astype(dtype))
            flat.append(b[e][None, :].astype(dtype))
    return tuple(flat)


def _call(x2d: jnp.ndarray, flat_wb: tuple, n_layers: int, E: int,
          tile: int, interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, I = x2d.shape
    O = flat_wb[-2].shape[1]
    kw = {} if interpret else {"memory_space": pltpu.VMEM}
    in_specs = [pl.BlockSpec((tile, I), lambda i: (i, 0), **kw)]
    for wb in flat_wb:
        in_specs.append(pl.BlockSpec(
            wb.shape, (lambda i: (0, 0)), **kw))
    # non-divisible grid: Pallas pads the trailing block's reads and drops
    # its out-of-range writes, so no host-side pad/concat/slice of the
    # 32 MB row tensor is needed (those copies cost ~0.2 ms/round)
    return pl.pallas_call(
        functools.partial(_kernel, n_layers, E),
        grid=(pl.cdiv(R, tile),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((E, tile, O), lambda i: (0, i, 0), **kw),
        out_shape=jax.ShapeDtypeStruct((E, R, O), x2d.dtype),
        interpret=interpret,
    )(x2d, *flat_wb)


def fused_stacked_mlp(params: Params, x: jnp.ndarray, tile: int = 512,
                      interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ``core.stacked_mlp(params, x)`` on the inference path
    (no dropout): x (B, N, I) -> (E, B, N, O)."""
    layers = params["layers"]
    n_layers = len(layers)
    E = layers[0]["w"].shape[0]
    B, N, I = x.shape
    out = _call(x.reshape(B * N, I), _flatten_weights(params, x.dtype),
                n_layers, E, tile, interpret)
    return out.reshape(E, B, N, -1)


def fused_enn_available() -> bool:
    """The kernel targets real TPUs; CPU parity tests pass
    ``interpret=True`` explicitly."""
    return jax.default_backend() == "tpu"


def fused_mlp(params: Params, x: jnp.ndarray, tile: int = 512,
              interpret: bool = False) -> jnp.ndarray:
    """Single (E=1) MLP through the same VMEM-resident kernel: drop-in for
    ``core.mlp(params, x)`` on the inference path.  The readout's
    node-level nets have the same per-layer HBM-intermediate pattern as
    the ENN ((B,N,500) bf16 = 40 MB/layer at N=40 B=1000)."""
    layers = params["layers"]
    stacked = {"layers": [{"w": lp["w"][None], "b": lp["b"][None]}
                          for lp in layers]}
    lead = x.shape[:-1]
    I = x.shape[-1]
    R = 1
    for d in lead:
        R *= d
    out = fused_stacked_mlp(stacked, x.reshape(1, R, I), tile=tile,
                            interpret=interpret)          # (1, 1, R, O)
    return out.reshape(*lead, out.shape[-1])


import threading as _threading
from contextlib import contextmanager as _contextmanager

_ctx = _threading.local()


@_contextmanager
def fused_inference():
    """Opt-in context: the fused kernels activate only while a jit TRACES
    inside it.  pallas_call has no autodiff rule, and ``train=False``
    forwards are also differentiated (the RL trajectory replay,
    sampling/replay.py), so "eval mode" alone cannot gate the kernel —
    the round-5 remat sweep hit exactly that linearization failure.
    GraphSampler wraps its jitted rollout in this context; grad-bearing
    programs trace outside it and keep the XLA path."""
    prev = getattr(_ctx, "on", False)
    _ctx.on = True
    try:
        yield
    finally:
        _ctx.on = prev


def fused_gate(train: bool, *dropout_ps: float) -> bool:
    """True when the inference-path Pallas kernels may replace XLA MLPs:
    inside a fused_inference() trace, eval forward, real single-device
    TPU, no ambient edge-sharding mesh (pallas_call does not partition
    under the SPMD partitioner).  ``dropout_ps`` are accepted but
    irrelevant: mlp()/stacked_mlp() ignore dropout when train=False, so a
    dropout-trained model keeps the kernel for its eval forwards."""
    del dropout_ps
    if not getattr(_ctx, "on", False):
        return False
    if train:
        return False
    if not fused_enn_available() or jax.device_count() != 1:
        return False
    from graphinvent_tpu.models.annotate import _active_mesh
    return _active_mesh() is None
