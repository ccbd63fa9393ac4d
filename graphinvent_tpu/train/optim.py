"""Adam + OneCycle learning-rate/momentum schedule.

The reference trains with torch Adam + OneCycleLR
(Workflow.py:191-261).  Torch's OneCycleLR also cycles Adam's beta1 between
max_momentum=0.95 and base_momentum=0.85 (cycle_momentum default), which we
reproduce; the schedule is cosine with

  phase 1 (pct_start):  initial_lr = max_lr/div_factor  ->  max_lr
  phase 2:              max_lr  ->  initial_lr/final_div_factor

Training jobs use the torch defaults (pct_start=0.3, div=25, final_div=1e4);
fine-tune jobs use pct_start=0.05, div=1/max_rel_lr, final_div=1/min_rel_lr
(Workflow.py:198-206).

Adam is written out manually (rather than optax.adam) so the time-varying
beta1 matches torch's semantics: the *current* beta1 is used in both the
first-moment update and its bias correction.  Unlike the reference -- which
silently rebuilds fresh optimizer state on restart (Workflow.py:208-237) --
this state is a pytree and is checkpointed with the model.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graphinvent_tpu.config import GraphInventConfig

Params = Any


@dataclass(frozen=True)
class OneCycle:
    max_lr: float
    total_steps: int
    pct_start: float = 0.3
    div_factor: float = 25.0
    final_div_factor: float = 1e4
    base_momentum: float = 0.85
    max_momentum: float = 0.95
    cycle_momentum: bool = True

    def __call__(self, step: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """step (0-based, float or int) -> (lr, beta1)."""
        return onecycle_eval(self.device_params(), step, self.cycle_momentum)

    def device_params(self) -> np.ndarray:
        # frozen dataclass => hashable; cache so host-side per-epoch/RL-step
        # calls don't rebuild the vector each time.  NOTE: this is a cached
        # HOST (numpy) vector -- each jit call still pays one tiny (7,)
        # host->device transfer, negligible next to the batch itself (and a
        # device_put here would leak as a tracer if first called in-trace).
        return _device_params_cached(self)

    def _device_params(self) -> np.ndarray:
        """The schedule's constants as a (7,) f32 vector.

        Pass this as a jit ARGUMENT (see make_epoch_train_fn /
        make_train_step / make_sharded_train_step) rather than closing over
        the schedule: closed-over scalars bake into the HLO as constants,
        so merely changing ``epochs`` or ``init_lr`` produced a different
        program and a full recompile (measured: the N=40 whole-epoch
        program pays ~270-800 s through the axon tunnel on a persistent-
        cache miss).  As an input vector, every epoch count / LR choice
        shares one cached executable."""
        up_steps = max(float(self.pct_start) * self.total_steps - 1.0, 1.0)
        down_steps = max(self.total_steps - up_steps - 1.0, 1.0)
        initial_lr = self.max_lr / self.div_factor
        min_lr = initial_lr / self.final_div_factor
        # numpy, NOT jnp: this may be first called inside a jit trace (the
        # host-side __call__ path), where a jnp.array would be a tracer --
        # caching a leaked tracer poisons every later call
        return np.asarray([up_steps, down_steps, initial_lr, self.max_lr,
                           min_lr, self.base_momentum, self.max_momentum],
                          np.float32)


@functools.lru_cache(maxsize=None)
def _device_params_cached(sched: "OneCycle") -> np.ndarray:
    return sched._device_params()


def onecycle_eval(sched: jnp.ndarray, step: jnp.ndarray,
                  cycle_momentum: bool = True
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(lr, beta1) from a ``OneCycle.device_params()`` vector at ``step``.
    ``cycle_momentum`` is the one static flag (a per-job-type property, two
    cache entries at most)."""
    step = jnp.asarray(step, jnp.float32)
    up_steps, down_steps = sched[0], sched[1]
    initial_lr, max_lr, min_lr = sched[2], sched[3], sched[4]
    base_momentum, max_momentum = sched[5], sched[6]

    def _anneal(start, end, pct):
        return end + (start - end) / 2.0 * (jnp.cos(math.pi * pct) + 1.0)

    pct_up = jnp.clip(step / up_steps, 0.0, 1.0)
    pct_down = jnp.clip((step - up_steps) / down_steps, 0.0, 1.0)
    lr = jnp.where(step <= up_steps,
                   _anneal(initial_lr, max_lr, pct_up),
                   _anneal(max_lr, min_lr, pct_down))
    if cycle_momentum:
        b1 = jnp.where(step <= up_steps,
                       _anneal(max_momentum, base_momentum, pct_up),
                       _anneal(base_momentum, max_momentum, pct_down))
    else:
        b1 = jnp.asarray(0.9, jnp.float32)
    return lr, b1


def onecycle_for_config(cfg: GraphInventConfig, steps_per_epoch: int) -> OneCycle:
    """Mirrors Workflow.define_model_and_optimizer's two scheduler shapes."""
    max_lr = cfg.max_rel_lr * cfg.init_lr
    # schedule_epochs: chunked-resume override (workflow restart trains
    # cfg.epochs MORE epochs; the LR plan must still span the ORIGINAL
    # total or a resumed run would collapse to min_lr / restart the cycle)
    total_epochs = cfg.schedule_epochs or cfg.epochs
    if cfg.job_type == "fine-tune":
        return OneCycle(max_lr=max_lr, total_steps=total_epochs,
                        pct_start=0.05, div_factor=1.0 / cfg.max_rel_lr,
                        final_div_factor=1.0 / cfg.min_rel_lr)
    return OneCycle(max_lr=max_lr, total_steps=steps_per_epoch * total_epochs)


class AdamState(NamedTuple):
    step: jnp.ndarray      # scalar int32
    mu: Params
    nu: Params


def adam_init(params: Params) -> AdamState:
    # Layout note (measured, v5e): the per-leaf tree update costs
    # ~0.87 ms/step of small-fusion overhead at GGNN dims (~84 leaves).
    # A flat-moment variant (single raveled mu/nu buffers, ravel/unravel
    # inside the step) was built and benchmarked: it was ~0.25-0.35 ms
    # SLOWER per scanned step across models -- the ~168 slice/concat ops
    # at the ravel boundary cost more than the per-leaf fusions they
    # replace.  Keep the tree layout (docs/9 "negative results").
    zeros = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p), params)
    return AdamState(step=jnp.zeros((), jnp.int32), mu=zeros,
                     nu=jax.tree_util.tree_map(lambda p: jnp.zeros_like(p), params))


def adam_update(grads: Params, state: AdamState, params: Params,
                lr: jnp.ndarray, beta1: jnp.ndarray = 0.9,
                beta2: float = 0.999, eps: float = 1e-8
                ) -> Tuple[Params, AdamState]:
    """One torch-style Adam step with (possibly scheduled) lr and beta1."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    b1 = jnp.asarray(beta1, jnp.float32)
    bc1 = 1.0 - jnp.power(b1, t)
    bc2 = 1.0 - beta2 ** t

    def upd_mu(m, g):
        return b1 * m + (1.0 - b1) * g

    def upd_nu(v, g):
        return beta2 * v + (1.0 - beta2) * (g * g)

    def upd_p(p, m, v):
        return p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)

    mu = jax.tree_util.tree_map(upd_mu, state.mu, grads)
    nu = jax.tree_util.tree_map(upd_nu, state.nu, grads)
    new_params = jax.tree_util.tree_map(upd_p, params, mu, nu)
    return new_params, AdamState(step=step, mu=mu, nu=nu)
