"""Program-identity across hyperparameter choices.

The N=40 whole-epoch program pays a multi-minute XLA compile through the
axon tunnel, amortised by the persistent compile cache
(utils/compile_cache.py).  That only works if the HLO is identical across
runs: schedule constants (epochs, init_lr -> OneCycle up/down/lr values)
must enter the program as ARGUMENTS, not baked literals.  These tests pin
that property end to end via a real on-disk cache.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphinvent_tpu.config import test_config as tiny_config
from graphinvent_tpu.models import init_model
from graphinvent_tpu.train import adam_init, onecycle_for_config
from graphinvent_tpu.train.step import make_train_step


@pytest.fixture
def disk_cache(tmp_path, monkeypatch):
    cache_dir = str(tmp_path / "xla-cache")
    monkeypatch.setenv("GRAPHINVENT_COMPILE_CACHE", cache_dir)
    from graphinvent_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    # cache everything (CPU compiles are fast; default min is 1 s)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    yield cache_dir
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_compilation_cache_dir", None)


def _run_once(cfg, epochs, init_lr, key):
    cfg = cfg.replace(epochs=epochs, init_lr=init_lr)
    params = init_model(cfg, key)
    opt = adam_init(params)
    sched = onecycle_for_config(cfg, steps_per_epoch=3)
    step = make_train_step(cfg, sched)
    B = 4
    batch = {
        "nodes": jnp.zeros((B, cfg.max_n_nodes, cfg.n_node_features)),
        "edges": jnp.zeros((B, cfg.max_n_nodes, cfg.max_n_nodes,
                            cfg.n_edge_features)),
        "apds": jnp.ones((B, cfg.dim_apd)),
        "valid": jnp.ones((B,)),
    }
    params, opt, loss = step(params, opt, batch, key)
    jax.block_until_ready(loss)


def test_train_step_program_shared_across_epochs_and_lr(disk_cache):
    cfg = tiny_config("GGNN")
    key = jax.random.PRNGKey(0)
    _run_once(cfg, epochs=2, init_lr=1e-4, key=key)
    n_after_first = len(glob.glob(os.path.join(disk_cache, "*")))
    assert n_after_first >= 1          # the cache is live
    # different epochs AND init_lr: schedule constants differ, program must
    # not -- a new cache entry here means they leaked into the HLO again
    _run_once(cfg, epochs=50, init_lr=3e-4, key=key)
    n_after_second = len(glob.glob(os.path.join(disk_cache, "*")))
    assert n_after_second == n_after_first, (
        "train-step program recompiled when only schedule constants "
        "changed; OneCycle values must enter as jit arguments "
        "(optim.OneCycle.device_params)")
