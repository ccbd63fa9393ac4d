"""Capture a jax.profiler trace of the real train step and print the
per-HLO-op time breakdown (top ops by self time).

    PYTHONPATH=/root/.axon_site:/root/repo python tools/trace_step.py [batch] [dtype]

Requires tensorboard_plugin_profile for xplane parsing.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from graphinvent_tpu.config import preset
from graphinvent_tpu.models import init_model
from graphinvent_tpu.train.optim import adam_init, onecycle_for_config
from graphinvent_tpu.train.step import make_train_step
from tools.torch_baseline import synthetic_batch


def main(batch_size=1000, dtype="bfloat16", model="GGNN"):
    cfg = preset(model, batch_size=batch_size, compute_dtype=dtype)
    params = init_model(cfg, jax.random.PRNGKey(0))
    from tools.roofline import synthetic_batch as synth_any
    nodes, edges, apds = synth_any(cfg, batch_size)
    batch = {
        "nodes": jnp.asarray(nodes), "edges": jnp.asarray(edges),
        "apds": jnp.asarray(apds),
        "valid": jnp.ones(batch_size, jnp.float32),
    }
    schedule = onecycle_for_config(cfg, 400)
    step = make_train_step(cfg, schedule)
    opt = adam_init(params)
    key = jax.random.PRNGKey(1)

    # warm up / compile
    for i in range(3):
        params, opt, loss = step(params, opt, batch, key)
    jax.block_until_ready(loss)

    logdir = "/tmp/jax-trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for i in range(20):
            params, opt, loss = step(params, opt, batch, key)
        jax.block_until_ready(loss)

    # parse the xplane (tools/xplane_stats.py digests it further; the
    # tensorboard converter needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python)
    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("captured:", files or "nothing (unsupported backend?)")


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    dt = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    mdl = sys.argv[3] if len(sys.argv) > 3 else "GGNN"
    main(bs, dt, mdl)
