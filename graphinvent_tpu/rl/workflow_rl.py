"""RL fine-tuning phase: agent / prior / best-agent-so-far.

Rebuilds Workflow.learning_phase + learning_step (Workflow.py:515-612) and
the augmented-likelihood loss (Workflow.py:862-898):

  loss_i = (agent_ll_i - (prior_ll_i + sigma * score_i))^2 * unique_i
  loss   = (1 - alpha) * mean(loss_agent_batch) + alpha * mean(loss_basf_batch)

In JAX the three models are just three parameter pytrees sharing one apply
function (SURVEY.md §7 phase 5).  Gradients reach the agent through
differentiable trajectory replay (sampling/replay.py) instead of grad-through
-the-sampling-loop.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graphinvent_tpu.config import GraphInventConfig
from graphinvent_tpu.eval.analyzer import Analyzer
from graphinvent_tpu.eval.scoring import ScoringFunction
from graphinvent_tpu.sampling import GraphSampler
from graphinvent_tpu.sampling.replay import trajectory_loglik
from graphinvent_tpu.train.optim import adam_init, adam_update, onecycle_for_config
from graphinvent_tpu.utils.checkpoint import (
    checkpoint_path, latest_checkpoint, load_checkpoint, load_params_any,
    save_checkpoint,
)

Params = Any


def _make_rl_grad(cfg: GraphInventConfig, mesh=None):
    """Jitted value+grad of the combined RL loss w.r.t. agent params.

    With ``mesh``, the replay-gradient step is sharded: trajectory rows
    (actions / t_counts / targets / masks) partition over ``data``, params
    stay replicated, and XLA all-reduces the gradients -- the same rules as
    make_sharded_train_step (rollout rows are independent, so the RL step
    scales exactly like a training batch).  The reference fine-tunes on one
    device only (Workflow.py:515-612)."""

    def loss_fn(agent_params, actions_a, t_a, target_a, mask_a,
                actions_b, t_b, target_b, mask_b, alpha):
        # TWO B-row replays, not one concatenated 2B-row replay: measured
        # 2930 vs 3386 ms at B=500 N=40 f32 (tools-era A/B, docs/9) -- the
        # remat backward schedules worse at the doubled batch
        agent_ll_a = trajectory_loglik(cfg, agent_params, actions_a, t_a)
        diff_a = agent_ll_a - target_a
        loss_a = jnp.mean(diff_a * diff_a * mask_a)
        # BASF term: agent enters as "prior" (model_b), gradient flows
        # through its log-likelihood of BASF's samples (Workflow.py:588-595)
        agent_ll_b = trajectory_loglik(cfg, agent_params, actions_b, t_b)
        diff_b = target_b - agent_ll_b
        loss_b = jnp.mean(diff_b * diff_b * mask_b)
        return (1.0 - alpha) * loss_a + alpha * loss_b

    if mesh is None:
        return jax.jit(jax.value_and_grad(loss_fn))

    from jax.sharding import NamedSharding, PartitionSpec as P
    row = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    jitted = jax.jit(jax.value_and_grad(loss_fn),
                     in_shardings=(repl, row, row, row, row,
                                   row, row, row, row, repl),
                     out_shardings=(repl, repl))

    def run(*args):
        from graphinvent_tpu.models.annotate import edge_sharding
        with edge_sharding(mesh):       # graph-axis hints, if graph > 1
            return jitted(*args)

    return run


def _make_loglik(cfg: GraphInventConfig, mesh=None):
    """Jitted trajectory replay: calling trajectory_loglik raw executes the
    L-step scan op-by-op (seconds per call through the TPU tunnel).

    The forward-only replay (prior/BASF likelihoods are *data* for the
    loss targets, never differentiated) traces inside fused_inference():
    the Pallas ENN kernel serves it like the sampler.  The GRADIENT
    replay (_make_rl_grad) must NOT - pallas_call has no autodiff rule."""
    fn = lambda p, a, t: trajectory_loglik(cfg, p, a, t)
    if mesh is None:
        jitted = jax.jit(fn)

        def run(*args):
            from graphinvent_tpu.models.fused_enn import fused_inference
            with fused_inference():
                return jitted(*args)

        return run
    from jax.sharding import NamedSharding, PartitionSpec as P
    row = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    jitted = jax.jit(fn, in_shardings=(repl, row, row), out_shardings=row)

    def run(*args):
        from graphinvent_tpu.models.annotate import edge_sharding
        with edge_sharding(mesh):
            return jitted(*args)

    return run


def _make_adam(cfg: GraphInventConfig):
    """Jitted optimizer update (unjitted it dispatches one op per leaf).
    No buffer donation: prior/BASF param trees alias the agent's buffers
    (``prior_params = agent_params``), so donating params would invalidate
    them."""
    return jax.jit(adam_update)


def _score_batch(workflow, scoring_fn: ScoringFunction, analyzer: Analyzer,
                 res, step: int, label: str, write: bool
                 ) -> Tuple[np.ndarray, np.ndarray]:
    validity, uniqueness, _ = analyzer.evaluate_generated_graphs(
        res.graphs, res.properly_terminated, res.final_loglikelihoods,
        epoch_key=f"Step {step} {label}", write=write, label=label,
        plot=False)
    scores = scoring_fn.compute_score(res.graphs, res.properly_terminated,
                                      validity, uniqueness)
    return scores, uniqueness


# fraction-unique below this trips the collapse warning: healthy fine-tuning
# stays >0.8 unique-per-batch; the measured N=40 collapse (reference-default
# hyperparameters, docs/7:63-77) fell 0.95 -> 0.02 within ~40 steps and went
# unnoticed in round 3 -- this is the guard that run lacked
COLLAPSE_UNIQUENESS_THRESHOLD = 0.5


def _warn_on_collapse(logger, step: int, unique: np.ndarray,
                      primary: bool) -> float:
    """Loud mode-collapse alarm on the agent rollout's batch uniqueness."""
    frac = float(np.mean(np.asarray(unique) != 0))
    if frac < COLLAPSE_UNIQUENESS_THRESHOLD:
        import sys
        msg = (f"*** WARNING step {step}: batch uniqueness {frac:.3f} < "
               f"{COLLAPSE_UNIQUENESS_THRESHOLD} -- the agent is likely "
               f"mode-collapsing (seen at N=40 with reference-default "
               f"sigma/lr, docs/7). Lower init_lr / sigma or use binary "
               f"scoring; consider restarting from the last good "
               f"checkpoint. ***")
        print(msg, file=sys.stderr, flush=True)
        print(msg, flush=True)
        if primary:
            try:
                logger.tb_scalar("Fine-tuning/uniqueness_collapse", frac, step)
            except Exception:
                pass
    return frac


def learning_phase(workflow) -> None:
    """Fine-tunes a pre-trained model via policy gradient RL."""
    if jax.process_index() != 0:
        # single-writer like generate/test: under multi-host every process
        # would roll out + score + update its own divergent copy and race
        # on the job-dir files.  Multi-DEVICE fine-tuning (one process)
        # shards rollouts/replay over the mesh below; multi-host RL would
        # need cross-host rollout sharding + grad psum (not a reference
        # capability -- it fine-tunes on one device, Workflow.py:515-612).
        return
    cfg: GraphInventConfig = workflow.cfg
    logger = workflow.logger
    analyzer = Analyzer(cfg, logger, workflow._load_ts_properties(),
                        workflow.start_time)
    scoring_fn = ScoringFunction(cfg)

    # ---- load pre-trained model (Workflow.py:164-206) ---------------------
    found = latest_checkpoint(cfg.pretrained_model_dir)
    if found is None:
        import os
        for ext in (".ckpt", ".pth"):
            pre = os.path.join(cfg.dataset_dir, f"pretrained_model{ext}")
            if os.path.exists(pre):
                found = (pre, 0)
                break
    if found is None:
        raise FileNotFoundError(
            f"no pre-trained checkpoint in {cfg.pretrained_model_dir} or "
            f"{cfg.dataset_dir}")
    path, restart_epoch = found
    print(f"-- Loading pre-trained model from {path}", flush=True)
    agent_params = load_params_any(cfg, path)
    # the fine-tune job is mesh-native like training: rollouts shard over
    # ``data`` in the sampler, the replay gradient shards its trajectory
    # rows, host work is gated on process 0
    mesh = workflow._sampler_mesh()
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        agent_params = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), repl), agent_params)
    else:
        agent_params = jax.tree_util.tree_map(jnp.asarray, agent_params)
    prior_params = agent_params
    basf_params = agent_params          # "best agent so far"

    opt_state = adam_init(agent_params)
    schedule = onecycle_for_config(cfg, 1)
    if mesh is not None and cfg.batch_size % mesh.shape["data"]:
        raise ValueError(
            f"batch_size={cfg.batch_size} must divide by the data axis "
            f"({mesh.shape['data']}) for sharded fine-tuning")
    rl_grad = _make_rl_grad(cfg, mesh)
    loglik = _make_loglik(cfg, mesh)
    adam_step = _make_adam(cfg)
    sampler = GraphSampler(cfg, cfg.batch_size, mesh=mesh)
    primary = jax.process_index() == 0
    sigma, alpha = cfg.sigma, cfg.alpha
    best_avg_score = 0.0
    key = workflow.key

    start_step = restart_epoch + 1
    end_step = start_step + cfg.epochs

    # ---- pre-fine-tuning evaluation (Workflow.py:536-542) -----------------
    res = sampler.sample(agent_params, jax.random.fold_in(key, 999_999))
    scores0, _ = _score_batch(workflow, scoring_fn, analyzer, res,
                              start_step - 1, "pre-fine-tuning", primary)
    if primary:
        logger.save_rl_metrics(start_step - 1, float(np.mean(scores0)),
                               append=False)

    print("* Begin learning.", flush=True)
    for step in range(start_step, end_step):
        t0 = time.time()
        # ---- agent rollout -----------------------------------------------
        res_a = sampler.sample(agent_params, jax.random.fold_in(key, 2 * step),
                               quiet=True)
        # overlap host scoring with device work (round-4 verdict item 5:
        # the live activity step carried ~2x overhead over the device
        # core): dispatch the prior replay AND the BASF rollout now, score
        # the agent batch on the host while they execute, fetch after
        prior_ll_dev = loglik(prior_params, jnp.asarray(res_a.actions),
                              jnp.asarray(res_a.t_counts))
        basf_handle = sampler.sample_async(
            basf_params, jax.random.fold_in(key, 2 * step + 1))
        scores_a, unique_a = _score_batch(workflow, scoring_fn, analyzer,
                                          res_a, step, "agent", primary)
        _warn_on_collapse(logger, step, unique_a, primary)
        prior_ll = np.asarray(prior_ll_dev)
        target_a = jnp.asarray(prior_ll + sigma * scores_a, jnp.float32)
        mask_a = jnp.asarray(unique_a != 0, jnp.float32)
        # per-step likelihood traces (reference: Workflow.py:738-743 +
        # util.tbwrite_loglikelihoods writes the negated loglikelihoods)
        if primary:
            logger.tb_scalar("Fine-tuning/agent_nll",
                             float(-np.mean(res_a.final_loglikelihoods)), step)
            logger.tb_scalar("Fine-tuning/prior_nll",
                             float(-np.mean(prior_ll)), step)

        # ---- best-agent-so-far rollout (Workflow.py:588-591,743-747) ------
        res_b = sampler.finish(basf_handle, quiet=True)
        basf_ll_dev = loglik(basf_params, jnp.asarray(res_b.actions),
                             jnp.asarray(res_b.t_counts))
        scores_b, unique_b = _score_batch(workflow, scoring_fn, analyzer,
                                          res_b, step, "BASF", False)
        basf_ll = np.asarray(basf_ll_dev)
        # loss_b = (basf_ll - (agent_ll + sigma*score))^2, mask includes the
        # score > best_avg_score gate
        target_b = jnp.asarray(basf_ll - sigma * scores_b, jnp.float32)
        unique_b = np.where(scores_b > best_avg_score, unique_b, 0)
        mask_b = jnp.asarray(unique_b != 0, jnp.float32)

        loss, grads = rl_grad(agent_params,
                              jnp.asarray(res_a.actions),
                              jnp.asarray(res_a.t_counts), target_a, mask_a,
                              jnp.asarray(res_b.actions),
                              jnp.asarray(res_b.t_counts), target_b, mask_b,
                              alpha)
        lr, beta1 = schedule(opt_state.step)
        agent_params, opt_state = adam_step(grads, opt_state, agent_params,
                                            lr, beta1)

        avg_score = float(np.mean(scores_a))
        print(f"Step {step}: loss {float(loss):.4f} avg_score "
              f"{avg_score:.4f} ({time.time()-t0:.1f}s)", flush=True)
        if primary:
            logger.write_training_status(step, float(lr), float(loss), 0.0,
                                         score=avg_score)

        if step % cfg.sample_every == 0:
            res_e = sampler.sample(agent_params,
                                   jax.random.fold_in(key, 10_000_000 + step),
                                   quiet=True)
            scores_e, _ = _score_batch(workflow, scoring_fn, analyzer, res_e,
                                       step, "eval", primary)
            eval_score = float(np.mean(scores_e))
            if primary:
                logger.save_rl_metrics(step, eval_score)
                save_checkpoint(checkpoint_path(cfg.job_dir, step),
                                agent_params, opt_state, step)
            if eval_score > best_avg_score:
                best_avg_score = eval_score
                basf_params = agent_params
                print("-- Updated best model.", flush=True)
