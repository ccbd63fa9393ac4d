"""Stage breakdown of the RL fine-tuning step (round-3 verdict item 4:
"RL step cost unattributed").

    python tools/profile_rl.py [batch_size] [steps] [--preset NAME] \
        [--checkpoint path.ckpt] [--max-atoms N] [--aromatic]

Times each stage of one learning step (mirrors rl/workflow_rl.py
learning_phase's loop body stage for stage, same jitted programs):

  rollout      device sampling (loop+pack+fetch), agent + BASF
  score:decode Analyzer.evaluate_generated_graphs (native validity/SMILES,
               property histograms, logging)
  score:qed    ScoringFunction.compute_score (Molecule build + QED etc.)
  loglik       trajectory replay NLL of prior/BASF (device)
  grad         rl_grad value+grad (device, remat replay both arms)
  adam         optimizer update

Without --checkpoint the model is random-init (scores ~0; decode cost is
then *underestimated* because invalid molecules skip SMILES work -- use a
trained checkpoint for honest numbers).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import numpy as np

from graphinvent_tpu.config import preset


def fetch_sync(x):
    """Value-fetch sync: on the tunneled backend block_until_ready can
    return before the server finishes (BASELINE.md sampler-roofline note)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    if hasattr(leaf, "ravel"):          # 0-dim scalars ravel to (1,)
        leaf = jax.numpy.ravel(leaf)[0:1]
    return np.asarray(leaf)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("batch_size", nargs="?", type=int, default=500)
    ap.add_argument("steps", nargs="?", type=int, default=3)
    ap.add_argument("--preset", default="GGNN")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--max-atoms", type=int, default=13)
    ap.add_argument("--aromatic", action="store_true")
    ap.add_argument("--dtype", default="float32",
                    help="compute_dtype; campaign fine-tune jobs run bfloat16")
    ap.add_argument("--score", default="QED",
                    help="comma-joined score_components (the old "
                         "target_size=max_n_nodes default is now rejected "
                         "as degenerate by config.validate)")
    ap.add_argument("--remat-segment", type=int, default=1,
                    help="rl_remat_segment: checkpoint every k-th replay "
                         "carry (1 = per-step remat)")
    args = ap.parse_args()

    comps = tuple(args.score.split(","))
    cfg = preset(args.preset, job_type="fine-tune", batch_size=args.batch_size,
                 max_n_nodes=args.max_atoms, compute_dtype=args.dtype,
                 use_aromatic_bonds=args.aromatic,
                 score_components=comps,
                 rl_remat_segment=args.remat_segment,
                 score_thresholds=tuple(0.5 for _ in comps))

    from graphinvent_tpu.eval.analyzer import Analyzer
    from graphinvent_tpu.eval.scoring import ScoringFunction
    from graphinvent_tpu.models import init_model
    from graphinvent_tpu.rl.workflow_rl import _make_adam, _make_loglik, _make_rl_grad
    from graphinvent_tpu.sampling import GraphSampler
    from graphinvent_tpu.train.optim import adam_init, onecycle_for_config
    from graphinvent_tpu.utils.checkpoint import load_params_any

    if args.checkpoint:
        agent = load_params_any(cfg, args.checkpoint)
        agent = jax.tree_util.tree_map(jax.numpy.asarray, agent)
    else:
        agent = init_model(cfg, jax.random.PRNGKey(0))
    prior = agent
    basf = agent

    import tempfile
    cfg = cfg.replace(job_dir=tempfile.mkdtemp(prefix="rlprof_") + "/")
    analyzer = Analyzer(cfg)
    scoring = ScoringFunction(cfg)
    sampler = GraphSampler(cfg, cfg.batch_size)
    rl_grad = _make_rl_grad(cfg, None)
    loglik = _make_loglik(cfg, None)
    adam_step = _make_adam(cfg)
    opt_state = adam_init(agent)
    schedule = onecycle_for_config(cfg, 1)
    sigma, alpha = cfg.sigma, cfg.alpha

    print(f"preset={args.preset} B={cfg.batch_size} N={cfg.max_n_nodes} "
          f"score={comps} ckpt={bool(args.checkpoint)}")

    stages = {}

    def timed(name, fn, *a, sync=False, **kw):
        t0 = time.time()
        out = fn(*a, **kw)
        if sync:
            fetch_sync(out)
        stages.setdefault(name, []).append(time.time() - t0)
        return out

    import jax.numpy as jnp
    for step in range(args.steps + 1):  # step 0 = compile warm-up, dropped
        key = jax.random.PRNGKey(100 + step)
        res_a = timed("rollout(agent)", sampler.sample, agent,
                      jax.random.fold_in(key, 0), quiet=True)
        v_a, u_a, _ = timed("score:decode(agent)",
                            analyzer.evaluate_generated_graphs,
                            res_a.graphs, res_a.properly_terminated,
                            res_a.final_loglikelihoods,
                            epoch_key=f"Step {step} agent", write=False,
                            plot=False)
        scores_a = timed("score:qed(agent)", scoring.compute_score,
                         res_a.graphs, res_a.properly_terminated, v_a, u_a)
        prior_ll = np.asarray(timed("loglik(prior)", loglik, prior,
                                    jnp.asarray(res_a.actions),
                                    jnp.asarray(res_a.t_counts), sync=True))
        target_a = jnp.asarray(prior_ll + sigma * scores_a, jnp.float32)
        mask_a = jnp.asarray(u_a != 0, jnp.float32)

        res_b = timed("rollout(BASF)", sampler.sample, basf,
                      jax.random.fold_in(key, 1), quiet=True)
        v_b, u_b, _ = timed("score:decode(BASF)",
                            analyzer.evaluate_generated_graphs,
                            res_b.graphs, res_b.properly_terminated,
                            res_b.final_loglikelihoods,
                            epoch_key=f"Step {step} BASF", write=False,
                            plot=False)
        scores_b = timed("score:qed(BASF)", scoring.compute_score,
                         res_b.graphs, res_b.properly_terminated, v_b, u_b)
        basf_ll = np.asarray(timed("loglik(BASF)", loglik, basf,
                                   jnp.asarray(res_b.actions),
                                   jnp.asarray(res_b.t_counts), sync=True))
        target_b = jnp.asarray(basf_ll - sigma * scores_b, jnp.float32)
        mask_b = jnp.asarray(u_b != 0, jnp.float32)

        loss, grads = timed("grad", rl_grad, agent,
                            jnp.asarray(res_a.actions),
                            jnp.asarray(res_a.t_counts), target_a, mask_a,
                            jnp.asarray(res_b.actions),
                            jnp.asarray(res_b.t_counts), target_b, mask_b,
                            alpha, sync=True)
        lr, beta1 = schedule(opt_state.step)
        agent, opt_state = timed("adam", adam_step, grads, opt_state, agent,
                                 lr, beta1, sync=True)
        if step == 0:
            stages.clear()           # drop compile-time step
            print("-- warm-up done")
    print(f"\nper-step stage breakdown (mean of {args.steps} steps, "
          f"valid fraction agent batch {float(np.mean(v_a)):.2f}):")
    total = 0.0
    for name, ts in stages.items():
        m = float(np.mean(ts))
        total += m
        print(f"  {name:22s} {m*1e3:9.1f} ms")
    print(f"  {'TOTAL':22s} {total*1e3:9.1f} ms/step")


if __name__ == "__main__":
    main()
