"""Speed-of-light / roofline study of the train step (BASELINE.md target
row "edges/s/chip ... speed-of-light study vs HBM roofline").

    PYTHONPATH=/root/.axon_site:/root/repo python tools/roofline.py \
        [--models GGNN,EMN] [--batch 1000] [--nodes 13,40,80] \
        [--dtype bfloat16] [--steps 50] [--packed on|off|auto] [--json FILE]

For each (model, batch, max_n_nodes) configuration it reports:

* **flops / bytes** — analytic FLOPs and HBM bytes of one full train step
  (forward + backward + Adam + OneCycle), taken from XLA's cost analysis
  of the exact compiled HLO that runs (``compiled.cost_analysis()``), so
  the count tracks every fusion decision the compiler actually made.
  "bytes accessed" is XLA's HBM-traffic model (operand reads + writes per
  fusion, no cache modelling) — an upper-ish bound on true traffic.
* **step time** — steady-state, measured as ``--steps`` train steps
  scanned into ONE device program (dispatch/tunnel overhead amortised;
  this is also how device-resident epochs execute in production).
* **MFU** — achieved FLOP/s over the chip's peak bf16 matmul rate.
* **speed-of-light** — the step-time hardware lower bound
  ``max(flops/peak_flops, min_bytes/peak_bw)`` (min_bytes = optimizer
  read-modify-write + input batch, a provable traffic floor), the
  fraction of it achieved, and which resource sets it.  XLA's own
  "bytes accessed" is reported as ``hbm_bytes_modeled`` but it counts
  every fusion operand (overshoots peak bandwidth) and bounds nothing.

The reference publishes no comparable numbers (BASELINE.md): its hot path
re-extracts dynamic edge lists per batch (gnn/summation_mpnn.py:106-116),
which has no meaningful roofline position.  These numbers are this
framework's own ceiling audit.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

# Public chip specs (cloud.google.com/tpu/docs/v5e; v4/v5p/v6e for
# completeness).  Keyed by substrings of jax device_kind.
CHIP_SPECS = {
    "v5 lite": dict(peak_bf16=1.97e14, hbm_gbps=819e9, name="TPU v5e"),
    "v5e": dict(peak_bf16=1.97e14, hbm_gbps=819e9, name="TPU v5e"),
    "v4": dict(peak_bf16=2.75e14, hbm_gbps=1.2e12, name="TPU v4"),
    "v5p": dict(peak_bf16=4.59e14, hbm_gbps=2.765e12, name="TPU v5p"),
    "v6 lite": dict(peak_bf16=9.18e14, hbm_gbps=1.64e12, name="TPU v6e"),
}


def chip_spec(device) -> dict | None:
    kind = getattr(device, "device_kind", "").lower()
    for key, spec in CHIP_SPECS.items():
        if key in kind:
            return spec
    return None


def synthetic_batch(cfg, batch_size: int, seed: int = 0):
    """Chemistry-shaped random graphs at the config's dimensions: a chain
    backbone plus ring closures, degree capped at 4 (organic valence), one
    random one-hot APD target per graph.  Generalises
    tools/torch_baseline.synthetic_batch (fixed N=13) to any max_n_nodes."""
    rng = np.random.default_rng(seed)
    N, Fn = cfg.dim_nodes
    E = cfg.n_edge_features
    nodes = np.zeros((batch_size, N, Fn), np.float32)
    edges = np.zeros((batch_size, N, N, E), np.float32)
    apds = np.zeros((batch_size, cfg.dim_apd), np.float32)
    n_atoms = rng.integers(max(2, N // 2), N + 1, size=batch_size)
    for b in range(batch_size):
        n = int(n_atoms[b])
        atom = rng.integers(0, cfg.n_atom_types, size=n)
        nodes[b, np.arange(n), atom] = 1
        nodes[b, :n, cfg.n_atom_types + 1] = 1          # formal charge 0
        t = rng.integers(0, E, size=n - 1)
        idx = np.arange(n - 1)
        edges[b, idx, idx + 1, t] = 1
        edges[b, idx + 1, idx, t] = 1
        deg = np.zeros(n, np.int64)
        deg[:-1] += 1
        deg[1:] += 1
        for _ in range(int(rng.integers(0, max(2, n // 4)))):
            i, j = sorted(rng.choice(n, 2, replace=False).tolist())
            if j > i + 1 and deg[i] < 4 and deg[j] < 4 \
                    and edges[b, i, j].sum() == 0:
                edges[b, i, j, 0] = edges[b, j, i, 0] = 1
                deg[i] += 1
                deg[j] += 1
        apds[b, int(rng.integers(0, cfg.dim_apd))] = 1
    return nodes, edges, apds


def packing_overhead_flops(cfg, forward_passes: int = 1) -> float:
    """Analytic FLOPs of the packed formulations' one-hot/permutation
    matmuls in ONE forward -- work the *algorithm* does not require (a
    gather/segment-sum implementation would do ~0 FLOPs for the selects and
    one add per edge-element for the reductions) but that we deliberately
    spend to stay on the MXU (models/mpnn.py:_packed_attention_messages,
    apply_emn_packed).  Program-FLOPs MFU counts these as useful work and
    flatters the packed paths; ``mfu_algo`` excludes them.

    Returns forward FLOPs; a train step's overhead is 2x this (each
    overhead matmul contributes exactly one same-shape matmul to the
    backward pass -- the one-hot operand is data, not differentiated).
    """
    from graphinvent_tpu.models.mpnn import _emn_edge_capacity
    B = cfg.batch_size
    N = cfg.max_n_nodes
    E = cfg.n_edge_features
    C = _emn_edge_capacity(cfg)
    packed = cfg.emn_packed and C < N * N
    if not packed:
        return 0.0
    P = cfg.message_passes
    if cfg.model in ("AttS2V", "AttGGNN"):
        M = cfg.message_size
        select = 2 * E * 2.0 * B * C * N * M          # att_sel + emb_sel
        segsum = 2 * (2.0 * B * C * N * M - B * C * M)  # S, T vs segment adds
        return forward_passes * P * (select + segsum)
    if cfg.model == "EMN":
        D = cfg.edge_emb_size
        at_rev = 2 * 2.0 * B * C * C * D              # exp_rev + emb_rev
        contract = 2 * (2.0 * B * C * N * D - B * C * D)   # S, T
        at_src = 2 * (2.0 * B * C * N * D - B * C * D)     # S_at, T_at
        per_pass = at_rev + contract + at_src
        final = 2.0 * B * C * N * D - B * C * D       # graph_sets
        return forward_passes * (P * per_pass + final)
    return 0.0


def measure(cfg, n_steps: int = 50, seed: int = 0, n_repeats: int = 1):
    """-> dict with flops, bytes, params, step time, edges/batch for one
    train-step program at cfg's dims.  ``n_repeats`` > 1 times the scanned
    program that many times and reports the MEDIAN step time plus min/max
    spread (``step_time_min_s``/``step_time_max_s``) -- tunneled TPU timings
    carry ±10% day-level variance (BASELINE.md), so single-shot numbers
    can't attribute round-over-round deltas."""
    import jax
    import jax.numpy as jnp
    from graphinvent_tpu.models import apply_model, init_model
    from graphinvent_tpu.train.loss import apd_kl_loss
    from graphinvent_tpu.train.optim import (adam_init, adam_update,
                                             onecycle_for_config)

    params = init_model(cfg, jax.random.PRNGKey(seed))
    opt_state = adam_init(params)
    schedule = onecycle_for_config(cfg, 100)
    nodes_np, edges_np, apds_np = synthetic_batch(cfg, cfg.batch_size, seed)
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    nodes = jnp.asarray(nodes_np, dt)
    edges = jnp.asarray(edges_np, dt)
    apds = jnp.asarray(apds_np)
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))

    def loss_fn(p, rng):
        logits = apply_model(cfg, p, nodes, edges, train=True, rng=rng)
        return apd_kl_loss(logits.astype(jnp.float32), apds)

    def one_step(p, o, rng):
        loss, grads = jax.value_and_grad(loss_fn)(p, rng)
        lr, beta1 = schedule(o.step)
        p, o = adam_update(grads, o, p, lr, beta1)
        return p, o, loss

    # cost analysis of the single-step program (the scanned program below
    # is the same body repeated n_steps times)
    single = jax.jit(one_step)
    compiled = single.lower(params, opt_state, jax.random.PRNGKey(1)).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    transcendentals = float(cost.get("transcendentals", 0.0))
    hbm_bytes = float(cost.get("bytes accessed", 0.0))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run_steps(p, o, rng):
        def body(carry, i):
            p, o = carry
            p, o, loss = one_step(p, o, jax.random.fold_in(rng, i))
            return (p, o), loss
        (p, o), losses = jax.lax.scan(body, (p, o),
                                      jnp.arange(n_steps))
        return p, o, losses[-1]

    key = jax.random.PRNGKey(2)
    for k in (0, 1):     # compile + flush one-time post-compile cost
        params, opt_state, loss = run_steps(params, opt_state,
                                            jax.random.fold_in(key, k))
        jax.block_until_ready(loss)
    times = []
    for r in range(max(1, n_repeats)):
        t0 = time.time()
        params, opt_state, loss = run_steps(params, opt_state,
                                            jax.random.fold_in(key, 7 + r))
        jax.block_until_ready(loss)
        times.append((time.time() - t0) / n_steps)
    step_t = float(np.median(times))

    batch_bytes = (nodes.nbytes + edges.nbytes + apds.nbytes)
    return dict(
        flops=flops, transcendentals=transcendentals,
        hbm_bytes_modeled=hbm_bytes, batch_bytes=batch_bytes,
        step_time_s=step_t, step_time_min_s=float(min(times)),
        step_time_max_s=float(max(times)), n_repeats=len(times),
        n_params=n_params,
        edges_per_batch=float(edges_np.sum() / 2),
    )


def roofline_row(cfg, spec, n_steps: int = 50, seed: int = 0,
                 n_repeats: int = 1) -> dict:
    """Speed-of-light accounting for one measured row.

    * ``t_mxu = flops / peak_bf16`` is a true lower bound on step time
      given the program's FLOPs.
    * ``t_hbm_min`` uses an analytic LOWER bound on HBM traffic: the
      optimizer read-modify-write (params + grads + two Adam moments,
      28 B/param f32) plus one read of the input batch.  Activation
      traffic is deliberately excluded -- XLA's "bytes accessed" model
      (kept as ``hbm_bytes_modeled``) counts every fusion operand and
      overshoots peak bandwidth, so it bounds nothing.
    * SoL step time = max of the two; ``sol_fraction`` is the share of
      that hardware bound actually achieved, and ``bound`` names the
      resource that sets it.
    """
    m = measure(cfg, n_steps=n_steps, seed=seed, n_repeats=n_repeats)
    row = dict(model=cfg.model, batch=cfg.batch_size, n=cfg.max_n_nodes,
               dtype=cfg.compute_dtype, packed=bool(cfg.emn_packed),
               **m)
    row["edges_per_s"] = m["edges_per_batch"] / m["step_time_s"]
    row["graphs_per_s"] = cfg.batch_size / m["step_time_s"]
    # algorithmic FLOPs: program FLOPs minus the packed paths' one-hot /
    # permutation matmul overhead (x2: forward + its backward images).
    # mfu_algo is the honest number for cross-formulation comparison;
    # mfu (program FLOPs) tracks how well the chosen program runs.
    overhead = 2.0 * packing_overhead_flops(cfg)
    row["overhead_flops"] = overhead
    row["flops_algo"] = max(m["flops"] - overhead, 0.0)
    if spec is not None:
        hbm_min = 28.0 * m["n_params"] + m["batch_bytes"]
        t_mxu = m["flops"] / spec["peak_bf16"]
        t_hbm = hbm_min / spec["hbm_gbps"]
        row["mfu"] = m["flops"] / m["step_time_s"] / spec["peak_bf16"]
        row["mfu_algo"] = (row["flops_algo"] / m["step_time_s"]
                           / spec["peak_bf16"])
        row["hbm_min_bytes"] = hbm_min
        row["sol_step_time_s"] = max(t_mxu, t_hbm)
        row["sol_fraction"] = row["sol_step_time_s"] / m["step_time_s"]
        row["bound"] = "MXU" if t_mxu >= t_hbm else "HBM"
        row["chip"] = spec["name"]
    return row


def measure_sampler(cfg, n_rounds: int = 16, seed: int = 0,
                    n_repeats: int = 3):
    """Per-action-round cost of the sampling program.

    Runs the generator body (model forward + categorical sample + action
    decode/apply + likelihood bookkeeping -- sampling/generator.py) for a
    STATIC ``n_rounds`` via ``fori_loop``: the same body the production
    ``while_loop`` executes, with the data-dependent exit removed so
    per-round attribution is exact.  The reference's only sampling metric
    is end-to-end molecules/s (GraphGenerator.py:67-71); this is the
    hardware-position audit behind that number."""
    import jax
    from graphinvent_tpu.models import apply_model, init_model
    from graphinvent_tpu.sampling.generator import _sample_loop

    params = init_model(cfg, jax.random.PRNGKey(seed))
    B = cfg.batch_size
    apply_fn = lambda p, n, e: apply_model(cfg, p, n, e)
    fn = jax.jit(lambda p, k: _sample_loop(cfg, p, k, B, apply_fn, None,
                                           fixed_rounds=n_rounds))
    key = jax.random.PRNGKey(1)
    compiled = fn.lower(params, key).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    # XLA cost analysis counts a fori/while BODY ONCE regardless of trip
    # count (verified: rounds=4 and rounds=8 report identical flops), so
    # the body count IS the per-round count.  Until round 5 this was
    # divided by n_rounds, understating sampler FLOPs (and MFU) 16x --
    # the "1.5% MFU" sampler rows in rounds 3-4 were this bug; the true
    # pre-kernel figure at N=40 was ~24-34%.
    flops = float(cost.get("flops", 0.0))

    # Warm up with a VALUE fetch, not block_until_ready: on the tunneled
    # backend block_until_ready can return while the server is still
    # loading/compiling the program, after which "timings" are dispatch
    # latency only (measured: 0.045 "ms/round" at N=40 vs 6.1 ms real —
    # a 264% "MFU").  Fetching a real output forces a true sync.
    out = fn(params, key)
    np.asarray(out[7])                       # t: (B,) int32 — small fetch
    times = []
    for r in range(max(1, n_repeats)):
        t0 = time.time()
        out = fn(params, jax.random.fold_in(key, r))
        np.asarray(out[7])                   # sync via small value fetch
        times.append((time.time() - t0) / n_rounds)
    return dict(
        round_time_s=float(np.median(times)),
        round_time_min_s=float(min(times)),
        round_time_max_s=float(max(times)),
        flops_per_round=flops,
        n_rounds=n_rounds,
    )


def sampler_row(cfg, spec, n_rounds: int = 16, seed: int = 0) -> dict:
    """Sampler roofline row: per-round cost + device-side molecules/s at
    the full action budget (every graph sampled to L = gen_action_budget
    rounds -- the worst case; real batches exit as soon as all graphs
    terminate, so production mol/s sits above this floor)."""
    m = measure_sampler(cfg, n_rounds=n_rounds, seed=seed)
    row = dict(model=cfg.model, batch=cfg.batch_size, n=cfg.max_n_nodes,
               dtype=cfg.compute_dtype, packed=bool(cfg.emn_packed), **m)
    max_rounds = cfg.gen_action_budget + 4
    row["max_rounds"] = max_rounds
    row["device_mol_per_s_full_budget"] = (
        cfg.batch_size / (max_rounds * m["round_time_s"]))
    overhead = packing_overhead_flops(cfg)     # 1 forward per round
    row["flops_algo_per_round"] = max(m["flops_per_round"] - overhead, 0.0)
    if spec is not None:
        row["mfu"] = (m["flops_per_round"] / m["round_time_s"]
                      / spec["peak_bf16"])
        row["mfu_algo"] = (row["flops_algo_per_round"] / m["round_time_s"]
                           / spec["peak_bf16"])
        t_mxu = m["flops_per_round"] / spec["peak_bf16"]
        # traffic floor per round: read the params once (bf16 live copies)
        # -- loop state stays resident
        row["sol_round_time_s"] = t_mxu
        row["sol_fraction"] = t_mxu / m["round_time_s"]
        # the loop body is matmul-light (decode/apply/record small ops);
        # call it MXU-bound only when the MXU floor explains most of the
        # round, otherwise the binding resource is per-op overhead
        row["bound"] = "MXU" if row["sol_fraction"] > 0.5 else "overhead"
        row["chip"] = spec["name"]
    return row


def fmt_sampler_row(r: dict) -> str:
    base = (f"{r['model']:8s} B={r['batch']:<5d} N={r['n']:<3d} "
            f"{'packed' if r['packed'] else 'dense ':6s} "
            f"{r['round_time_s']*1e3:8.3f} ms/round  "
            f"{r['flops_per_round']/1e9:7.2f} GF/round  "
            f"{r['device_mol_per_s_full_budget']:9.0f} mol/s@budget")
    if "mfu" in r:
        base += f"  MFU {r['mfu']*100:5.1f}% (algo {r['mfu_algo']*100:5.1f}%)"
    return base


def fmt_row(r: dict) -> str:
    base = (f"{r['model']:8s} B={r['batch']:<5d} N={r['n']:<3d} "
            f"{'packed' if r['packed'] else 'dense ':6s} "
            f"{r['step_time_s']*1e3:8.2f} ms  "
            f"{r['flops']/1e9:8.1f} GF  "
            f"{r['edges_per_s']/1e6:7.2f} Me/s")
    if "mfu" in r:
        base += (f"  MFU {r['mfu']*100:5.1f}%"
                 f" (algo {r['mfu_algo']*100:5.1f}%)"
                 f"  SoL {r['sol_fraction']*100:5.1f}% ({r['bound']})")
    return base


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="GGNN")
    ap.add_argument("--batch", type=int, default=1000)
    ap.add_argument("--nodes", default="13")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--packed", default="auto", choices=["auto", "on", "off"])
    ap.add_argument("--sampler", action="store_true",
                    help="roofline the SAMPLING loop (per-action-round cost) "
                         "instead of the train step")
    ap.add_argument("--repeats", type=int, default=1,
                    help="timed repeats; median + min/max spread reported")
    ap.add_argument("--json", default=None,
                    help="append one JSON line per row to this file")
    args = ap.parse_args()

    from graphinvent_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax
    from graphinvent_tpu.config import preset

    dev = jax.devices()[0]
    spec = chip_spec(dev)
    print(f"device: {dev.device_kind!r}"
          + (f" -> {spec['name']} peak {spec['peak_bf16']/1e12:.0f} TF/s bf16,"
             f" {spec['hbm_gbps']/1e9:.0f} GB/s HBM" if spec else
             " (unknown chip: flops/bytes/time only, no MFU)"))

    rows = []
    for model in args.models.split(","):
        for n in (int(x) for x in args.nodes.split(",")):
            kw = dict(batch_size=args.batch, max_n_nodes=n,
                      compute_dtype=args.dtype)
            if args.packed != "auto":
                kw["emn_packed"] = args.packed == "on"
            cfg = preset(model.strip(), **kw)
            steps = args.steps if n <= 13 else max(5, args.steps // (n // 13))
            try:
                if args.sampler:
                    row = sampler_row(cfg, spec, n_rounds=min(16, steps))
                else:
                    row = roofline_row(cfg, spec, n_steps=steps,
                                       n_repeats=args.repeats)
            except Exception as exc:   # e.g. HBM OOM on dense large-N rows
                print(f"{model:8s} B={args.batch:<5d} N={n:<3d} FAILED: "
                      f"{type(exc).__name__}: {str(exc)[:120]}")
                continue
            rows.append(row)
            print(fmt_sampler_row(row) if args.sampler else fmt_row(row))
            if args.json:
                with open(args.json, "a") as fh:
                    fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
