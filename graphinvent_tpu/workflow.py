"""Job orchestration: the recipes for the five job types.

Rebuilds Workflow (Workflow.py:27-898): ``preprocess``, ``train``,
``generate``, ``test``, ``fine-tune``.  State is explicit (params +
optimizer pytrees), checkpoints capture everything, and all device work goes
through the jitted steps in train/step.py and sampling/.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graphinvent_tpu.config import GraphInventConfig
from graphinvent_tpu.data import BlockLoader, HDFDataset
from graphinvent_tpu.data.preprocess import preprocess_dataset
from graphinvent_tpu.eval.analyzer import Analyzer
from graphinvent_tpu.eval.properties import load_ts_properties_csv
from graphinvent_tpu.models import init_model
from graphinvent_tpu.train.optim import (
    AdamState, adam_init, onecycle_for_config,
)
from graphinvent_tpu.train.step import (
    make_eval_step, make_likelihood_step, make_train_step,
)
from graphinvent_tpu.sampling import GraphSampler
from graphinvent_tpu.utils.checkpoint import (
    checkpoint_path, latest_checkpoint, load_checkpoint, load_params_any,
    save_checkpoint,
)
from graphinvent_tpu.utils.logging import JobLogger


def _scalar_int(x) -> int:
    """int() accepting python ints, local arrays, and multihost-replicated
    global arrays (parallel/multihost.py:scalar)."""
    from graphinvent_tpu.parallel.multihost import scalar
    return int(scalar(x))


def streamed_random_nlls(ds, run_nll, max_rows: int, batch_size: int,
                         block_size: int, rng: np.random.Generator
                         ) -> np.ndarray:
    """NLLs of a uniform random row sample (without replacement) from a
    streamed HDF dataset -- the streamed-path analogue of
    ``train/device_data.nll_row_batches``.  The old head-truncation (first
    ``max_rows`` rows in loader order) was an order-biased subsample one
    level above the UC-JSD's own uniform subsampling.  Rows are drawn
    uniformly over the whole dataset, then read block-sequentially (sorted
    indices: no random HDF row reads) and batched with zero-padding +
    ``valid`` masks, in bounded memory.

    ``run_nll``: dict of (batch_size, ...) float32 arrays (keys nodes/
    edges/apds/valid) -> per-row NLL np.ndarray."""
    n = len(ds)
    take = min(max_rows, n)
    if take <= 0:
        return np.zeros(0)
    idx = np.sort(rng.choice(n, size=take, replace=False))
    out: List[np.ndarray] = []
    pending: List[Dict[str, np.ndarray]] = []
    pending_rows = 0

    def run(rows: Dict[str, np.ndarray]) -> None:
        m = rows["nodes"].shape[0]
        batch = {k: np.zeros((batch_size,) + v.shape[1:], np.float32)
                 for k, v in rows.items()}
        for k, v in rows.items():
            batch[k][:m] = v
        valid = np.zeros(batch_size, np.float32)
        valid[:m] = 1.0
        batch["valid"] = valid
        out.append(np.asarray(run_nll(batch))[:m])

    def drain(final: bool) -> None:
        nonlocal pending, pending_rows
        while pending_rows >= batch_size or (final and pending_rows > 0):
            rows = {k: np.concatenate([p[k] for p in pending])
                    for k in pending[0]}
            cut = min(batch_size, rows["nodes"].shape[0])
            run({k: v[:cut] for k, v in rows.items()})
            rest = {k: v[cut:] for k, v in rows.items()}
            pending_rows = rest["nodes"].shape[0]
            pending = [rest] if pending_rows else []

    pos = 0
    for bstart in range(0, n, block_size):
        bend = min(bstart + block_size, n)
        hi = pos
        while hi < take and idx[hi] < bend:
            hi += 1
        if hi == pos:
            continue
        block = ds.read_block(bstart, bend)
        local = idx[pos:hi] - bstart
        pending.append({k: v[local] for k, v in block.items()})
        pending_rows += hi - pos
        pos = hi
        drain(final=False)
    drain(final=True)
    return np.concatenate(out) if out else np.zeros(0)


def eval_sample_key(base_key: jax.Array, epoch: int, batch_idx: int) -> jax.Array:
    """Collision-free key for evaluation sampling batch ``batch_idx`` of
    epoch ``epoch``: nested fold_in, so no (epoch, batch_idx) pair aliases
    another (a flat ``epoch + batch_idx`` fold made (5,1) and (6,0) resample
    identical molecule batches, correlating successive evaluations)."""
    return jax.random.fold_in(jax.random.fold_in(base_key, 1000 + epoch),
                              batch_idx)


class Workflow:
    def __init__(self, cfg: GraphInventConfig) -> None:
        cfg.validate()
        if cfg.job_type != "preprocess":
            cfg.check_preprocessing_params()
        self.cfg = cfg
        self.start_time = time.time()
        self.logger = JobLogger(cfg.job_dir, cfg.tensorboard_dir)
        self.key = jax.random.PRNGKey(cfg.seed)
        # snapshot of the fully-resolved config this job actually runs with
        # (reference: util.write_job_parameters, util.py:478-498 writes
        # params.csv at the start of every job)
        if jax.process_index() == 0:
            cfg.write_csv(os.path.join(cfg.job_dir, "params.csv"))

        d = cfg.dataset_dir
        self.train_h5 = os.path.join(d, "train.h5")
        self.valid_h5 = os.path.join(d, "valid.h5")
        self.test_h5 = os.path.join(d, "test.h5")
        self._samplers: Dict[int, GraphSampler] = {}
        self._mesh = None

    def _sampler_mesh(self):
        """Mesh for data-parallel sampling: rollouts shard over ``data``
        whenever a single-process device mesh is configured.  Multi-host
        jobs sample per-host with local params instead (each host's
        evaluation is independent)."""
        cfg = self.cfg
        if jax.process_count() > 1:
            return None
        if cfg.dp_devices > 1 or cfg.mp_devices > 1 or cfg.graph_devices > 1:
            if self._mesh is None:
                from graphinvent_tpu.parallel import make_mesh
                self._mesh = make_mesh(cfg)
            return self._mesh
        return None

    def _get_sampler(self, batch_size: int) -> GraphSampler:
        """One GraphSampler (= one compiled program) per batch size for the
        whole job: rebuilding it per evaluation re-traces and re-loads the
        program every time (~6 s/eval through the TPU tunnel)."""
        if batch_size not in self._samplers:
            self._samplers[batch_size] = GraphSampler(
                self.cfg, batch_size, mesh=self._sampler_mesh())
        return self._samplers[batch_size]

    # ------------------------------------------------------------------
    def run(self) -> None:
        job = self.cfg.job_type
        if job == "preprocess":
            self.preprocess_phase()
        elif job == "train":
            self.training_phase()
        elif job == "generate":
            self.generation_phase()
        elif job == "test":
            self.testing_phase()
        elif job == "fine-tune":
            from graphinvent_tpu.rl.workflow_rl import learning_phase
            learning_phase(self)
        else:
            raise NotImplementedError(f"Undefined job type {job!r}")
        elapsed = time.time() - self.start_time
        print(f"-- time elapsed: {elapsed:.5f} s", flush=True)

    # ------------------------------------------------------------------
    def preprocess_phase(self) -> None:
        preprocess_dataset(self.cfg, restart=self.cfg.restart)

    # ------------------------------------------------------------------
    def _load_ts_properties(self) -> Dict:
        csv_path = os.path.join(self.cfg.dataset_dir, "train.csv")
        if os.path.exists(csv_path):
            return load_ts_properties_csv(csv_path)
        return {}

    def _init_or_restore(self, n_batches: int
                         ) -> Tuple[Any, AdamState, int]:
        """-> (params, opt_state, start_epoch)."""
        cfg = self.cfg
        if cfg.restart:
            found = latest_checkpoint(cfg.job_dir)
            if found:
                path, epoch = found
                print(f"-- Restoring checkpoint {path}", flush=True)
                if path.endswith((".pth", ".pt")):
                    # imported reference checkpoint: params only, so the
                    # optimizer starts fresh (the reference's own restart
                    # behaviour, Workflow.py:208-237)
                    params = load_params_any(cfg, path)
                    opt_state = None
                else:
                    params, opt_state, _ = load_checkpoint(path)
                if opt_state is None:
                    opt_state = adam_init(params)
                return params, opt_state, epoch + 1
        params = init_model(cfg, self.key)
        return params, adam_init(params), 1

    # ------------------------------------------------------------------
    def training_phase(self) -> None:
        cfg = self.cfg
        print("* Setting up training job.", flush=True)
        train_ds = HDFDataset(self.train_h5)
        valid_ds = HDFDataset(self.valid_h5)
        ts_props = self._load_ts_properties()
        analyzer = Analyzer(cfg, self.logger, ts_props, self.start_time)
        primary = jax.process_index() == 0
        if not cfg.restart and primary:
            self.logger.init_convergence()
            if ts_props:
                self.logger.properties_to_csv(ts_props, "Training set",
                                              append=False)

        n_proc = jax.process_count()
        if n_proc > 1 and cfg.batch_size % n_proc:
            raise ValueError(f"batch_size={cfg.batch_size} must divide by "
                             f"num_processes={n_proc} (global batch, per-host "
                             f"shards of batch_size/num_processes rows)")
        local_bs = cfg.batch_size // n_proc
        if n_proc > 1:
            from graphinvent_tpu.parallel.multihost import global_steps_per_epoch
            n_batches = global_steps_per_epoch(len(train_ds), local_bs,
                                               cfg.block_size, n_proc)
        else:
            n_batches = (len(train_ds) + cfg.batch_size - 1) // cfg.batch_size
        schedule = onecycle_for_config(cfg, n_batches)
        multi_device = (cfg.dp_devices > 1 or cfg.mp_devices > 1
                        or cfg.graph_devices > 1 or n_proc > 1)
        params, opt_state, start_epoch = self._init_or_restore(n_batches)

        from graphinvent_tpu.train.device_data import (
            DeviceDataset, epoch_permutation, make_epoch_eval_fn,
            make_epoch_nll_fn, make_epoch_train_fn,
        )
        # device-resident epochs compose with single-process meshes (batch
        # shards over ``data``, node/pair axes over ``graph``); multi-host
        # runs stream per-host block shards instead
        # the budget bounds the SUM of resident datasets -- train and valid
        # sit in HBM together, so per-dataset checks would double-book it
        budget = int(cfg.device_data_gb * (1 << 30))
        use_device = (n_proc == 1
                      and DeviceDataset.nbytes_of(train_ds)
                      + DeviceDataset.nbytes_of(valid_ds) <= budget)
        rng_np = np.random.default_rng(cfg.seed)
        if use_device:
            mesh = None
            if multi_device:
                from graphinvent_tpu.parallel import (
                    make_mesh, place_training_state,
                )
                mesh = make_mesh(cfg)
                params, opt_state = place_training_state(mesh, params,
                                                         opt_state)
                print(f"-- Dataset fits in HBM: device-resident epochs "
                      f"over mesh {dict(mesh.shape)}.", flush=True)
            else:
                print("-- Dataset fits in HBM: device-resident epoch path.",
                      flush=True)
            dtrain = DeviceDataset(train_ds, mesh=mesh)
            dvalid = DeviceDataset(valid_ds, mesh=mesh)
            train_epoch_fn = make_epoch_train_fn(cfg, schedule, dtrain, mesh)
            valid_epoch_fn = make_epoch_eval_fn(cfg, dvalid, mesh)
            nll_fns = {"valid": make_epoch_nll_fn(cfg, dvalid, mesh),
                       "train": make_epoch_nll_fn(cfg, dtrain, mesh)}
            sizes = {"valid": len(valid_ds), "train": len(train_ds)}

            def run_train_epoch(epoch):
                nonlocal params, opt_state
                perm = jnp.asarray(epoch_permutation(
                    len(train_ds), cfg.batch_size, rng_np))
                params, opt_state, loss = train_epoch_fn(
                    params, opt_state, perm, jax.random.fold_in(self.key, epoch))
                return float(loss)

            def run_valid_epoch():
                perm = jnp.asarray(epoch_permutation(
                    len(valid_ds), cfg.batch_size,
                    np.random.default_rng(0)))
                return float(valid_epoch_fn(params, perm))

            nll_rng = np.random.default_rng(cfg.seed + 1)

            def dataset_nlls(which, max_rows):
                from graphinvent_tpu.train.device_data import nll_row_batches
                perm = jnp.asarray(nll_row_batches(
                    sizes[which], max_rows, cfg.batch_size, nll_rng))
                nlls, valid = nll_fns[which](params, perm)
                nlls, valid = np.asarray(nlls), np.asarray(valid)
                return nlls[valid > 0]
        else:
            # per-host input shards: each process reads only its round-robin
            # share of the blocks (reference analogue: the *manual* split
            # flow of tools/combine_HDFs.py + tutorial 6, now built in)
            shard_kw = dict(shard_index=jax.process_index(),
                            num_shards=n_proc) if n_proc > 1 else {}
            # bitpacked wire format: 8x smaller uploads through the
            # host->device boundary the reference pays per batch in float32
            # (BlockDatasetLoader.py:135-143 + Workflow.py:781-783); the
            # jitted steps unpack on device (train/step.py batch_arrays)
            packed = bool(cfg.stream_packed)
            # sparse wire is single-process only: the dense fallback is a
            # per-host per-batch decision, and one host falling back while
            # its peers stay sparse would hand the collective step
            # mismatched batch pytrees (SPMD hang)
            apd_nnz = cfg.stream_apd_nnz if (packed and n_proc == 1) else 0
            train_loader = BlockLoader(train_ds, local_bs,
                                       cfg.block_size, seed=cfg.seed,
                                       packed=packed, apd_nnz=apd_nnz,
                                       **shard_kw)
            valid_loader = BlockLoader(valid_ds, local_bs,
                                       cfg.block_size, shuffle=False,
                                       seed=cfg.seed, packed=packed,
                                       apd_nnz=apd_nnz, **shard_kw)
            if multi_device:
                from graphinvent_tpu.parallel import (
                    make_mesh, make_sharded_train_step,
                )
                mesh = make_mesh(cfg)
                print(f"-- Sharded training over mesh {dict(mesh.shape)}"
                      f" ({n_proc} process(es)).", flush=True)
                train_step, params, place_batch = make_sharded_train_step(
                    cfg, schedule, mesh, params)
                # opt_state (fresh or restored by _init_or_restore) is
                # placed by the step's in_shardings on first call; a
                # restart keeps its Adam moments here too, unlike the
                # reference's silent re-init (Workflow.py:208-237)
                if n_proc > 1:
                    from graphinvent_tpu.parallel.mesh import batch_spec
                    from graphinvent_tpu.parallel.multihost import (
                        make_global_placer,
                    )
                    place_batch = make_global_placer(mesh, batch_spec())
            else:
                train_step = make_train_step(cfg, schedule)
                place_batch = lambda b: {k: jnp.asarray(v)
                                         for k, v in b.items()}
            eval_step = make_eval_step(cfg)
            nll_step = make_likelihood_step(cfg)
            nll_datasets = {"valid": valid_ds, "train": train_ds}
            stream_nll_rng = np.random.default_rng(cfg.seed + 1)

            def eval_params():
                """Evaluation/sampling run per-host on local devices; with
                multiple processes this takes the host's replicated copy of
                the global params."""
                if n_proc > 1:
                    from graphinvent_tpu.parallel.multihost import to_host
                    return jax.tree_util.tree_map(jnp.asarray,
                                                  to_host(params))
                return params

            def placed_batches(epoch):
                """Upload-ahead iterator: batch k+1's pack + device_put run
                on a worker thread while the device computes step k (the
                generation_phase overlap pattern).  Transfers through the
                tunnel don't overlap device EXECUTION (docs/9), but the
                host-side HDF read + packbits + dispatch do overlap, and
                the packed upload itself is ~8x smaller."""
                train_loader.set_epoch(epoch)

                def bounded():
                    for k, batch in enumerate(train_loader):
                        if k >= n_batches:
                            # multihost: every process must dispatch the
                            # same number of global steps; n_batches is the
                            # min shard length (parallel/multihost.py)
                            break
                        yield batch
                if not cfg.stream_upload_ahead:
                    for batch in bounded():
                        yield place_batch(batch)
                    return
                import queue as _queue
                import threading as _threading
                q: "_queue.Queue" = _queue.Queue(maxsize=2)
                stop = object()
                failure = []

                def worker():
                    # a swallowed exception here would silently truncate
                    # the epoch (and, multihost, deadlock the peers in the
                    # collective step) -- capture and re-raise below
                    try:
                        for batch in bounded():
                            q.put(place_batch(batch))
                    except BaseException as exc:   # noqa: BLE001
                        failure.append(exc)
                    finally:
                        q.put(stop)

                t = _threading.Thread(target=worker, daemon=True)
                t.start()
                while True:
                    item = q.get()
                    if item is stop:
                        break
                    yield item
                t.join()
                if failure:
                    raise failure[0]

            def run_train_epoch(epoch):
                nonlocal params, opt_state
                losses = []
                step_count = _scalar_int(opt_state.step)
                for b in placed_batches(epoch):
                    rng = jax.random.fold_in(self.key, step_count)
                    params, opt_state, loss = train_step(params, opt_state,
                                                         b, rng)
                    step_count += 1
                    losses.append(loss)
                from graphinvent_tpu.parallel.multihost import scalar
                return float(np.mean([scalar(l) for l in losses]))

            def run_valid_epoch():
                p = eval_params()
                vlosses = [eval_step(p, {k: jnp.asarray(v)
                                         for k, v in batch.items()})
                           for batch in valid_loader]
                return float(jnp.mean(jnp.stack(vlosses)))

            def dataset_nlls(which, max_rows):
                # uniform random rows, like the device-resident path's
                # nll_row_batches (round-3 verdict: head-truncation here was
                # an order-biased subsample)
                p = eval_params()
                return streamed_random_nlls(
                    nll_datasets[which],
                    lambda b: np.asarray(nll_step(
                        p, {k: jnp.asarray(v) for k, v in b.items()})),
                    max_rows, cfg.batch_size, cfg.block_size, stream_nll_rng)

        if n_proc == 1:
            def eval_params():          # device-resident / single-process
                return params

            def host_state():
                return params, opt_state
        else:
            def host_state():
                from graphinvent_tpu.parallel.multihost import to_host
                return to_host(params), to_host(opt_state)

        print("* Beginning training.", flush=True)
        end_epoch = start_epoch + cfg.epochs
        for epoch in range(start_epoch, end_epoch):
            t0 = time.time()
            train_loss = run_train_epoch(epoch)
            valid_loss = run_valid_epoch()
            lr, _ = schedule(_scalar_int(opt_state.step) - 1)
            print(f"Epoch {epoch}: train {train_loss:.5f} valid "
                  f"{valid_loss:.5f} ({time.time()-t0:.1f}s)", flush=True)
            if primary:
                self.logger.write_training_status(epoch, float(lr),
                                                  train_loss, valid_loss)

            if epoch % cfg.sample_every == 0 and primary:
                self.evaluate_model(eval_params(), epoch, analyzer,
                                    dataset_nlls)
                p_host, o_host = host_state()
                save_checkpoint(checkpoint_path(cfg.job_dir, epoch),
                                p_host, o_host, epoch)
        final = end_epoch - 1
        if primary:
            p_host, o_host = host_state()
            save_checkpoint(checkpoint_path(cfg.job_dir, final), p_host,
                            o_host, final)

    # ------------------------------------------------------------------
    def evaluate_model(self, params, epoch: int, analyzer: Analyzer,
                       dataset_nlls) -> None:
        """Sample + UC-JSD evaluation (reference: Workflow.py:441-513 +
        Analyzer.evaluate_model)."""
        cfg = self.cfg
        n_samples = cfg.n_samples
        batch = min(cfg.batch_size, n_samples)
        sampler = self._get_sampler(batch)
        all_nlls: List[np.ndarray] = []
        n_done = 0
        batch_idx = 0
        while n_done < n_samples:
            res = sampler.sample(params, eval_sample_key(self.key, epoch,
                                                         batch_idx))
            analyzer.evaluate_generated_graphs(
                res.graphs, res.properly_terminated,
                res.final_loglikelihoods, epoch_key=f"Epoch {epoch}",
                write=(batch_idx == 0), plot=(batch_idx == 0))
            all_nlls.append(res.action_nlls)
            n_done += len(res.graphs)
            batch_idx += 1
        gen_nlls = np.concatenate(all_nlls)

        max_rows = min(100000, n_samples)
        nll_valid = dataset_nlls("valid", max_rows)
        nll_train = dataset_nlls("train", max_rows)
        scores = analyzer.model_scores(nll_valid, nll_train, gen_nlls,
                                       n_samples)
        self.logger.write_validation_scores(f"Epoch {epoch}", scores)
        self.logger.append_score(scores["UC-JSD"])
        self.logger.tb_scalar("Evaluation/uc_jsd", scores["UC-JSD"], epoch)

    # ------------------------------------------------------------------
    def _load_model_for_inference(self, epoch: Optional[int] = None):
        cfg = self.cfg
        if epoch is not None:
            path = checkpoint_path(cfg.job_dir, epoch, allow_torch=True)
        else:
            found = latest_checkpoint(cfg.job_dir)
            if not found:
                raise FileNotFoundError(f"no checkpoint in {cfg.job_dir}")
            path, epoch = found
        print(f"* Loading model from {path} (epoch {epoch}).", flush=True)
        params = load_params_any(cfg, path)
        # device-resident params: load_params_any returns HOST numpy trees,
        # and passing those to a jitted sampler re-transfers the whole model
        # every call (measured: 0.5 s/batch vs 0.077 s with device params
        # through the tunnel -- 8x on the N=13 generate job)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        return params, epoch

    def _global_sample_batches(self, sampler, params, n_batches, key_for,
                               quiet: bool = False):
        """Yields ``(k, SampleResult)`` for ``n_batches`` global batches in
        order.  Single-process: a plain loop.  Multi-host: generation is
        embarrassingly parallel, so every process samples its round-robin
        share concurrently (process p takes global batch r*P+p with that
        batch's OWN key -- same molecule stream as a single-process run),
        the fixed-shape packed buffers are allgathered, and only process 0
        decodes/yields -- P hosts give ~P x device throughput with one
        writer.  The reference had one GPU (Workflow.py:389-439); round 4
        merely gated non-zero processes, sampling at 1-host speed."""
        P = jax.process_count()
        if P == 1:
            for k in range(n_batches):
                yield k, sampler.sample(params, key_for(k), quiet=quiet)
            return
        from jax.experimental import multihost_utils
        pid = jax.process_index()
        rounds = (n_batches + P - 1) // P
        for r in range(rounds):
            # tail processes past n_batches resample the last batch; their
            # buffer is discarded below (the allgather is collective, so
            # every process must contribute a buffer every round)
            g = min(r * P + pid, n_batches - 1)
            t0 = time.time()
            dev, _ = sampler.sample_async(params, key_for(g))
            packed = np.asarray(dev)                   # local fetch
            gathered = np.asarray(multihost_utils.process_allgather(packed))
            elapsed = time.time() - t0
            if pid != 0:
                continue
            n_decoded = min(P, n_batches - r * P)
            # the round produced n_decoded batches in `elapsed` seconds
            # CONCURRENTLY -- attribute an equal share to each, so summed
            # per-batch timings and the printed mol/s stay honest
            per_batch = elapsed / max(n_decoded, 1)
            for p in range(n_decoded):
                yield r * P + p, sampler._decode_packed(
                    gathered[p], per_batch, quiet)

    def generation_phase(self) -> None:
        """Generate cfg.n_samples molecules (reference: Workflow.py:389-439).

        Host chemistry (validity, canonical SMILES, logging) is overlapped
        with device sampling: batch k is analyzed in a single worker thread
        while the device rolls out batch k+1 -- the device fetch in
        sampler.sample releases the GIL, so the two genuinely run
        concurrently.  One worker keeps per-batch writes in order.  Under
        multi-host every process SAMPLES its share of the batches
        (_global_sample_batches) and process 0 alone decodes + writes."""
        cfg = self.cfg
        from concurrent.futures import ThreadPoolExecutor
        primary = jax.process_index() == 0
        if jax.process_count() > 1:
            # only process 0 needs the checkpoint file (round-4 semantics,
            # where non-zero processes exited before loading); its params
            # broadcast to the samplers on every other host
            from jax.experimental import multihost_utils
            from graphinvent_tpu.models import init_model
            if primary:
                params, epoch = self._load_model_for_inference(
                    cfg.generation_epoch)
            else:
                params = init_model(cfg, jax.random.PRNGKey(0))
                epoch = 0
            host_tree = jax.tree_util.tree_map(np.asarray, params)
            params, epoch_arr = multihost_utils.broadcast_one_to_all(
                (host_tree, np.int32(epoch)))
            epoch = int(epoch_arr)
            params = jax.tree_util.tree_map(jnp.asarray, params)
        else:
            params, epoch = self._load_model_for_inference(cfg.generation_epoch)
        batch = min(cfg.batch_size, cfg.n_samples)
        n_batches = (cfg.n_samples + batch - 1) // batch
        two_phase = (cfg.gen_two_phase_rounds > 0
                     and jax.process_count() == 1
                     and self._sampler_mesh() is None)
        if two_phase:
            from graphinvent_tpu.sampling.two_phase import TwoPhaseSampler
            sampler = TwoPhaseSampler(cfg, batch,
                                      phase1_rounds=cfg.gen_two_phase_rounds)

            def batches(sampler, params, n_batches, key_for):
                # windows of 4: stragglers compact across a window's
                # batches while the host worker analyzes finished ones
                W = 4
                for start in range(0, n_batches, W):
                    results, _ = sampler.sample_many(
                        params, key_for(start), min(W, n_batches - start),
                        quiet=False)
                    for j, res in enumerate(results):
                        yield start + j, res
        else:
            sampler = self._get_sampler(batch)
            batches = self._global_sample_batches
        analyzer = None
        if primary:
            ts_props = self._load_ts_properties()
            analyzer = Analyzer(cfg, self.logger, ts_props, self.start_time)
        pending = None
        # NOTE: dispatching batch k+1 before fetching batch k
        # (sample_async single-host) was measured SLOWER on the tunneled
        # backend -- the server serializes the fetch behind the queued next
        # program, so the transfer cannot overlap execution anyway and
        # queueing adds latency (docs/9).  The worker thread still hides
        # all host chemistry.
        with ThreadPoolExecutor(max_workers=1) as pool:
            for k, res in batches(
                    sampler, params, n_batches,
                    lambda k: jax.random.fold_in(self.key, k)):
                if pending is not None:
                    pending.result()
                pending = pool.submit(
                    analyzer.evaluate_generated_graphs,
                    res.graphs, res.properly_terminated,
                    res.final_loglikelihoods,
                    epoch_key=f"Epoch {epoch} gen{k}",
                    write=True, plot=(k == 0))
            if pending is not None:
                pending.result()

    # ------------------------------------------------------------------
    def testing_phase(self) -> None:
        cfg = self.cfg
        if jax.process_index() != 0:
            # inference jobs are single-writer: with multiple hosts every
            # process would sample + score identically and race on the same
            # job-dir files (training/preprocess gate the same way)
            return
        test_ds = HDFDataset(self.test_h5)
        train_ds = HDFDataset(self.train_h5)
        ts_props = self._load_ts_properties()
        analyzer = Analyzer(cfg, self.logger, ts_props, self.start_time)
        params, epoch = self._load_model_for_inference()
        # mesh-native test job: NLL scoring shards over the configured mesh
        # (the sampler below picks the same mesh up via _get_sampler)
        mesh = self._sampler_mesh()
        if mesh is not None:
            from graphinvent_tpu.parallel import make_sharded_nll_step
            if cfg.batch_size % mesh.shape["data"]:
                raise ValueError(
                    f"batch_size={cfg.batch_size} must divide by the data "
                    f"axis ({mesh.shape['data']}) for a sharded test job")
            nll_step, params, place_batch = make_sharded_nll_step(
                cfg, mesh, params)
        else:
            nll_step = make_likelihood_step(cfg)
            place_batch = lambda b: {k: jnp.asarray(v) for k, v in b.items()}

        batch = min(cfg.batch_size, cfg.n_samples)
        sampler = self._get_sampler(batch)
        res = sampler.sample(params, self.key)
        analyzer.evaluate_generated_graphs(
            res.graphs, res.properly_terminated, res.final_loglikelihoods,
            epoch_key=f"Test epoch {epoch}")
        max_rows = min(100000, cfg.n_samples)
        nll_rng = np.random.default_rng(cfg.seed + 1)

        def loader_nlls(ds):
            return streamed_random_nlls(
                ds, lambda b: np.asarray(nll_step(params, place_batch(b))),
                max_rows, cfg.batch_size, cfg.block_size, nll_rng)

        nll_test = loader_nlls(test_ds)
        nll_train = loader_nlls(train_ds)
        scores = analyzer.model_scores(nll_test, nll_train, res.action_nlls,
                                       cfg.n_samples)
        self.logger.write_validation_scores(f"Test {epoch}", scores)
        print("Test scores:", scores, flush=True)
