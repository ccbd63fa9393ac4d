"""Subprocess body for tests/test_multihost.py: one simulated host.

Runs the REAL training workflow (per-host BlockLoader shard -> global batch
assembly -> sharded train step) as one of N coordinated processes on CPU.
Launched by the parent test with a clean environment (no axon sitecustomize,
JAX_PLATFORMS=cpu, one virtual device per process).

argv: pid nproc port data_dir job_dir epochs [job_type [n_samples]]
"""

import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    data_dir, job_dir, epochs = sys.argv[4], sys.argv[5], int(sys.argv[6])
    job_type = sys.argv[7] if len(sys.argv) > 7 else "train"
    n_samples = int(sys.argv[8]) if len(sys.argv) > 8 else 8

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")

    from graphinvent_tpu.config import test_config as tiny_config
    from graphinvent_tpu.parallel.multihost import init_distributed
    from graphinvent_tpu.workflow import Workflow

    cfg = tiny_config(
        "GGNN", job_type=job_type, dataset_dir=data_dir, job_dir=job_dir,
        batch_size=8, block_size=16, epochs=epochs, sample_every=100,
        n_samples=n_samples,
        dp_devices=nproc if job_type == "train" else 0,
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc, process_id=pid)
    assert init_distributed(cfg), "distributed init did not trigger"
    assert jax.process_count() == nproc, jax.process_count()
    print(f"[host {pid}] {jax.local_device_count()} local / "
          f"{jax.device_count()} global devices", flush=True)
    Workflow(cfg).run()
    print(f"[host {pid}] done", flush=True)


if __name__ == "__main__":
    main()
