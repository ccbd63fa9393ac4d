"""CLI entry point: ``python -m graphinvent_tpu.main --job-dir <dir>``.

Mirrors the reference's single-flag interface (graphinvent/main.py:23-72 +
parameters/args.py:9-18): the job directory may contain an ``input.csv``
overriding any config field, including ``job_type`` which selects one of
preprocess / train / generate / test / fine-tune.
"""

from __future__ import annotations

import argparse

from graphinvent_tpu.config import GraphInventConfig
from graphinvent_tpu.workflow import Workflow


def main() -> None:
    parser = argparse.ArgumentParser(description="graphinvent-tpu")
    parser.add_argument("--job-dir", default="./output/",
                        help="Job directory (may contain input.csv).")
    parser.add_argument("--job-type", default=None,
                        help="Override job_type from input.csv.")
    parser.add_argument("--dataset-dir", default=None)
    parser.add_argument("--model", default=None)
    args = parser.parse_args()

    cfg = GraphInventConfig.from_job_dir(args.job_dir)
    overrides = {}
    if args.job_type:
        overrides["job_type"] = args.job_type
    if args.dataset_dir:
        overrides["dataset_dir"] = args.dataset_dir
    if args.model:
        overrides = dict(overrides, model=args.model)
    if overrides:
        cfg = cfg.replace(**overrides)

    # persistent XLA compile cache: repeat runs of a configuration skip the
    # multi-minute large-graph compiles (utils/compile_cache.py)
    from graphinvent_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    # multi-host wiring must happen before any jax backend use (no-op for
    # single-process jobs; parallel/multihost.py)
    from graphinvent_tpu.parallel.multihost import init_distributed
    if init_distributed(cfg):
        import jax
        print(f"* Multi-host: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices", flush=True)

    print(f"* Running {cfg.job_type} job ({cfg.model}) in {cfg.job_dir}",
          flush=True)
    Workflow(cfg).run()


if __name__ == "__main__":
    main()
