"""Job-directory log files.

Reproduces the reference's observability surface (util.py):
  * ``convergence.log``  -- epoch, lr, train/valid loss, model score
    (util.py:587-645)
  * ``validation.log``   -- NLL statistics + UC-JSD per evaluation epoch
    (util.py:744-786)
  * ``generation.log``   -- property CSV per sampling epoch (util.py:282-346)
  * per-epoch SMILES + ``.likelihood`` / ``.valid`` sidecars under
    ``generation/`` (util.py:647-713)
  * ``fine-tuning.log``  -- RL step scores (Analyzer.py:877-896)

TensorBoard scalars are written when ``tensorboard`` is importable.
"""

from __future__ import annotations

import csv
import os
import re
from typing import Dict, Iterable, Optional, Sequence

import numpy as np


class JobLogger:
    def __init__(self, job_dir: str, tensorboard_dir: Optional[str] = None) -> None:
        self.job_dir = job_dir
        os.makedirs(job_dir, exist_ok=True)
        os.makedirs(os.path.join(job_dir, "generation"), exist_ok=True)
        self._tb = None
        if tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=tensorboard_dir, flush_secs=10)
            except Exception:
                self._tb = None

    # ------------------------------------------------------------------
    def tb_scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    # ------------------------------------------------------------------
    # convergence.log
    # ------------------------------------------------------------------
    def init_convergence(self, append: bool = False) -> None:
        path = os.path.join(self.job_dir, "convergence.log")
        if not append or not os.path.exists(path):
            with open(path, "w") as fh:
                fh.write("epoch, lr, avg_train_loss, avg_valid_loss, model_score\n")

    def write_training_status(self, epoch: int, lr: float,
                              training_loss: float, validation_loss: float,
                              score: object = "NA") -> None:
        path = os.path.join(self.job_dir, "convergence.log")
        if not os.path.exists(path):
            self.init_convergence()
        if isinstance(score, float):
            score = f"{score:.8f}"
        with open(path, "a") as fh:
            fh.write(f"{epoch}, {lr:.8f}, {training_loss:.8f}, "
                     f"{validation_loss:.8f}, {score}\n")
        self.tb_scalar("Training/train_loss", training_loss, epoch)
        self.tb_scalar("Training/valid_loss", validation_loss, epoch)
        self.tb_scalar("Training/lr", lr, epoch)

    def append_score(self, score: float) -> None:
        """Rewrites the last convergence line's score column (the reference
        writes the UC-JSD after the loss line, util.py:617-630)."""
        path = os.path.join(self.job_dir, "convergence.log")
        try:
            with open(path) as fh:
                lines = fh.readlines()
            if lines and lines[-1].strip().endswith("NA"):
                lines[-1] = lines[-1].replace("NA", f"{score:.8f}")
                with open(path, "w") as fh:
                    fh.writelines(lines)
        except FileNotFoundError:
            pass

    def last_epoch(self) -> int:
        """Restart-epoch discovery from convergence.log (replaces the
        reference's generation.log parsing, util.py:165-193)."""
        path = os.path.join(self.job_dir, "convergence.log")
        last = 0
        try:
            with open(path) as fh:
                for line in fh:
                    m = re.match(r"\s*(\d+),", line)
                    if m:
                        last = int(m.group(1))
        except FileNotFoundError:
            pass
        return last

    # ------------------------------------------------------------------
    # validation.log
    # ------------------------------------------------------------------
    def write_validation_scores(self, epoch_key: str, model_scores: Dict,
                                append: bool = True) -> None:
        path = os.path.join(self.job_dir, "validation.log")
        write_header = not append or not os.path.exists(path)
        with open(path, "a" if append and not write_header else "w") as fh:
            if write_header:
                fh.write("set, avg_nll_per_molecule_valid, avg_nll_train, "
                         "avg_nll_gen, uc_jsd\n")
            fh.write(f"{epoch_key}, "
                     f"{model_scores.get('avg_nll_valid', float('nan')):.6f}, "
                     f"{model_scores.get('avg_nll_train', float('nan')):.6f}, "
                     f"{model_scores.get('avg_nll_gen', float('nan')):.6f}, "
                     f"{model_scores.get('UC-JSD', float('nan')):.6f}\n")

    # ------------------------------------------------------------------
    # generation.log + property rows
    # ------------------------------------------------------------------
    def properties_to_csv(self, prop_dict: Dict, epoch_key: str,
                          append: bool = True) -> None:
        path = os.path.join(self.job_dir, "generation.log")
        with open(path, "a" if append else "w", newline="") as fh:
            w = csv.writer(fh, delimiter=";")
            for key, value in prop_dict.items():
                if isinstance(value, np.ndarray):
                    value = [round(float(v), 3) for v in value]
                elif isinstance(value, float):
                    value = round(value, 6)
                w.writerow([key, value])

    # ------------------------------------------------------------------
    # per-epoch molecule files
    # ------------------------------------------------------------------
    def write_molecules(self, epoch_label: str,
                        smiles: Sequence[Optional[str]],
                        final_loglikelihoods: Sequence[float],
                        validity: Sequence[int], label: str = "") -> None:
        base = os.path.join(self.job_dir, "generation",
                            f"epoch{'_' + label if label else ''}_{epoch_label}")
        with open(base + ".smi", "w") as fh:
            fh.write("SMILES\n")
            for s in smiles:
                fh.write((s if s else "[Xx]") + "\n")
        np.savetxt(base + ".likelihood", np.asarray(final_loglikelihoods),
                   fmt="%.6f")
        np.savetxt(base + ".valid", np.asarray(validity, dtype=int), fmt="%d")

    # ------------------------------------------------------------------
    # fine-tuning.log
    # ------------------------------------------------------------------
    def save_rl_metrics(self, step: int, score: float, append: bool = True) -> None:
        path = os.path.join(self.job_dir, "fine-tuning.log")
        mode = "a" if append and os.path.exists(path) else "w"
        with open(path, mode) as fh:
            if mode == "w":
                fh.write("Step, Score\n")
            fh.write(f"Step {step}, {score:.8f}\n")
        self.tb_scalar("Evaluation/score", score, step)
