"""Model/sample-set evaluation: UC-JSD, validity/uniqueness, property plots.

Rebuilds Analyzer (Analyzer.py:20-896).  The UC-JSD follows the metric's
definition (Arús-Pous et al. 2019): all three NLL distributions are
per-action negative log likelihoods.  (The reference feeds raw
probabilities for the generated set while using NLLs for train/valid,
Analyzer.py:110-130 -- treated as a latent bug and not replicated.)
"""

from __future__ import annotations

import os
import time
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from graphinvent_tpu.config import GraphInventConfig
from graphinvent_tpu.eval.properties import graph_set_properties
from graphinvent_tpu.utils.logging import JobLogger


def uc_jsd(nll_valid: np.ndarray, nll_train: np.ndarray,
           nll_sampled: np.ndarray, seed: int = 0) -> float:
    """Uniformity-completeness Jensen-Shannon divergence over the three
    per-action NLL distributions (reference: Analyzer.py:50-94).

    Sets larger than the smallest are subsampled *uniformly at random*
    (fixed seed: deterministic) rather than truncated -- NLLs arrive in
    loader order, so a head-truncation is an order-biased subsample."""
    min_len = min(len(nll_valid), len(nll_train), len(nll_sampled))
    if min_len == 0:
        return float("nan")
    rng = np.random.default_rng(seed)

    def _norm(x):
        x = np.asarray(x, dtype=np.float64)
        if len(x) > min_len:
            x = x[rng.choice(len(x), min_len, replace=False)]
        s = x.sum()
        return x / s if s else np.full(min_len, 1.0 / min_len)

    v, t, s = _norm(nll_valid), _norm(nll_train), _norm(nll_sampled)
    m = (v + t + s) / 3.0

    def _kl(p, q):
        mask = p > 0
        return float(np.sum(p[mask] * np.log(p[mask] / np.maximum(q[mask], 1e-300))))

    return (_kl(v, m) + _kl(t, m) + _kl(s, m)) / 3.0


class Analyzer:
    """Evaluates generated graph sets and computes model scores."""

    def __init__(self, cfg: GraphInventConfig,
                 logger: Optional[JobLogger] = None,
                 ts_properties: Optional[Dict] = None,
                 start_time: Optional[float] = None) -> None:
        self.cfg = cfg
        self.logger = logger or JobLogger(cfg.job_dir, cfg.tensorboard_dir)
        self.ts_properties = ts_properties or {}
        self.start_time = start_time or time.time()

    # ------------------------------------------------------------------
    def evaluate_generated_graphs(self, graphs: Sequence, termination: np.ndarray,
                                  loglikelihoods: np.ndarray, epoch_key: str,
                                  write: bool = True, label: str = "",
                                  plot: bool = True
                                  ) -> Tuple[np.ndarray, np.ndarray, Dict]:
        """Computes validity/uniqueness + property histograms for a batch of
        MolGraphs, writes generation.log + SMILES sidecars + plots
        (reference: Analyzer.py:141-207).

        Returns (validity (B,), uniqueness (B,), prop_dict).  Uniqueness
        marks the first occurrence of each canonical SMILES with 1
        (reference: util.write_molecules semantics used by the RL loss)."""
        B = len(graphs)
        nodes = np.stack([np.asarray(g.node_features, np.float32) for g in graphs])
        edges = np.stack([np.asarray(g.edge_features, np.float32) for g in graphs])
        n_nodes = np.asarray([g.n_nodes for g in graphs])

        # validity + canonical SMILES: one native C++ batch call when the
        # kernel is available (byte-identical to the per-graph Python path;
        # the host chemistry here was ~97% of generate-job wall clock)
        from graphinvent_tpu.chem.native import native_decode_batch
        nat = native_decode_batch(nodes.astype(np.int8), edges.astype(np.int8),
                                  n_nodes, self.cfg)
        if nat is not None:
            validity, smiles = nat
            smiles = [s if validity[i] else None
                      for i, s in enumerate(smiles)]
        else:
            smiles = []
            validity = np.zeros(B, dtype=np.int8)
            for i, g in enumerate(graphs):
                ok = g.is_valid()
                validity[i] = int(ok)
                smiles.append(g.get_smiles() if ok else None)
        seen = set()
        uniqueness = np.zeros(B, dtype=np.int8)
        for i, s in enumerate(smiles):
            if s is None:
                uniqueness[i] = 1 if validity[i] else 0
                continue
            if s not in seen:
                seen.add(s)
                uniqueness[i] = 1

        prop_dict = graph_set_properties(self.cfg, nodes, edges, n_nodes,
                                         epoch_key=epoch_key, smiles=smiles,
                                         validity=validity)

        termination = np.asarray(termination)
        n_valid_pt = int(np.sum(validity * termination))
        frac_pt = float(termination.mean()) if B else 0.0
        prop_dict[(epoch_key, "fraction_valid_properly_terminated")] = (
            round(n_valid_pt / max(int(termination.sum()), 1), 3))
        prop_dict[(epoch_key, "fraction_properly_terminated")] = round(frac_pt, 3)
        prop_dict[(epoch_key, "final_likelihood")] = round(
            float(np.mean(loglikelihoods)), 4)
        prop_dict[(epoch_key, "run_time")] = round(time.time() - self.start_time, 2)

        if write:
            self.logger.properties_to_csv(prop_dict, epoch_key)
            # file stem mirrors the reference's generation/epoch_{N}.smi
            # (util.py:680-685): "Epoch 2" -> epoch_2.smi, not
            # epoch_Epoch_2.smi
            stem = epoch_key.replace("Epoch ", "").replace(" ", "_")
            self.logger.write_molecules(
                stem, smiles, loglikelihoods, validity, label=label)
            if plot:
                try:
                    self.plot_molecular_properties(
                        {**prop_dict, **self.ts_properties},
                        os.path.join(self.cfg.job_dir, "generation",
                                     f"features_{epoch_key.replace(' ', '_')}.png"))
                except Exception:
                    pass
        return validity, uniqueness, prop_dict

    # ------------------------------------------------------------------
    def model_scores(self, nll_valid: np.ndarray, nll_train: np.ndarray,
                     nll_gen: np.ndarray, n_samples: int) -> Dict:
        """NLL statistics + UC-JSD (reference: Analyzer.evaluate_model,
        Analyzer.py:39-139)."""
        scores = {
            "avg_nll_valid": float(np.sum(nll_valid) / max(n_samples, 1)),
            "avg_nll_train": float(np.sum(nll_train) / max(n_samples, 1)),
            "avg_nll_gen": float(np.sum(nll_gen) / max(n_samples, 1)),
            "UC-JSD": uc_jsd(nll_valid, nll_train, nll_gen),
        }
        return scores

    # ------------------------------------------------------------------
    def plot_molecular_properties(self, properties: Dict,
                                  plot_filename: str) -> None:
        """3x3 grid of property histograms, training set vs epoch
        (reference: Analyzer.py:781-875)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        cfg = self.cfg
        fig, ax = plt.subplots(3, 3, figsize=(8.0, 7.0), sharey="all")
        fig.subplots_adjust(hspace=0.6, wspace=0.4)
        panels = {
            "n_nodes_hist": (ax[0, 0], "Num nodes per graph"),
            "atom_type_hist": (ax[0, 1], f"Atom type ({', '.join(cfg.atom_types)})"),
            "formal_charge_hist": (ax[0, 2],
                                   f"Formal charge ({cfg.formal_charge})"),
            "numh_hist": (ax[1, 0], f"Num implicit Hs ({cfg.imp_H})"),
            "n_edges_hist": (ax[1, 1], "Num edges per node"),
            "edge_feature_hist": (ax[1, 2],
                                  f"Bond type ({', '.join(cfg.bond_types)})"),
            "chirality_hist": (ax[2, 0], f"Chirality ({cfg.chirality})"),
        }
        epoch_keys = sorted({k[0] for k in properties})
        for epoch_key in epoch_keys:
            style = dict(marker="*", color="goldenrod", linestyle="-") \
                if epoch_key == "Training set" else \
                dict(marker="o", color="cadetblue", linestyle="--")
            for name, (axis, xlabel) in panels.items():
                hist = properties.get((epoch_key, name))
                if hist is None:
                    continue
                hist = np.asarray(hist, dtype=float)
                if hist.size == 0:
                    continue
                total = hist.sum()
                norm = hist / total if total else hist
                axis.plot(range(1, len(norm) + 1), norm, label=epoch_key, **style)
                axis.set(xlabel=xlabel)
        ax[2, 0].legend(loc="upper right", prop={"size": 6})
        for k in range(1, 3):
            ax[2, k].axis("off")
        fig.savefig(plot_filename)
        plt.close(fig)
