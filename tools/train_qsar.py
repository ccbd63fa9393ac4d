"""Train a QSAR activity classifier for RL scoring.

The reference ships a pre-trained sklearn SVC pickled over RDKit ECFP4
fingerprints (data/fine-tuning/qsar_model.pickle, loaded at
constants.py:250-256).  Our fingerprints hash differently, so activity
models are (re)trained here on labelled SMILES:

    python tools/train_qsar.py actives.smi inactives.smi out.pickle \
        [--classifier svc|logistic]

writes {"classifier_sv": clf} in the reference's pickle layout, consumable
by eval/scoring.py.  ``svc`` mirrors the reference's RBF SVC; its
predict_proba over thousands of support vectors is the dominant HOST cost
of an activity fine-tune step (~1-2 s per 2x500-row batch, BASELINE.md
round 4) -- ``logistic`` scores equivalently on separable fingerprint
tasks at ~1000x the inference speed (one weight vector).
"""

from __future__ import annotations

import argparse
import pickle
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from graphinvent_tpu.chem import mol_from_smiles
from graphinvent_tpu.chem.fingerprint import bulk_fingerprints
from graphinvent_tpu.data.preprocess import read_smiles_file


def main(actives_path: str, inactives_path: str, out_path: str,
         classifier: str = "svc") -> None:
    def fps(path):
        mols = []
        for smi in read_smiles_file(path):
            try:
                mols.append(mol_from_smiles(smi))
            except Exception:
                pass
        return bulk_fingerprints(mols)

    X_act = fps(actives_path)
    X_inact = fps(inactives_path)
    X = np.concatenate([X_act, X_inact])
    y = np.concatenate([np.ones(len(X_act)), np.zeros(len(X_inact))])
    if classifier == "logistic":
        from sklearn.linear_model import LogisticRegression
        clf = LogisticRegression(max_iter=2000, C=1.0)
    else:
        from sklearn.svm import SVC
        clf = SVC(probability=True, kernel="rbf", C=1.0, gamma="scale")
    clf.fit(X, y)
    with open(out_path, "wb") as fh:
        pickle.dump({"classifier_sv": clf}, fh)
    print(f"trained {classifier} on {len(X)} molecules "
          f"({len(X_act)} active), wrote {out_path}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("actives")
    ap.add_argument("inactives")
    ap.add_argument("out")
    ap.add_argument("--classifier", default="svc",
                    choices=["svc", "logistic"])
    a = ap.parse_args()
    main(a.actives, a.inactives, a.out, a.classifier)
