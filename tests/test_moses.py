"""MOSES-style metric suite (eval/moses.py).

The reference delegates benchmark scoring to the external molsets/moses
package (tutorials/5_benchmarking_with_moses.md:1-6); these tests pin the
local reimplementation's semantics on hand-checkable molecules.
"""

import numpy as np
import pytest

from graphinvent_tpu.eval.moses import (canonicalize, compute_metrics,
                                        internal_diversity, murcko_scaffold,
                                        wasserstein1)
from graphinvent_tpu.chem.smiles import mol_from_smiles


BENZENE = canonicalize("c1ccccc1")


def scaf(smiles: str) -> str:
    return murcko_scaffold(mol_from_smiles(smiles))


class TestScaffold:
    def test_toluene_scaffold_is_benzene(self):
        assert scaf("Cc1ccccc1") == BENZENE

    def test_acetophenone_side_chain_fully_stripped(self):
        # the carbonyl attaches by a SINGLE bond, so the whole acyl group
        # is side chain (RDKit GetScaffoldForMol agrees)
        assert scaf("CC(=O)c1ccccc1") == BENZENE

    def test_exocyclic_double_bond_retained(self):
        # cyclohexanone: =O sits directly on the ring and survives
        assert scaf("O=C1CCCCC1") == canonicalize("O=C1CCCCC1")

    def test_linker_retained(self):
        bibenzyl = "c1ccccc1CCc1ccccc1"
        assert scaf(bibenzyl) == canonicalize(bibenzyl)

    def test_acyclic_molecule_has_empty_scaffold(self):
        assert scaf("CCO") == ""

    def test_pyrrole_keeps_its_nh(self):
        assert scaf("Cc1cc[nH]c1") == canonicalize("c1cc[nH]c1")


class TestIntDiv:
    def test_identical_set_has_zero_diversity(self):
        fps = np.tile(np.array([[1.0, 1, 0, 0]]), (5, 1))
        assert internal_diversity(fps) == pytest.approx(0.0)

    def test_two_disjoint_fingerprints(self):
        # pairs: (a,a)=(b,b)=1, (a,b)=(b,a)=0 -> mean 0.5 (diagonal in)
        fps = np.array([[1.0, 1, 0, 0], [0, 0, 1, 1]])
        assert internal_diversity(fps, p=1) == pytest.approx(0.5)
        assert internal_diversity(fps, p=2) == pytest.approx(
            1 - np.sqrt(0.5))

    def test_blocking_does_not_change_result(self):
        rng = np.random.default_rng(0)
        fps = (rng.random((7, 16)) < 0.3).astype(float)
        a = internal_diversity(fps, block=2)
        b = internal_diversity(fps, block=100)
        assert a == pytest.approx(b, abs=1e-6)


class TestW1:
    def test_identical_samples(self):
        a = np.arange(100.0)
        assert wasserstein1(a, a) == pytest.approx(0.0)

    def test_constant_shift(self):
        a = np.arange(100.0)
        assert wasserstein1(a, a + 3.0) == pytest.approx(3.0, abs=1e-6)


class TestSuite:
    def test_end_to_end_counts(self):
        gen = ["CCO", "CCO", "c1ccccc1", "CCN", "[Xx]", "not_a_smiles"]
        train = ["CCO", "CCC"]
        m = compute_metrics(gen, train, n_intdiv=10, n_props=10)
        assert m["n_generated"] == 6
        assert m["validity"] == pytest.approx(4 / 6)
        # valid canon: CCO, CCO, benzene, CCN -> 3 unique, CCO in train
        assert m["uniqueness"] == pytest.approx(3 / 4)
        assert m["novelty"] == pytest.approx(2 / 3)
        assert 0.0 <= m["int_div_1"] <= 1.0
        assert np.isfinite(m["w1_mw"])

    def test_memorized_generator_scores_zero_novelty(self):
        train = ["CCO", "CCC", "CCN"]
        m = compute_metrics(list(train), train, n_intdiv=10, n_props=10)
        assert m["novelty"] == 0.0
        assert m["validity"] == 1.0

    def test_scaffold_novelty_vs_train(self):
        # generated shares ethanol (acyclic, scaffold "") with train but
        # adds a pyridine the train set has never seen
        gen = ["CCO", "Cc1ccncc1"]
        train = ["CCO", "Cc1ccccc1"]
        m = compute_metrics(gen, train, n_intdiv=10, n_props=10)
        assert m["scaffold_novelty"] == pytest.approx(1 / 2)
