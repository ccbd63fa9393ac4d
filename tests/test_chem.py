import numpy as np
import pytest

from graphinvent_tpu.chem import (
    Molecule, SanitizeError, mol_from_smiles, mol_to_smiles,
)
from graphinvent_tpu.chem.molecule import Atom
from graphinvent_tpu.chem.molgraph import (
    decoding_route, decoding_route_length, graph_to_mol, ordered_graph,
)
from graphinvent_tpu.config import preset


AROMATICS = ["c1ccccc1", "c1ccncc1", "c1cc[nH]c1", "c1ccoc1", "c1ccsc1",
             "c1ccc2ccccc2c1", "c1ccc2[nH]ccc2c1", "Cc1ncccc1"]


@pytest.mark.parametrize("smi", AROMATICS)
def test_kekulize_and_roundtrip(smi):
    m = mol_from_smiles(smi)
    # post-parse: no aromatic bond-type indices remain
    assert all(t in (0, 1, 2) for t in m.bonds.values())
    out = mol_to_smiles(m)
    assert out is not None
    # canonical form is a fixed point
    assert mol_to_smiles(mol_from_smiles(out)) == out


def test_kekule_forms_canonicalize_identically():
    forms = ["C1=CC=CC=C1", "c1ccccc1"]
    outs = {mol_to_smiles(mol_from_smiles(s)) for s in forms}
    assert len(outs) == 1


def test_canonical_invariant_to_input_ordering():
    a = mol_to_smiles(mol_from_smiles("CC(N)C(=O)O"))
    b = mol_to_smiles(mol_from_smiles("OC(=O)C(C)N"))
    c = mol_to_smiles(mol_from_smiles("NC(C)C(O)=O"))
    assert a == b == c


def test_implicit_h_valence_model():
    m = mol_from_smiles("CC(=O)N")
    hs = [m.implicit_h(i) for i in range(m.n_atoms)]
    assert hs == [3, 0, 0, 2]          # CH3, C, O, NH2


def test_charged_atoms():
    m = mol_from_smiles("C[N+](C)(C)C")
    assert m.atoms[1].charge == 1
    assert m.implicit_h(1) == 0
    m2 = mol_from_smiles("CC([O-])=O")
    assert m2.implicit_h(2) == 0


def test_valence_check_rejects_overbonded():
    m = Molecule()
    c = m.add_atom(Atom("C"))
    for _ in range(3):
        o = m.add_atom(Atom("O"))
        m.add_bond(c, o, 1)            # three C=O on one carbon: valence 6
    with pytest.raises(SanitizeError):
        m.sanitize()


def test_decoding_route_structure():
    cfg = preset("GGNN")
    m = mol_from_smiles("CC1CC1O")     # has a ring -> a connect action
    route = list(decoding_route(m, cfg))
    assert len(route) == decoding_route_length(m) == len(m.bonds) + 2
    nodes0, edges0, apd0 = route[0]
    assert apd0[-1] == 1               # full graph paired with terminate APD
    for nodes, edges, apd in route:
        assert apd.sum() == 1          # every APD is one-hot
        assert apd.shape == (cfg.dim_apd,)
        assert nodes.shape == (13, 8)
        assert edges.shape == (13, 13, 3)
    # last state is the empty graph
    n_last, e_last, _ = route[-1]
    assert n_last.sum() == 0 and e_last.sum() == 0
    # second-to-last APD encodes "add the first atom bonded to node 0 type 0"
    _, _, apd_first_add = route[-1]
    f_add = apd_first_add[:cfg.len_f_add].reshape(cfg.dim_f_add)
    assert f_add[0].sum() == 1


def test_graph_roundtrip_preserves_molecule():
    cfg = preset("GGNN")
    for smi in ["CC1C2N1CC1=C2CC=C1", "OC1=CC=CC1", "CSC", "ClCC#N"]:
        m = mol_from_smiles(smi)
        nodes, edges, n = ordered_graph(m, cfg)
        m2 = graph_to_mol(nodes, edges, n, cfg)
        assert mol_to_smiles(m2) == mol_to_smiles(m)


def test_route_replay_reconstructs_molecule():
    """Applying the route's APDs forward from empty must rebuild the graph."""
    cfg = preset("GGNN")
    m = mol_from_smiles("CC1CC1O")
    route = list(decoding_route(m, cfg))
    # walk backwards: empty -> ... -> full; each APD is the action taking
    # state k to state k-1
    states = [r[:2] for r in route]
    apds = [r[2] for r in route]
    for k in range(len(route) - 1, 0, -1):
        nodes_k, edges_k = states[k]
        apd = apds[k]
        idx = int(np.argmax(apd))
        assert idx < cfg.dim_apd - 1   # never terminate mid-route
    assert apds[0][-1] == 1


def test_disconnected_smiles_parses():
    m = mol_from_smiles("CC.O")
    assert m.n_atoms == 3
    assert len(m.connected_components()) == 2


def test_invalid_smiles_raises():
    from graphinvent_tpu.chem import SmilesError
    for bad in ["C(", "C1CC", "X", "C%1"]:
        with pytest.raises((SmilesError, Exception)):
            mol_from_smiles(bad)
