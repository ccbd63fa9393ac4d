"""Self-contained chemistry kernel (no RDKit dependency).

Provides the subset of cheminformatics the framework needs: SMILES
parsing/writing, kekulization, aromaticity perception, a valence model with
implicit-H assignment, valence-based sanitization, canonical atom ranking,
Morgan fingerprints, and molecular-graph featurization with decoding-route /
APD-target construction (the reference delegates all of this to RDKit +
graphinvent/MolecularGraph.py).
"""

from graphinvent_tpu.chem.molecule import Atom, Molecule, SanitizeError
from graphinvent_tpu.chem.smiles import mol_from_smiles, mol_to_smiles, SmilesError
from graphinvent_tpu.chem.canon import canonical_ranks
from graphinvent_tpu.chem.molgraph import (
    MolGraph,
    mol_to_graph,
    graph_to_mol,
    decoding_route,
)

__all__ = [
    "Atom", "Molecule", "SanitizeError", "SmilesError",
    "mol_from_smiles", "mol_to_smiles", "canonical_ranks",
    "MolGraph", "mol_to_graph", "graph_to_mol", "decoding_route",
]
