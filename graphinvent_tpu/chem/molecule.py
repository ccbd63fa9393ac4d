"""Molecule representation + valence model.

A small, dependency-free stand-in for the RDKit Mol object covering the
chemistry the GraphINVENT family needs (reference usage:
graphinvent/MolecularGraph.py:94-255 and Analyzer validity checks at
Analyzer.py:501-544).  Organic subset + charges in {-2..+2}; bond orders
single/double/triple/aromatic.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

# bond type index -> integer bond order used in valence accounting.
BOND_ORDER = {0: 1, 1: 2, 2: 3, 3: 1}      # aromatic handled separately (1.5)

ATOMIC_NUM = {
    "H": 1, "B": 5, "C": 6, "N": 7, "O": 8, "F": 9, "Si": 14, "P": 15,
    "S": 16, "Cl": 17, "Br": 35, "I": 53, "Se": 34,
}
ATOMIC_MASS = {
    "H": 1.008, "B": 10.81, "C": 12.011, "N": 14.007, "O": 15.999,
    "F": 18.998, "Si": 28.085, "P": 30.974, "S": 32.06, "Cl": 35.45,
    "Br": 79.904, "I": 126.904, "Se": 78.971,
}

# Allowed total valences for the neutral element (smallest first), mirroring
# RDKit's default valence list for the organic subset.
DEFAULT_VALENCES: Dict[str, Tuple[int, ...]] = {
    "H": (1,), "B": (3,), "C": (4,), "N": (3,), "O": (2,), "F": (1,),
    "Si": (4,), "P": (3, 5), "S": (2, 4, 6), "Cl": (1,), "Br": (1,), "I": (1,),
    "Se": (2, 4, 6),
}

# Elements whose allowed valence shifts by +charge (N+ -> 4, O- -> 1, ...).
_CHARGE_ADDS_VALENCE = {"N", "O", "P", "S", "F", "Cl", "Br", "I", "Se", "H"}


class SanitizeError(ValueError):
    """Raised when a molecule fails the valence model."""


def allowed_valences(element: str, charge: int) -> Tuple[int, ...]:
    base = DEFAULT_VALENCES.get(element)
    if base is None:
        return ()
    if charge == 0:
        return base
    if element in _CHARGE_ADDS_VALENCE:
        shifted = tuple(v + charge for v in base if v + charge >= 0)
        return shifted or ()
    # C/B/Si: both cation and anion lose one bonding slot (carbanion CH3-,
    # carbocation CH3+ are both trivalent).
    shifted = tuple(v - abs(charge) for v in base if v - abs(charge) >= 0)
    return shifted or ()


@dataclass
class Atom:
    element: str
    charge: int = 0
    # explicit implicit-H override (None => derive from the valence model)
    n_implicit_h: Optional[int] = None
    chirality: str = "None"            # "None" | "R" | "S"
    aromatic: bool = False
    isotope: int = 0


class Molecule:
    """Editable molecular graph: atoms + bonds with integer type indices.

    Bond type indices follow config.BOND_TYPES: 0=single, 1=double, 2=triple,
    3=aromatic (only when aromatic bonds are enabled / pre-kekulization).
    """

    def __init__(self) -> None:
        self.atoms: List[Atom] = []
        self._bonds: Dict[Tuple[int, int], int] = {}

    # ------------------------------------------------------------------
    def add_atom(self, atom: Atom) -> int:
        self.atoms.append(atom)
        return len(self.atoms) - 1

    def add_bond(self, i: int, j: int, bond_type: int) -> None:
        if i == j:
            raise ValueError("self-bond")
        key = (i, j) if i < j else (j, i)
        if key in self._bonds:
            raise ValueError(f"duplicate bond {key}")
        self._bonds[key] = bond_type

    def set_bond_type(self, i: int, j: int, bond_type: int) -> None:
        key = (i, j) if i < j else (j, i)
        if key not in self._bonds:
            raise KeyError(key)
        self._bonds[key] = bond_type

    def bond_type(self, i: int, j: int) -> Optional[int]:
        return self._bonds.get((i, j) if i < j else (j, i))

    @property
    def n_atoms(self) -> int:
        return len(self.atoms)

    @property
    def bonds(self) -> Dict[Tuple[int, int], int]:
        return self._bonds

    def neighbors(self, i: int) -> List[int]:
        out = []
        for (a, b) in self._bonds:
            if a == i:
                out.append(b)
            elif b == i:
                out.append(a)
        return out

    def degree(self, i: int) -> int:
        return len(self.neighbors(i))

    # ------------------------------------------------------------------
    def explicit_valence(self, i: int) -> float:
        """Sum of bond orders on atom i.  Aromatic bonds use the standard
        toolkit rule: each ring bond counts 1, plus one pi contribution if
        the atom donates a pi electron to the ring (``needs_pi_bond``) --
        benzene C = 2+1 = 3, a ring-fusion carbon (naphthalene) = 3+1 = 4,
        but pyrrole [nH] / furan O donate a LONE PAIR, not a pi electron,
        so they get just n_arom (pyrrole N: 2+1H = 3, valid).  A flat 1.5
        per bond would over-count fused systems (3 x 1.5 = 4.5 > carbon's
        maximum); a flat n_arom+1 would over-count lone-pair donors."""
        total = 0.0
        n_arom = 0
        for (a, b), t in self._bonds.items():
            if a == i or b == i:
                if t == 3 and (self.atoms[a].aromatic
                               and self.atoms[b].aromatic):
                    n_arom += 1
                else:
                    total += BOND_ORDER[t]
        if n_arom:
            total += n_arom + (1 if needs_pi_bond(self, i) else 0)
        return total

    def implicit_h(self, i: int) -> int:
        """Implicit hydrogens from the valence model (RDKit-like: smallest
        allowed valence >= explicit valence; 0 if none fits)."""
        atom = self.atoms[i]
        if atom.n_implicit_h is not None:
            return atom.n_implicit_h
        ev = self.explicit_valence(i)
        import math
        ev_ceil = int(math.ceil(ev))
        for v in allowed_valences(atom.element, atom.charge):
            if v >= ev_ceil:
                return v - ev_ceil
        return 0

    def total_h(self, i: int) -> int:
        return self.implicit_h(i)

    # ------------------------------------------------------------------
    def sanitize(self) -> None:
        """Valence check: every atom's explicit valence must fit an allowed
        valence of (element, charge).  Mirrors the role of
        rdkit.Chem.SanitizeMol in Analyzer.py:526-531 (validity test)."""
        for i, atom in enumerate(self.atoms):
            vals = allowed_valences(atom.element, atom.charge)
            if not vals:
                raise SanitizeError(
                    f"atom {i} ({atom.element}{atom.charge:+d}) has no allowed valence")
            ev = self.explicit_valence(i)
            if ev > max(vals):
                raise SanitizeError(
                    f"atom {i} ({atom.element}{atom.charge:+d}) explicit valence "
                    f"{ev} exceeds maximum {max(vals)}")
            if atom.n_implicit_h is not None:
                tot = ev + atom.n_implicit_h
                if tot > max(vals):
                    raise SanitizeError(
                        f"atom {i} total valence {tot} exceeds maximum {max(vals)}")
        # aromatic systems must admit a kekule structure: RDKit's sanitize
        # rejects un-kekulizable aromatic mols, and generated graphs in
        # use_aromatic_bonds mode can place aromatic bonds freely (round-5
        # 100k campaign: 8.8% of a generated batch was valence-valid but
        # non-kekulizable, silently inflating fraction_valid vs the
        # reference's RDKit-based count).  Checked on a copy; mirrored in
        # csrc/molkit.cc decode_row/parse_smiles.
        if any(t == 3 for t in self._bonds.values()):
            from graphinvent_tpu.chem.smiles import kekulize
            kekulize(self.copy())      # raises SanitizeError on failure

    def is_valid(self) -> bool:
        try:
            self.sanitize()
        except SanitizeError:
            return False
        return self.n_atoms > 0

    # ------------------------------------------------------------------
    def connected_components(self) -> List[List[int]]:
        seen = [False] * self.n_atoms
        comps = []
        for start in range(self.n_atoms):
            if seen[start]:
                continue
            stack, comp = [start], []
            seen[start] = True
            while stack:
                u = stack.pop()
                comp.append(u)
                for v in self.neighbors(u):
                    if not seen[v]:
                        seen[v] = True
                        stack.append(v)
            comps.append(sorted(comp))
        return comps

    def is_connected(self) -> bool:
        return self.n_atoms > 0 and len(self.connected_components()) == 1

    # ------------------------------------------------------------------
    def rings(self) -> List[List[int]]:
        """Smallest set of smallest rings (simple Horton-style algorithm,
        adequate for molecules of <= ~80 atoms)."""
        n = self.n_atoms
        adj = [self.neighbors(i) for i in range(n)]
        n_bonds = len(self._bonds)
        comps = self.connected_components()
        n_rings_expected = n_bonds - n + len(comps)
        if n_rings_expected <= 0:
            return []
        # candidate rings: shortest cycle through each edge
        candidates: List[List[int]] = []
        seen_rings = set()
        for (a, b) in self._bonds:
            ring = self._shortest_cycle_through(a, b, adj)
            if ring is not None:
                key = frozenset(ring)
                if key not in seen_rings:
                    seen_rings.add(key)
                    candidates.append(ring)
        candidates.sort(key=len)
        # greedy pick of a ring basis: GF(2) Gaussian elimination over
        # bitmask vectors indexed by bond id
        bond_ids = {key: idx for idx, key in enumerate(sorted(self._bonds))}
        picked: List[List[int]] = []
        pivots: Dict[int, int] = {}    # pivot bit -> reduced vector
        for ring in candidates:
            vec = 0
            for k in range(len(ring)):
                a2, b2 = ring[k], ring[(k + 1) % len(ring)]
                key = (a2, b2) if a2 < b2 else (b2, a2)
                vec |= 1 << bond_ids[key]
            cur = vec
            while cur:
                low = cur & -cur
                if low in pivots:
                    cur ^= pivots[low]
                else:
                    break
            if cur:
                picked.append(ring)
                pivots[cur & -cur] = cur
            if len(picked) == n_rings_expected:
                break
        return picked

    def _shortest_cycle_through(self, a: int, b: int,
                                adj: Sequence[Sequence[int]]) -> Optional[List[int]]:
        """BFS from a to b avoiding the (a,b) edge; returns the cycle atoms."""
        from collections import deque
        prev = {a: -1}
        dq = deque([a])
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if u == a and v == b:
                    continue
                if v not in prev:
                    prev[v] = u
                    if v == b:
                        path = [v]
                        while path[-1] != a:
                            path.append(prev[path[-1]])
                        return path
                    dq.append(v)
        return None

    # ------------------------------------------------------------------
    def molecular_weight(self) -> float:
        total = 0.0
        for i, atom in enumerate(self.atoms):
            total += ATOMIC_MASS.get(atom.element, 0.0)
            total += ATOMIC_MASS["H"] * self.implicit_h(i)
        return total

    def copy(self) -> "Molecule":
        out = Molecule()
        out.atoms = [Atom(a.element, a.charge, a.n_implicit_h, a.chirality,
                          a.aromatic, a.isotope) for a in self.atoms]
        out._bonds = dict(self._bonds)
        return out


def needs_pi_bond(mol: Molecule, i: int) -> bool:
    """True if aromatic atom i donates a pi electron to its ring (i.e. must
    receive one double bond when kekulizing); lone-pair donors (pyrrole
    [nH], furan O, thiophene S) return False.  Shared by the kekulizer
    (chem/smiles.py) and the aromatic valence model (explicit_valence)."""
    atom = mol.atoms[i]
    # exocyclic or in-ring explicit double/triple bond already present?
    for j in mol.neighbors(i):
        t = mol.bond_type(i, j)
        if t in (1, 2):
            return False
    # count explicit connections (aromatic + single bonds) + declared Hs
    degree = mol.degree(i)
    n_h = atom.n_implicit_h or 0
    sigma = degree + n_h
    el, q = atom.element, atom.charge
    if el == "C":
        # c with 3 ring/substituent connections and no charge needs a double
        # bond; carbanion/carbocation in ring do not.
        return q == 0 or sigma < 3
    if el == "N" or el == "P":
        if q == 1:
            # protonated pyridinium [nH+] with sigma 3 -> needs double bond
            return sigma <= 3 and n_h + degree <= 3
        # neutral n: pyridine-type (2 connections, no H) needs a double bond;
        # pyrrole-type (3 connections or an H) does not.
        return sigma <= 2
    if el in ("O", "S", "Se"):
        # furan/thiophene contribute a lone pair: no double bond (unless
        # positively charged, e.g. pyrylium o+)
        return q == 1
    if el == "B":
        return False
    return sigma <= 2
