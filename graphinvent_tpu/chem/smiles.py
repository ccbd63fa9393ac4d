"""SMILES parsing and writing, kekulization, and aromaticity perception.

Stand-in for the RDKit entry points the reference uses:
  * ``SmilesMolSupplier`` (parameters/load.py:10-26)  -> :func:`mol_from_smiles`
  * ``rdkit.Chem.Kekulize`` (DataProcesser.py:334-336) -> :func:`kekulize`
  * ``MolToSmiles`` (MolecularGraph.py:83-92)          -> :func:`mol_to_smiles`

The writer emits a *canonical* SMILES (deterministic over graph
automorphism via chem.canon) so that string comparison implements the
uniqueness metric (Analyzer.py:480-499).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from graphinvent_tpu.chem.molecule import (
    Atom, Molecule, SanitizeError, allowed_valences, needs_pi_bond,
)

ORGANIC_SUBSET = {"B", "C", "N", "O", "P", "S", "F", "Cl", "Br", "I"}
AROMATIC_SYMBOLS = {"b": "B", "c": "C", "n": "N", "o": "O", "p": "P",
                    "s": "S", "se": "Se"}
_BOND_CHARS = {"-": 0, "=": 1, "#": 2, ":": 3, "/": 0, "\\": 0}


class SmilesError(ValueError):
    pass


# ==========================================================================
# Parsing
# ==========================================================================

def mol_from_smiles(smiles: str, sanitize: bool = True,
                    kekulize_mol: bool = True) -> Molecule:
    """Parses a SMILES string.  Aromatic (lowercase) input is kekulized by
    default, matching the reference's preprocessing path
    (DataProcesser.py:334-336 with use_aromatic_bonds=False)."""
    smiles = smiles.strip()
    if not smiles:
        raise SmilesError("empty SMILES")
    mol = Molecule()
    prev_stack: List[int] = []          # branch stack
    prev_atom: Optional[int] = None
    pending_bond: Optional[int] = None
    ring_openings: Dict[int, Tuple[int, Optional[int]]] = {}
    aromatic_flags: List[bool] = []

    i, n = 0, len(smiles)
    while i < n:
        ch = smiles[i]

        if ch == "(":
            if prev_atom is None:
                raise SmilesError("branch with no preceding atom")
            prev_stack.append(prev_atom)
            i += 1
            continue
        if ch == ")":
            if not prev_stack:
                raise SmilesError("unmatched ')'")
            prev_atom = prev_stack.pop()
            i += 1
            continue
        if ch in _BOND_CHARS:
            pending_bond = _BOND_CHARS[ch]
            i += 1
            continue
        if ch == ".":
            prev_atom = None
            pending_bond = None
            i += 1
            continue
        if ch.isdigit() or ch == "%":
            if ch == "%":
                if i + 2 >= n:
                    raise SmilesError("bad %nn ring closure")
                num = int(smiles[i + 1:i + 3])
                i += 3
            else:
                num = int(ch)
                i += 1
            if prev_atom is None:
                raise SmilesError("ring closure before any atom")
            if num in ring_openings:
                open_atom, open_bond = ring_openings.pop(num)
                bond = pending_bond if pending_bond is not None else open_bond
                if bond is None:
                    both_arom = (aromatic_flags[open_atom]
                                 and aromatic_flags[prev_atom])
                    bond = 3 if both_arom else 0
                mol.add_bond(open_atom, prev_atom, bond)
            else:
                ring_openings[num] = (prev_atom, pending_bond)
            pending_bond = None
            continue

        # ---- atom tokens -------------------------------------------------
        if ch == "[":
            end = smiles.find("]", i)
            if end < 0:
                raise SmilesError("unmatched '['")
            atom, aromatic = _parse_bracket_atom(smiles[i + 1:end])
            i = end + 1
        else:
            sym2 = smiles[i:i + 2]
            if sym2 in ("Cl", "Br"):
                atom, aromatic = Atom(sym2), False
                i += 2
            elif ch in ORGANIC_SUBSET:
                atom, aromatic = Atom(ch), False
                i += 1
            elif ch in AROMATIC_SYMBOLS:
                atom, aromatic = Atom(AROMATIC_SYMBOLS[ch]), True
                i += 1
            else:
                raise SmilesError(f"unexpected character {ch!r} at {i} in {smiles!r}")
        atom.aromatic = aromatic
        idx = mol.add_atom(atom)
        aromatic_flags.append(aromatic)

        if prev_atom is not None:
            bond = pending_bond
            if bond is None:
                bond = 3 if (aromatic_flags[prev_atom] and aromatic) else 0
            mol.add_bond(prev_atom, idx, bond)
        prev_atom = idx
        pending_bond = None

    if ring_openings:
        raise SmilesError(f"unclosed ring bonds: {sorted(ring_openings)}")
    if prev_stack:
        raise SmilesError("unclosed branch")

    if kekulize_mol and any(a.aromatic for a in mol.atoms):
        kekulize(mol)
    if sanitize:
        mol.sanitize()
    return mol


def _parse_bracket_atom(body: str) -> Tuple[Atom, bool]:
    """Parses the inside of a bracket atom: [isotope][symbol][chiral][H][charge]."""
    i, n = 0, len(body)
    isotope = 0
    while i < n and body[i].isdigit():
        isotope = isotope * 10 + int(body[i])
        i += 1
    aromatic = False
    if i + 1 < n and body[i:i + 2] in ("Cl", "Br", "Si", "Se"):
        symbol = body[i:i + 2]
        i += 2
    elif i + 1 < n and body[i:i + 2] == "se":
        symbol, aromatic = "Se", True
        i += 2
    elif i < n and body[i] in AROMATIC_SYMBOLS:
        symbol, aromatic = AROMATIC_SYMBOLS[body[i]], True
        i += 1
    elif i < n and body[i].isalpha():
        symbol = body[i]
        i += 1
        if i < n and body[i].islower() and body[i] != "s" and symbol + body[i] in (
                "Cl", "Br", "Si", "Se"):
            symbol += body[i]
            i += 1
    else:
        raise SmilesError(f"bad bracket atom [{body}]")

    chirality = "None"
    if i < n and body[i] == "@":
        if i + 1 < n and body[i + 1] == "@":
            chirality, i = "R", i + 2      # @@ ~ clockwise
        else:
            chirality, i = "S", i + 1
        # skip TH1/TH2 style classes
        while i < n and body[i].isalnum() and body[i] not in "H+-":
            i += 1

    n_h = 0
    if i < n and body[i] == "H":
        i += 1
        n_h = 1
        if i < n and body[i].isdigit():
            n_h = int(body[i])
            i += 1

    charge = 0
    while i < n and body[i] in "+-":
        sign = 1 if body[i] == "+" else -1
        i += 1
        if i < n and body[i].isdigit():
            charge += sign * int(body[i])
            i += 1
        else:
            charge += sign
    if i != n:
        raise SmilesError(f"trailing characters in bracket atom [{body}]")

    atom = Atom(symbol, charge=charge, n_implicit_h=n_h, chirality=chirality,
                isotope=isotope)
    return atom, aromatic


# ==========================================================================
# Kekulization
# ==========================================================================

def kekulize(mol: Molecule) -> None:
    """Replaces aromatic bonds with alternating single/double bonds in place
    and clears aromatic flags.  Backtracking perfect matching over the atoms
    that need a double bond."""
    arom_atoms = [i for i, a in enumerate(mol.atoms) if a.aromatic]
    if not arom_atoms:
        return
    arom_bonds = [(a, b) for (a, b), t in mol.bonds.items() if t == 3]

    # which aromatic atoms need one double bond in the kekule structure?
    needs: Dict[int, bool] = {}
    for i in arom_atoms:
        needs[i] = needs_pi_bond(mol, i)

    # adjacency restricted to aromatic bonds
    adj: Dict[int, List[int]] = {i: [] for i in arom_atoms}
    for a, b in arom_bonds:
        if a in adj and b in adj:
            adj[a].append(b)
            adj[b].append(a)

    need_atoms = [i for i in arom_atoms if needs[i]]
    matched: Dict[int, int] = {}

    order = sorted(need_atoms, key=lambda i: len([j for j in adj[i] if needs[j]]))

    def backtrack(pos: int) -> bool:
        while pos < len(order) and order[pos] in matched:
            pos += 1
        if pos == len(order):
            return True
        u = order[pos]
        for v in adj[u]:
            if needs.get(v) and v not in matched:
                matched[u] = v
                matched[v] = u
                if backtrack(pos + 1):
                    return True
                del matched[u]
                del matched[v]
        return False

    if not backtrack(0):
        raise SanitizeError("kekulization failed: no perfect matching for "
                            "aromatic system")

    for a, b in arom_bonds:
        if matched.get(a) == b:
            mol.set_bond_type(a, b, 1)
        else:
            mol.set_bond_type(a, b, 0)
    for i in arom_atoms:
        atom = mol.atoms[i]
        atom.aromatic = False
        # aromatic N written as plain "n" (no H-count) gets its H from the
        # valence model after kekulization; explicit [nH] keeps its count.


# ==========================================================================
# Aromaticity perception (for canonical output + use_aromatic_bonds mode)
# ==========================================================================

def perceive_aromaticity(mol: Molecule) -> None:
    """Marks rings aromatic using a simplified Hückel model on kekulé input:
    every ring atom sp2 (has a double bond in-ring or exocyclic, or is a
    heteroatom with a lone pair) and pi-electron count % 4 == 2."""
    rings = mol.rings()
    ring_sets = [set(r) for r in rings]
    all_ring_atoms = set().union(*ring_sets) if ring_sets else set()
    is_aromatic_atom = set()
    for ring in rings:
        pi = _ring_pi_electrons(mol, ring, all_ring_atoms)
        if pi is not None and pi % 4 == 2:
            is_aromatic_atom.update(ring)
    for i in is_aromatic_atom:
        mol.atoms[i].aromatic = True
    # flag in-ring bonds between aromatic atoms whose ring is aromatic
    for ring, rset in zip(rings, ring_sets):
        if rset <= is_aromatic_atom:
            for k in range(len(ring)):
                a, b = ring[k], ring[(k + 1) % len(ring)]
                mol.set_bond_type(a, b, 3)


def _ring_pi_electrons(mol: Molecule, ring: List[int],
                       all_ring_atoms: set) -> Optional[int]:
    """Pi electrons contributed to the ring, or None if a ring atom cannot
    participate (sp3).  A double bond into a *fused* ring counts as
    in-system (naphthalene-style sharing)."""
    total = 0
    for i in ring:
        atom = mol.atoms[i]
        dbl_in_ring = any(mol.bond_type(i, j) in (1, 3) and j in all_ring_atoms
                          for j in mol.neighbors(i))
        dbl_exo = any(mol.bond_type(i, j) in (1, 2) and j not in all_ring_atoms
                      for j in mol.neighbors(i))
        el, q = atom.element, atom.charge
        if dbl_in_ring:
            total += 1
        elif dbl_exo:
            total += 0          # exocyclic C=O carbon contributes 0
        elif el in ("N", "P") and q == 0:
            total += 2          # pyrrole-type lone pair
        elif el in ("O", "S", "Se") and q == 0:
            total += 2
        elif el in ("N", "P") and q == 1:
            return None
        elif el == "C" and q == -1:
            total += 2          # cyclopentadienyl anion
        elif el == "C" and q == 1:
            total += 0
        else:
            return None
    return total


# ==========================================================================
# Writing (canonical)
# ==========================================================================

def mol_to_smiles(mol: Molecule, canonical: bool = True,
                  aromatic: bool = True) -> Optional[str]:
    """Canonical SMILES writer.  Returns None for invalid/empty molecules,
    matching get_smiles() semantics in MolecularGraph.py:83-92."""
    if mol.n_atoms == 0:
        return None
    try:
        work = mol.copy()
        if aromatic and not any(a.aromatic for a in work.atoms):
            try:
                perceive_aromaticity(work)
            except Exception:
                pass
        from graphinvent_tpu.chem.canon import canonical_ranks
        ranks = canonical_ranks(work) if canonical else list(range(work.n_atoms))
        return _write_smiles(work, ranks)
    except Exception:
        return None


def _write_smiles(mol: Molecule, ranks: List[int]) -> str:
    n = mol.n_atoms
    comps = mol.connected_components()
    pieces = []
    visited = [False] * n
    ring_counter = [0]
    for comp in sorted(comps, key=lambda c: min(ranks[i] for i in c)):
        root = min(comp, key=lambda i: ranks[i])
        pieces.append(_write_component(mol, root, ranks, visited, ring_counter))
    return ".".join(pieces)


def _write_component(mol: Molecule, root: int, ranks: List[int],
                     visited: List[bool], ring_counter: List[int]) -> str:
    # pass 1: DFS spanning tree in canonical-rank order; back edges become
    # ring closures (detected at the deeper endpoint)
    parent: Dict[int, Optional[int]] = {root: None}
    children: Dict[int, List[int]] = {}
    back_edges: List[Tuple[int, int]] = []
    back_set = set()

    def dfs(u: int) -> None:
        visited[u] = True
        children[u] = []
        for v in sorted(mol.neighbors(u), key=lambda w: ranks[w]):
            if visited[v]:
                if v != parent[u]:
                    ekey = (u, v) if u < v else (v, u)
                    if ekey not in back_set:
                        back_set.add(ekey)
                        back_edges.append(ekey)
            else:
                parent[v] = u
                children[u].append(v)
                dfs(v)

    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10 * mol.n_atoms + 100))
    try:
        dfs(root)

        atom_rings: Dict[int, List[Tuple[int, int]]] = {}
        ring_digit: Dict[Tuple[int, int], int] = {}
        for ekey in back_edges:
            ring_counter[0] += 1
            ring_digit[ekey] = ring_counter[0]
            atom_rings.setdefault(ekey[0], []).append(ekey)
            atom_rings.setdefault(ekey[1], []).append(ekey)

        out: List[str] = []
        opened = set()

        def bond_str(t: Optional[int], a: int, b: int) -> str:
            if t == 1:
                return "="
            if t == 2:
                return "#"
            if t == 3 and not (mol.atoms[a].aromatic and mol.atoms[b].aromatic):
                return "-"
            return ""

        def emit(u: int, from_atom: Optional[int]) -> None:
            if from_atom is not None:
                out.append(bond_str(mol.bond_type(from_atom, u), from_atom, u))
            out.append(_atom_token(mol, u))
            for ekey in atom_rings.get(u, []):
                other = ekey[1] if ekey[0] == u else ekey[0]
                digit = ring_digit[ekey]
                if ekey not in opened:     # opening occurrence carries the symbol
                    opened.add(ekey)
                    out.append(bond_str(mol.bond_type(u, other), u, other))
                out.append(str(digit) if digit < 10 else f"%{digit:02d}")
            kids = children.get(u, [])
            for idx, v in enumerate(kids):
                if idx < len(kids) - 1:
                    out.append("(")
                    emit(v, u)
                    out.append(")")
                else:
                    emit(v, u)

        emit(root, None)
    finally:
        sys.setrecursionlimit(old_limit)
    return "".join(out)


def _atom_token(mol: Molecule, i: int) -> str:
    atom = mol.atoms[i]
    el = atom.element
    sym = el.lower() if atom.aromatic else el
    n_h = mol.implicit_h(i)
    plain_ok = (el in ORGANIC_SUBSET and atom.charge == 0 and atom.isotope == 0
                and atom.chirality == "None")
    if plain_ok and atom.n_implicit_h is None:
        return sym
    if plain_ok and atom.n_implicit_h is not None:
        # check the valence model reproduces the declared H count
        probe = atom.n_implicit_h
        atom_backup = atom.n_implicit_h
        atom.n_implicit_h = None
        derived = mol.implicit_h(i)
        atom.n_implicit_h = atom_backup
        if derived == probe:
            return sym
    body = sym
    if atom.isotope:
        body = f"{atom.isotope}{body}"
    if n_h == 1:
        body += "H"
    elif n_h > 1:
        body += f"H{n_h}"
    if atom.charge == 1:
        body += "+"
    elif atom.charge == -1:
        body += "-"
    elif atom.charge > 1:
        body += f"+{atom.charge}"
    elif atom.charge < -1:
        body += f"-{-atom.charge}"
    return f"[{body}]"
