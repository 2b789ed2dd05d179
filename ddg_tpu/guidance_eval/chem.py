"""Minimal in-tree cheminformatics for the QM9/ZINC SMILES subset.

The reference scores QM9 guidance with RDKit (validity, canonical
uniqueness/novelty, ring counts — guidance_eval/qm9_eval.py:133-192).
RDKit is not installed in this image; this module provides the part of
that protocol that is pure graph/valence math, so the QM9 eval is
chemically meaningful offline:

  * `parse_smiles`: SMILES -> molecular graph (organic subset +
    bracket atoms, branches, ring closures incl. %nn, dots, aromatic
    lowercase, charges, explicit H counts; stereo markers are parsed
    and deliberately ignored — uniqueness/novelty merge stereoisomers,
    flagged in the metrics output).
  * Kekulization: aromatic systems are assigned alternating double
    bonds by perfect matching on the pi-needing atoms (pyridine-type N
    needs a pi bond; pyrrole-type [nH]/substituted n, o, s donate a
    lone pair and do not). Unkekulizable input (e.g. c1ccc1) is
    invalid, matching RDKit.
  * Valence check (RDKit's model): after kekulization + implicit-H
    assignment, an atom whose explicit valence exceeds the maximum
    allowed for (element, charge) is invalid; under-bonded bracket
    atoms are radicals and allowed.
  * `canonical_smiles`: Morgan-style iterative refinement with
    deterministic tie-breaking, then a canonical DFS writer. The
    string is NOT RDKit's canonical form — uniqueness/novelty only
    need a form that is canonical *consistently across samples and
    train set*, which the callers guarantee by canonicalizing both
    sides with this function.
  * `ring_count`: cycle rank |E| - |V| + components, equal to RDKit's
    `GetRingInfo().NumRings()` (SSSR size).

QED itself stays RDKit-only (it needs Crippen logP / TPSA / structural
alert tables); callers flag it unavailable rather than approximate it.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

__all__ = ['parse_smiles', 'is_valid_smiles', 'canonical_smiles',
           'ring_count', 'SmilesError']


class SmilesError(ValueError):
    pass


@dataclasses.dataclass
class Atom:
    element: str               # capitalized symbol ('C', 'Cl', ...)
    aromatic: bool = False
    charge: int = 0
    h_count: Optional[int] = None   # None = implicit (organic subset)
    bracket: bool = False


@dataclasses.dataclass
class Mol:
    atoms: List[Atom]
    # adjacency: bonds[(i, j)] = order; 1, 2, 3, or 1.5 (aromatic,
    # pre-kekulization). Keys normalized i < j.
    bonds: Dict[Tuple[int, int], float]

    def neighbors(self, i: int) -> List[int]:
        out = []
        for (a, b) in self.bonds:
            if a == i:
                out.append(b)
            elif b == i:
                out.append(a)
        return out

    def bond(self, i: int, j: int) -> float:
        return self.bonds[(min(i, j), max(i, j))]


_ORGANIC = {'B', 'C', 'N', 'O', 'P', 'S', 'F', 'Cl', 'Br', 'I'}
_AROMATIC_OK = {'B', 'C', 'N', 'O', 'P', 'S'}
# Maximum allowed (explicit) valence per element at neutral charge
# (RDKit default valence model for the organic subset).
_MAX_VALENCE = {'B': 3, 'C': 4, 'N': 3, 'O': 2, 'P': 5, 'S': 6,
                'F': 1, 'Cl': 1, 'Br': 1, 'I': 1, 'H': 1}
# Valence levels used for implicit-H fill (lowest first).
_VALENCE_LEVELS = {'B': (3,), 'C': (4,), 'N': (3,), 'O': (2,),
                   'P': (3, 5), 'S': (2, 4, 6), 'F': (1,),
                   'Cl': (1,), 'Br': (1,), 'I': (1,), 'H': (1,)}
_BOND_CHARS = {'-': 1.0, '=': 2.0, '#': 3.0, ':': 1.5,
               '/': 1.0, '\\': 1.0}


def _max_allowed(element: str, charge: int) -> int:
    base = _MAX_VALENCE.get(element)
    if base is None:
        return 8  # unknown heavy element: don't reject on valence
    if element in ('N', 'O', 'P', 'S', 'F', 'Cl', 'Br', 'I'):
        return max(0, base + charge)   # N+ -> 4, O- -> 1, O+ -> 3 ...
    if element in ('C', 'B'):
        return max(0, base - abs(charge))  # C+ / C- -> 3
    return base


def parse_smiles(s: str) -> Mol:
    """Parse a SMILES string into a Mol; raises SmilesError on any
    grammar violation (mismatched parens/rings, bad bracket, dangling
    bond, self/duplicate bond)."""
    if not s:
        raise SmilesError('empty')
    atoms: List[Atom] = []
    bonds: Dict[Tuple[int, int], float] = {}
    prev: Optional[int] = None
    pending: Optional[float] = None
    stack: List[Tuple[Optional[int], Optional[float]]] = []
    rings: Dict[str, Tuple[int, Optional[float]]] = {}
    i, n = 0, len(s)

    def add_bond(a: int, b: int, order: float):
        if a == b:
            raise SmilesError('self-bond')
        key = (min(a, b), max(a, b))
        if key in bonds:
            raise SmilesError('duplicate bond')
        bonds[key] = order

    def attach(idx: int):
        nonlocal prev, pending
        if prev is not None:
            order = pending
            if order is None:
                order = (1.5 if (atoms[prev].aromatic
                                 and atoms[idx].aromatic) else 1.0)
            add_bond(prev, idx, order)
        pending = None
        prev = idx

    def ring_closure(label: str):
        nonlocal pending
        if prev is None:
            raise SmilesError('ring digit before any atom')
        if label in rings:
            other, obond = rings.pop(label)
            order = pending if pending is not None else obond
            if (pending is not None and obond is not None
                    and pending != obond):
                raise SmilesError('conflicting ring-bond orders')
            if order is None:
                order = (1.5 if (atoms[prev].aromatic
                                 and atoms[other].aromatic) else 1.0)
            add_bond(prev, other, order)
        else:
            rings[label] = (prev, pending)
        pending = None

    while i < n:
        ch = s[i]
        if ch in _BOND_CHARS:
            if pending is not None:
                raise SmilesError('two bond symbols in a row')
            pending = _BOND_CHARS[ch]
            i += 1
        elif ch == '(':
            if prev is None:
                raise SmilesError('branch before any atom')
            stack.append((prev, pending))
            pending = None
            i += 1
        elif ch == ')':
            if not stack:
                raise SmilesError('unmatched )')
            if pending is not None:
                raise SmilesError('dangling bond before )')
            prev, pending = stack.pop()
            pending = None
            i += 1
        elif ch == '.':
            if pending is not None or stack:
                raise SmilesError('dot inside branch/bond')
            prev = None
            i += 1
        elif ch.isdigit():
            ring_closure(ch)
            i += 1
        elif ch == '%':
            if i + 2 >= n or not s[i + 1:i + 3].isdigit():
                raise SmilesError('bad %nn ring label')
            ring_closure(s[i + 1:i + 3])
            i += 3
        elif ch == '[':
            j = s.find(']', i)
            if j < 0:
                raise SmilesError('unclosed [')
            atoms.append(_parse_bracket(s[i + 1:j]))
            attach(len(atoms) - 1)
            i = j + 1
        elif ch.isalpha() or ch == '*':
            # organic subset (two-letter first)
            if s[i:i + 2] in ('Cl', 'Br'):
                sym, i = s[i:i + 2], i + 2
            else:
                sym, i = ch, i + 1
            if sym == '*':
                atoms.append(Atom('*'))
            elif sym in _ORGANIC:
                atoms.append(Atom(sym))
            elif sym.upper() in _AROMATIC_OK and sym.islower():
                atoms.append(Atom(sym.upper(), aromatic=True))
            else:
                raise SmilesError(f'unknown organic-subset atom {sym!r}')
            attach(len(atoms) - 1)
        else:
            raise SmilesError(f'unexpected character {ch!r}')

    if stack:
        raise SmilesError('unmatched (')
    if rings:
        raise SmilesError('unclosed ring bond')
    if pending is not None:
        raise SmilesError('dangling bond at end')
    if not atoms:
        raise SmilesError('no atoms')
    return Mol(atoms, bonds)


def _parse_bracket(body: str) -> Atom:
    """[isotope? symbol chiral? hcount? charge? map?] — stereo (@/@@)
    and atom maps are parsed and dropped."""
    i, n = 0, len(body)
    while i < n and body[i].isdigit():   # isotope (ignored)
        i += 1
    if i < n and body[i:i + 2].istitle() and body[i:i + 2].isalpha():
        sym, i = body[i:i + 2], i + 2
    elif i < n and body[i].isalpha():
        sym, i = body[i], i + 1
    else:
        raise SmilesError(f'bad bracket atom [{body}]')
    aromatic = sym.islower()
    element = sym.capitalize()
    if aromatic and element not in _AROMATIC_OK:
        raise SmilesError(f'{sym!r} cannot be aromatic')
    while i < n and body[i] == '@':      # chirality (ignored)
        i += 1
    h = 0
    if i < n and body[i] == 'H':
        i += 1
        d = ''
        while i < n and body[i].isdigit():
            d += body[i]
            i += 1
        h = int(d) if d else 1
    charge = 0
    while i < n and body[i] in '+-':
        sign = 1 if body[i] == '+' else -1
        i += 1
        d = ''
        while i < n and body[i].isdigit():
            d += body[i]
            i += 1
        charge += sign * (int(d) if d else 1)
    if i < n and body[i] == ':':         # atom map (ignored)
        i += 1
        while i < n and body[i].isdigit():
            i += 1
    if i != n:
        raise SmilesError(f'trailing junk in bracket [{body}]')
    return Atom(element, aromatic=aromatic, charge=charge, h_count=h,
                bracket=True)


# ---------------------------------------------------------------------------
# Kekulization + valence
# ---------------------------------------------------------------------------

def _pi_requirement(mol: Mol, i: int) -> str:
    """'must' = atom needs exactly one double bond in the aromatic
    system, 'never' = lone-pair donor, 'flex' = either (charged C,
    exotic cases — accepting both avoids false invalids)."""
    a = mol.atoms[i]
    degree = len(mol.neighbors(i))
    h = a.h_count or 0
    conn = degree + h
    if a.element == 'C':
        if a.charge != 0:
            return 'flex'
        # exocyclic double bond (e.g. quinone C written lowercase by
        # some generators) satisfies the pi requirement
        for j in mol.neighbors(i):
            if mol.bond(i, j) == 2.0:
                return 'never'
        return 'must'
    if a.element in ('N', 'P'):
        if a.charge == 1:
            return 'must' if conn == 3 else 'flex'
        if a.charge == 0:
            return 'must' if conn == 2 else 'never'
        return 'never'   # n- : amide-type anion, lone pair
    if a.element in ('O', 'S'):
        return 'must' if a.charge == 1 else 'never'
    if a.element == 'B':
        return 'never'
    return 'flex'


def _kekulize(mol: Mol) -> Optional[Dict[Tuple[int, int], float]]:
    """Return integer bond orders, or None if the aromatic system has
    no valid alternating-double-bond assignment."""
    arom_bonds = [k for k, v in mol.bonds.items() if v == 1.5]
    if not arom_bonds:
        return dict(mol.bonds)
    arom_atoms = sorted({i for k in arom_bonds for i in k})
    req = {i: _pi_requirement(mol, i) for i in arom_atoms}
    adj: Dict[int, List[int]] = {i: [] for i in arom_atoms}
    for (a, b) in arom_bonds:
        adj[a].append(b)
        adj[b].append(a)

    must = [i for i in arom_atoms if req[i] == 'must']
    matched: Dict[int, int] = {}

    def backtrack(idx: int) -> bool:
        while idx < len(must) and must[idx] in matched:
            idx += 1
        if idx == len(must):
            return True
        u = must[idx]
        for v in adj[u]:
            if v in matched or req[v] == 'never':
                continue
            matched[u] = v
            matched[v] = u
            if backtrack(idx + 1):
                return True
            del matched[u], matched[v]
        return False

    if not backtrack(0):
        return None
    out = dict(mol.bonds)
    for (a, b) in arom_bonds:
        out[(a, b)] = 2.0 if matched.get(a) == b else 1.0
    return out


def _implicit_h(element: str, aromatic: bool, bond_sum: float) -> int:
    levels = _VALENCE_LEVELS.get(element)
    if levels is None:
        return 0
    need = int(bond_sum + 0.999)  # ceil for any residual .5
    for v in levels:
        if v >= need:
            return v - need
    return 0   # over max: caught by the valence check


def validate(mol: Mol) -> Optional[str]:
    """None if chemically valid, else a reason string."""
    kek = _kekulize(mol)
    if kek is None:
        return 'unkekulizable aromatic system'
    if any(a.aromatic for a in mol.atoms):
        # RDKit-parity strictness: lowercase atoms must sit in a ring
        # the (simplified) Hückel rule actually perceives as aromatic —
        # rejects c1ccc1 (4n pi) and acyclic aromatic atoms.
        arom_atoms, _ = _perceive_aromatic(mol, kek)
        for i, a in enumerate(mol.atoms):
            if a.aromatic and i not in arom_atoms:
                return 'aromatic atom outside an aromatic ring'
    sums = {i: 0.0 for i in range(len(mol.atoms))}
    for (a, b), o in kek.items():
        sums[a] += o
        sums[b] += o
    for i, at in enumerate(mol.atoms):
        if at.element == '*':
            continue
        h = (at.h_count if at.bracket
             else _implicit_h(at.element, at.aromatic, sums[i]))
        total = sums[i] + (h or 0)
        if total > _max_allowed(at.element, at.charge):
            return (f'valence {total:g} > '
                    f'{_max_allowed(at.element, at.charge)} on '
                    f'{at.element}{at.charge:+d}' if at.charge else
                    f'valence {total:g} > '
                    f'{_max_allowed(at.element, at.charge)} on '
                    f'{at.element}')
    return None


def is_valid_smiles(s: str) -> bool:
    try:
        return validate(parse_smiles(s)) is None
    except SmilesError:
        return False


# ---------------------------------------------------------------------------
# Aromaticity perception (simplified Hückel, RDKit-default-like)
# ---------------------------------------------------------------------------

def _find_rings(mol: Mol, max_len: int = 18,
                max_paths: int = 20000) -> List[List[int]]:
    """All simple cycles up to max_len atoms (deduplicated by their
    frozen atom set; 18 covers macrocycles like crown ethers for the
    ring-restricted structural alerts). Molecules here are small
    (QM9 <= 9 heavy atoms, ZINC ~40); the path budget guards
    pathological fused systems —
    on overflow we return what we found (perception then errs
    lenient)."""
    n = len(mol.atoms)
    adj = {i: sorted(mol.neighbors(i)) for i in range(n)}
    seen = set()
    rings: List[List[int]] = []
    budget = [max_paths]

    def dfs(start: int, u: int, path: List[int], on_path: set):
        if budget[0] <= 0:
            return
        budget[0] -= 1
        for v in adj[u]:
            if v == start and len(path) >= 3:
                key = frozenset(path)
                if key not in seen:
                    seen.add(key)
                    rings.append(list(path))
            elif (v > start and v not in on_path
                  and len(path) < max_len):
                path.append(v)
                on_path.add(v)
                dfs(start, v, path, on_path)
                path.pop()
                on_path.remove(v)

    for s in range(n):
        dfs(s, s, [s], {s})
    return rings


def _pi_contribution(mol: Mol, kek, ring_atoms: set,
                     all_ring_atoms: set, i: int) -> Optional[int]:
    """Pi electrons atom i contributes to its ring's Hückel count, or
    None when the atom breaks conjugation (sp3, triple bond, degree>3,
    exocyclic double bond to a chain atom)."""
    a = mol.atoms[i]
    nbrs = mol.neighbors(i)
    if len(nbrs) > 3:
        return None
    dbl_in_ring = dbl_other = dbl_chain = False
    for j in nbrs:
        o = kek[(min(i, j), max(i, j))]
        if o >= 3.0:
            return None
        if o == 2.0:
            if j in ring_atoms:
                dbl_in_ring = True
            elif j in all_ring_atoms:
                dbl_other = True
            else:
                dbl_chain = True
    if dbl_in_ring or dbl_other:       # fused kekulizations count
        return 1
    h = _total_h(mol, kek, i)
    conn = len(nbrs) + h
    if a.element == 'C':
        if dbl_chain:
            return 0                   # quinone-type: sp2, no pi here
        if a.charge == 1 and conn == 3:
            return 0                   # tropylium
        if a.charge == -1 and conn == 3:
            return 2                   # cyclopentadienyl anion
        return None                    # sp3 carbon breaks the ring
    if a.element in ('N', 'P'):
        if a.charge == 0 and conn == 3:
            return 2                   # pyrrole-type lone pair
        if a.charge == -1 and conn == 2:
            return 2                   # deprotonated azole
        return None
    if a.element in ('O', 'S'):
        if a.charge == 0 and conn == 2:
            return 2                   # furan / thiophene
        return None
    if a.element == 'B':
        return 0 if conn == 3 else None  # borole-type empty orbital
    return None


def _perceive_aromatic(mol: Mol, kek) -> Tuple[set, set]:
    """(aromatic_atoms, aromatic_bonds) of the kekulized graph by the
    simplified Hückel rule: a simple ring whose atoms all conjugate
    and whose pi total is 4n+2. Fused envelopes are covered by the
    ring enumeration itself (simple cycles up to length 10 include
    e.g. azulene's 10-periphery)."""
    rings = _find_rings(mol)
    all_ring_atoms = {i for r in rings for i in r}
    arom_atoms: set = set()
    arom_bonds: set = set()
    for ring in rings:
        rset = set(ring)
        total = 0
        ok = True
        for i in ring:
            c = _pi_contribution(mol, kek, rset, all_ring_atoms, i)
            if c is None:
                ok = False
                break
            total += c
        if ok and total >= 2 and (total - 2) % 4 == 0:
            arom_atoms |= rset
            for k in range(len(ring)):
                a, b = ring[k], ring[(k + 1) % len(ring)]
                arom_bonds.add((min(a, b), max(a, b)))
    return arom_atoms, arom_bonds


def _rebuild_perceived(mol: Mol, kek) -> Mol:
    """Normalized Mol: aromatic flags/bonds from perception of the
    kekulized graph (input spelling — Kekulé vs lowercase — no longer
    matters), explicit H pinned on aromatic N/P so the result
    re-kekulizes unambiguously (pyrrole-type n must stay [nH])."""
    arom_atoms, arom_bonds = _perceive_aromatic(mol, kek)
    atoms = []
    for i, a in enumerate(mol.atoms):
        arom = i in arom_atoms
        h = _total_h(mol, kek, i)
        if arom and a.element in ('N', 'P') and h > 0:
            atoms.append(Atom(a.element, aromatic=True, charge=a.charge,
                              h_count=h, bracket=True))
        else:
            atoms.append(Atom(a.element, aromatic=arom,
                              charge=a.charge, h_count=a.h_count,
                              bracket=a.bracket))
    bonds = {}
    for e, o in kek.items():
        bonds[e] = 1.5 if e in arom_bonds else o
    return Mol(atoms, bonds)


# ---------------------------------------------------------------------------
# Canonicalization
# ---------------------------------------------------------------------------

def _total_h(mol: Mol, kek: Dict[Tuple[int, int], float],
             i: int) -> int:
    a = mol.atoms[i]
    if a.bracket:
        return a.h_count or 0
    bond_sum = sum(o for (x, y), o in kek.items() if i in (x, y))
    return _implicit_h(a.element, a.aromatic, bond_sum)


def _canonical_ranks(mol: Mol, kek) -> List[int]:
    n = len(mol.atoms)
    inv = []
    for i, a in enumerate(mol.atoms):
        inv.append((a.element, a.aromatic, a.charge,
                    _total_h(mol, kek, i), len(mol.neighbors(i))))
    order = sorted(range(n), key=lambda i: inv[i])
    rank = [0] * n
    r = 0
    for k, i in enumerate(order):
        if k and inv[i] != inv[order[k - 1]]:
            r = k
        rank[i] = r

    def refine(rank):
        for _ in range(n + 1):
            key = [(rank[i],
                    tuple(sorted((rank[j], mol.bond(i, j))
                                 for j in mol.neighbors(i))))
                   for i in range(n)]
            order = sorted(range(n), key=lambda i: key[i])
            new = [0] * n
            r = 0
            for k, i in enumerate(order):
                if k and key[i] != key[order[k - 1]]:
                    r = k
                new[i] = r
            if new == rank:
                return rank
            rank = new
        return rank

    rank = refine(rank)
    # break remaining ties deterministically
    while len(set(rank)) < n:
        counts: Dict[int, List[int]] = {}
        for i, r in enumerate(rank):
            counts.setdefault(r, []).append(i)
        tied = min((r for r, idxs in counts.items() if len(idxs) > 1))
        i0 = min(counts[tied])
        rank = [r if i != i0 else r - 1 for i, r in enumerate(rank)]
        # renormalize to dense ranks, then refine
        uniq = sorted(set(rank))
        remap = {v: k for k, v in enumerate(uniq)}
        rank = refine([remap[r] for r in rank])
    return rank


def _atom_token(mol: Mol, kek, i: int) -> str:
    a = mol.atoms[i]
    sym = a.element.lower() if a.aromatic else a.element
    h = _total_h(mol, kek, i)
    if a.element in _ORGANIC and a.charge == 0:
        # writable in the organic subset iff the implied H count
        # matches (bracket atoms included — [13CH4] and C must
        # canonicalize identically once the isotope is dropped).
        # Aromatic N/P are special: a bare 'n' re-parses as
        # pyridine-type (H=0, pi-needing), so pyrrole-type N (H=1)
        # must keep its bracket — [nH].
        if a.aromatic and a.element in ('N', 'P'):
            if h == 0:
                return sym
        else:
            bond_sum = sum(o for (x, y), o in kek.items()
                           if i in (x, y))
            if _implicit_h(a.element, a.aromatic, bond_sum) == h:
                return sym
    out = '[' + sym
    if h:
        out += 'H' + (str(h) if h > 1 else '')
    if a.charge:
        sign = '+' if a.charge > 0 else '-'
        mag = abs(a.charge)
        out += sign + (str(mag) if mag > 1 else '')
    return out + ']'


def _bond_str(mol: Mol, e: Tuple[int, int]) -> str:
    """Bond symbol from the ORIGINAL (pre-kekulization) order, so
    aromatic rings round-trip as aromatic: 1.5 -> default '' between
    lowercase atoms; an explicit single bond between two aromatic
    atoms (biphenyl) needs '-'."""
    o = mol.bonds[e]
    if o == 2.0:
        return '='
    if o == 3.0:
        return '#'
    if o == 1.0 and mol.atoms[e[0]].aromatic and mol.atoms[e[1]].aromatic:
        return '-'
    return ''


def canonical_smiles(s: str) -> Optional[str]:
    """Canonical form (stereo-insensitive), or None when invalid."""
    try:
        mol = parse_smiles(s)
    except SmilesError:
        return None
    if validate(mol) is not None:
        return None
    return canonicalize_mol(mol)


def canonicalize_mol(mol: Mol) -> str:
    """Canonical SMILES of an (already validated) Mol. Input-order
    independent up to refinement symmetry: ties left by Morgan
    refinement are broken by input index, which is order-invariant
    whenever the tied atoms are automorphic (true for molecule-like
    graphs; pathological regular graphs could in principle differ).
    Aromaticity is re-perceived from the kekulized graph first, so
    Kekulé and lowercase spellings of the same molecule canonicalize
    identically."""
    mol = _rebuild_perceived(mol, _kekulize(mol))
    kek = _kekulize(mol)
    rank = _canonical_ranks(mol, kek)
    n = len(mol.atoms)
    visited = [False] * n
    ring_ids: Dict[Tuple[int, int], int] = {}
    next_ring = [1]
    # Pre-assign ring-closure bonds via DFS tree detection per component
    pieces = []
    for root in sorted(range(n), key=lambda i: rank[i]):
        if visited[root]:
            continue

        tree_edges = set()
        back_edges = []
        seen = {root}
        stack = [(root, None)]
        order_stack = []
        while stack:
            u, parent = stack.pop()
            order_stack.append(u)
            for v in sorted(mol.neighbors(u), key=lambda x: rank[x],
                            reverse=True):
                if v == parent and (min(u, v), max(u, v)) in tree_edges:
                    continue
                e = (min(u, v), max(u, v))
                if v in seen:
                    if (e not in tree_edges and e not in ring_ids
                            and e not in back_edges):
                        back_edges.append(e)
                else:
                    seen.add(v)
                    tree_edges.add(e)
                    stack.append((v, u))
        for e in back_edges:
            ring_ids[e] = next_ring[0]
            next_ring[0] += 1

        def write(u: int, parent: Optional[int]) -> str:
            visited[u] = True
            out = _atom_token(mol, kek, u)
            # ring closures at this atom
            for e, rid in sorted(ring_ids.items(),
                                 key=lambda kv: kv[1]):
                if u in e:
                    a, b = e
                    # bond symbol written at the second (closing) atom
                    other = b if u == a else a
                    label = str(rid) if rid < 10 else f'%{rid:02d}'
                    out += (_bond_str(mol, e)
                            if visited[other] else '') + label
            kids = [v for v in sorted(mol.neighbors(u),
                                      key=lambda x: rank[x])
                    if v != parent
                    and (min(u, v), max(u, v)) not in ring_ids
                    and not visited[v]]
            for k, v in enumerate(kids):
                e = (min(u, v), max(u, v))
                seg = _bond_str(mol, e) + write(v, u)
                out += f'({seg})' if k < len(kids) - 1 else seg
            return out

        pieces.append(write(root, None))
    return '.'.join(pieces)


def ring_count(s: str) -> Optional[int]:
    """Cycle rank |E|-|V|+components (== RDKit NumRings/SSSR size);
    None when the SMILES is invalid."""
    try:
        mol = parse_smiles(s)
    except SmilesError:
        return None
    if validate(mol) is not None:
        return None
    n = len(mol.atoms)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    comps = n
    for (a, b) in mol.bonds:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            comps -= 1
    return len(mol.bonds) - n + comps
