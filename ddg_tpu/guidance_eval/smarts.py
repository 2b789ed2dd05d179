"""Minimal SMARTS pattern matcher over the in-tree molecular graph
(guidance_eval/chem.py).

The reference computes QED with RDKit (guidance_eval/qm9_eval.py:17,
70-71), whose descriptors (HBA/HBD, rotatable bonds, Crippen atom
types, structural alerts) are all defined as SMARTS pattern sets.
RDKit is absent in this image; this module implements the SMARTS
subset those pattern sets need, so the QED descriptor tables in
guidance_eval/qed.py stay data-driven (patterns as published) instead
of hand-coded logic.

Supported SMARTS subset:
  * atom primitives: element symbols (aliphatic `C`/`Cl`/...,
    aromatic `c n o s p`), `#n` atomic number, `*` any, `a`/`A`
    aromatic/aliphatic, `D<n>` heavy-atom degree, `H<n>` total H
    count, `X<n>` total connectivity (degree + H), `v<n>` total bond
    valence (incl. H), `R` / `R0` / `R<n>` SSSR ring membership,
    `r<n>` smallest ring size, `+`/`-`/`+n`/`-n`/`++`/`--`/`+0`
    charge, `$(...)` recursive SMARTS, `!` negation, `&` / implicit
    strong conjunction, `,` disjunction, `;` weak conjunction.
  * bond primitives: `-` single, `=` double, `#` triple, `:`
    aromatic, `~` any, `@` / `!@` ring / non-ring, conjunctions of
    those (`-!@`), `,` disjunction; default bond = single-or-aromatic.
  * structure: branches, ring-closure digits, chains.

Hydrogens are implicit on the molecule side (chem.Mol stores total H
per heavy atom), so pattern atoms only ever bind heavy atoms; `[#1]`
patterns are not supported (the Crippen H types in qed.py classify
hydrogens from their heavy neighbor directly).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Set, Tuple

from ddg_tpu.guidance_eval.chem import (
    Mol,
    SmilesError,
    _find_rings,
    _kekulize,
    _rebuild_perceived,
    _total_h,
    parse_smiles,
    validate,
)

__all__ = ['PerceivedMol', 'Smarts', 'perceive', 'compile_smarts']

_ATOMIC_NUM = {
    'H': 1, 'B': 5, 'C': 6, 'N': 7, 'O': 8, 'F': 9, 'Na': 11,
    'Mg': 12, 'Si': 14, 'P': 15, 'S': 16, 'Cl': 17, 'K': 19,
    'Ca': 20, 'Fe': 26, 'Zn': 30, 'Se': 34, 'Br': 35, 'I': 53,
}
_NUM_TO_ELEM = {v: k for k, v in _ATOMIC_NUM.items()}


@dataclasses.dataclass
class PAtom:
    """Perceived atom: everything SMARTS primitives test."""
    element: str
    aromatic: bool
    charge: int
    h: int                 # total hydrogens
    degree: int            # heavy-atom neighbors
    valence: int           # kekulized bond-order sum + hydrogens
    ring_count: int        # SSSR rings containing the atom
    min_ring: int          # smallest ring size (0 = acyclic)

    @property
    def connectivity(self) -> int:
        return self.degree + self.h


class PerceivedMol:
    """chem.Mol after kekulization + aromaticity perception, with the
    per-atom properties SMARTS needs precomputed. Bond orders are
    kekulized except aromatic bonds (1.5)."""

    def __init__(self, mol: Mol):
        kek = _kekulize(mol)
        if kek is None:
            raise SmilesError('unkekulizable')
        pm = _rebuild_perceived(mol, kek)
        kek2 = _kekulize(pm)
        n = len(pm.atoms)
        self.n = n
        self.bonds: Dict[Tuple[int, int], float] = dict(pm.bonds)
        self.adj: List[List[int]] = [[] for _ in range(n)]
        for (a, b) in pm.bonds:
            self.adj[a].append(b)
            self.adj[b].append(a)
        self.ring_bonds = self._non_bridge_edges()
        sssr = self._sssr(pm)
        ring_cnt = [0] * n
        min_ring = [0] * n
        for ring in sssr:
            for i in ring:
                ring_cnt[i] += 1
                if min_ring[i] == 0 or len(ring) < min_ring[i]:
                    min_ring[i] = len(ring)
        self.sssr = sssr
        self.atoms: List[PAtom] = []
        for i, a in enumerate(pm.atoms):
            h = _total_h(pm, kek2, i)
            # Valence from the KEKULIZED orders (aromatic 1.5s would
            # give pyrrole N valence 4; kekulized 1+1+H = 3, matching
            # RDKit's total valence).
            order_sum = sum(o for e, o in kek2.items() if i in e)
            self.atoms.append(PAtom(
                element=a.element, aromatic=a.aromatic,
                charge=a.charge, h=h, degree=len(self.adj[i]),
                valence=int(order_sum) + h,
                ring_count=ring_cnt[i], min_ring=min_ring[i]))

    def _non_bridge_edges(self) -> Set[Tuple[int, int]]:
        """Edges on at least one cycle (Tarjan bridges, iterative)."""
        n = self.n
        disc = [-1] * n
        low = [0] * n
        bridges: Set[Tuple[int, int]] = set()
        timer = [0]
        for root in range(n):
            if disc[root] != -1:
                continue
            stack = [(root, -1, iter(self.adj[root]))]
            disc[root] = low[root] = timer[0]
            timer[0] += 1
            while stack:
                u, parent, it = stack[-1]
                advanced = False
                for v in it:
                    if v == parent:
                        parent = -2  # allow multi-edges back (none)
                        continue
                    if disc[v] == -1:
                        disc[v] = low[v] = timer[0]
                        timer[0] += 1
                        stack.append((v, u, iter(self.adj[v])))
                        advanced = True
                        break
                    low[u] = min(low[u], disc[v])
                if not advanced:
                    stack.pop()
                    if stack:
                        p = stack[-1][0]
                        low[p] = min(low[p], low[u])
                        if low[u] > disc[p]:
                            bridges.add((min(p, u), max(p, u)))
        return {e for e in self.bonds if e not in bridges}

    def _sssr(self, pm: Mol) -> List[List[int]]:
        """SSSR-sized ring set: smallest simple cycles first, greedily
        kept while contributing a not-yet-covered edge, up to the
        cycle rank (matches RDKit's NumRings; the exact ring *choice*
        only affects R<n>/r<n> on heavily fused systems)."""
        comps = self._n_components()
        rank = len(self.bonds) - self.n + comps
        if rank <= 0:
            return []
        rings = sorted(_find_rings(pm), key=len)
        chosen: List[List[int]] = []
        covered: Set[Tuple[int, int]] = set()
        for ring in rings:
            edges = {(min(a, b), max(a, b))
                     for a, b in zip(ring, ring[1:] + ring[:1])}
            if edges - covered:
                chosen.append(ring)
                covered |= edges
                if len(chosen) == rank:
                    break
        return chosen

    def _n_components(self) -> int:
        seen = [False] * self.n
        comps = 0
        for s in range(self.n):
            if seen[s]:
                continue
            comps += 1
            stack = [s]
            seen[s] = True
            while stack:
                u = stack.pop()
                for v in self.adj[u]:
                    if not seen[v]:
                        seen[v] = True
                        stack.append(v)
        return comps

    def bond(self, i: int, j: int) -> float:
        return self.bonds[(min(i, j), max(i, j))]

    def is_ring_bond(self, i: int, j: int) -> bool:
        return (min(i, j), max(i, j)) in self.ring_bonds


def perceive(smiles: str) -> Optional[PerceivedMol]:
    """SMILES -> PerceivedMol, or None when invalid."""
    try:
        mol = parse_smiles(smiles)
    except SmilesError:
        return None
    if validate(mol) is not None:
        return None
    try:
        return PerceivedMol(mol)
    except SmilesError:
        return None


# ---------------------------------------------------------------------------
# SMARTS parsing
# ---------------------------------------------------------------------------

AtomTest = Callable[[PerceivedMol, int], bool]
BondTest = Callable[[PerceivedMol, int, int], bool]

_AROM_SYMS = set('bcnops')


class _Parser:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ''

    def take(self) -> str:
        c = self.peek()
        self.i += 1
        return c

    def number(self, default: Optional[int] = None) -> Optional[int]:
        j = self.i
        while j < len(self.s) and self.s[j].isdigit():
            j += 1
        if j == self.i:
            return default
        v = int(self.s[self.i:j])
        self.i = j
        return v


def _elem_test(sym: str, arom: Optional[bool]) -> AtomTest:
    def t(m, i, _s=sym, _a=arom):
        a = m.atoms[i]
        return a.element == _s and (_a is None or a.aromatic == _a)
    return t


def _parse_atom_primitive(p: _Parser) -> AtomTest:
    c = p.peek()
    if c == '$':
        p.take()
        if p.take() != '(':
            raise ValueError('expected ( after $')
        depth = 1
        start = p.i
        while depth:
            ch = p.take()
            if not ch:
                raise ValueError('unterminated $(...)')
            if ch == '(':
                depth += 1
            elif ch == ')':
                depth -= 1
        inner = p.s[start:p.i - 1]
        sub = compile_smarts(inner)
        return lambda m, i, _s=sub: _s.matches_from(m, i)
    if c == '#':
        p.take()
        num = p.number()
        if num is None:
            raise ValueError('expected number after #')
        sym = _NUM_TO_ELEM.get(num, f'?{num}')
        return _elem_test(sym, None)
    if c == '*':
        p.take()
        return lambda m, i: True
    if c == 'a':
        p.take()
        return lambda m, i: m.atoms[i].aromatic
    if c == 'A':
        p.take()
        return lambda m, i: not m.atoms[i].aromatic
    if c == 'D':
        p.take()
        n = p.number(1)
        return lambda m, i, _n=n: m.atoms[i].degree == _n
    if c == 'H':
        # Element H is handled before primitives; here H<n> = H count.
        p.take()
        n = p.number(1)
        return lambda m, i, _n=n: m.atoms[i].h == _n
    if c == 'X':
        p.take()
        n = p.number(1)
        return lambda m, i, _n=n: m.atoms[i].connectivity == _n
    if c == 'v':
        p.take()
        n = p.number(1)
        return _valence_test(n)
    if c == 'R':
        p.take()
        n = p.number(None)
        if n is None:
            return lambda m, i: m.atoms[i].ring_count > 0
        return lambda m, i, _n=n: m.atoms[i].ring_count == _n
    if c == 'r':
        p.take()
        n = p.number(None)
        if n is None:
            return lambda m, i: m.atoms[i].ring_count > 0
        return lambda m, i, _n=n: m.atoms[i].min_ring == _n
    if c in '+-':
        sign = 1 if c == '+' else -1
        p.take()
        if p.peek() == '*':
            p.take()
            return (lambda m, i: m.atoms[i].charge > 0) if sign > 0 \
                else (lambda m, i: m.atoms[i].charge < 0)
        if p.peek() == c:  # ++ / --
            k = 1
            while p.peek() == c:
                p.take()
                k += 1
            return lambda m, i, _v=sign * k: m.atoms[i].charge == _v
        n = p.number(1)
        return lambda m, i, _v=sign * n: m.atoms[i].charge == _v
    # element symbols (two-letter first)
    two = p.s[p.i:p.i + 2]
    if two in ('Cl', 'Br', 'Si', 'Se', 'Na', 'Mg', 'Ca', 'Fe', 'Zn'):
        p.i += 2
        return _elem_test(two, False)
    if c.isupper():
        p.take()
        return _elem_test(c, False)
    if c in _AROM_SYMS:
        p.take()
        return _elem_test(c.upper(), True)
    raise ValueError(f'bad atom primitive at {p.i}: {p.s!r}')


def _valence_test(n: int) -> AtomTest:
    return lambda m, i, _n=n: m.atoms[i].valence == _n


def _parse_atom_expr(p: _Parser, *, stop: str) -> AtomTest:
    """Precedence: ! > & (incl. implicit) > , > ;"""
    def primary() -> AtomTest:
        if p.peek() == '!':
            p.take()
            t = primary()
            return lambda m, i, _t=t: not _t(m, i)
        return _parse_atom_primitive(p)

    def conj() -> AtomTest:
        terms = [primary()]
        while True:
            c = p.peek()
            if c == '&':
                p.take()
                terms.append(primary())
            elif c and c not in stop and c not in ',;':
                terms.append(primary())
            else:
                break
        if len(terms) == 1:
            return terms[0]
        return lambda m, i, _ts=tuple(terms): all(t(m, i)
                                                  for t in _ts)

    def disj() -> AtomTest:
        terms = [conj()]
        while p.peek() == ',':
            p.take()
            terms.append(conj())
        if len(terms) == 1:
            return terms[0]
        return lambda m, i, _ts=tuple(terms): any(t(m, i)
                                                  for t in _ts)

    terms = [disj()]
    while p.peek() == ';':
        p.take()
        terms.append(disj())
    if len(terms) == 1:
        return terms[0]
    return lambda m, i, _ts=tuple(terms): all(t(m, i) for t in _ts)


def _parse_bond_expr(p: _Parser) -> Optional[BondTest]:
    """Bond expression (conjunction/disjunction of primitives), or
    None for the default single-or-aromatic bond."""
    def prim() -> Optional[BondTest]:
        c = p.peek()
        if c == '!':
            p.take()
            t = prim()
            if t is None:
                raise ValueError('! needs a bond primitive')
            return lambda m, i, j, _t=t: not _t(m, i, j)
        if c == '-':
            p.take()
            return lambda m, i, j: m.bond(i, j) == 1.0
        if c == '=':
            p.take()
            return lambda m, i, j: m.bond(i, j) == 2.0
        if c == '#':
            p.take()
            return lambda m, i, j: m.bond(i, j) == 3.0
        if c == ':':
            p.take()
            return lambda m, i, j: m.bond(i, j) == 1.5
        if c == '~':
            p.take()
            return lambda m, i, j: True
        if c == '@':
            p.take()
            return lambda m, i, j: m.is_ring_bond(i, j)
        return None

    first = prim()
    if first is None:
        return None
    terms = [first]
    while True:
        c = p.peek()
        if c == '&':
            p.take()
            t = prim()
            if t is None:
                raise ValueError('dangling & in bond expr')
            terms.append(t)
        elif c == ',':
            # disjunction binds over whole conjunctions; patterns we
            # use only need a flat a,b list
            p.take()
            t = prim()
            if t is None:
                raise ValueError('dangling , in bond expr')
            prev = terms
            terms = [lambda m, i, j, _ps=tuple(prev), _t=t:
                     all(x(m, i, j) for x in _ps) or _t(m, i, j)]
        else:
            t = prim()
            if t is None:
                break
            terms.append(t)
    if len(terms) == 1:
        return terms[0]
    return lambda m, i, j, _ts=tuple(terms): all(t(m, i, j)
                                                 for t in _ts)


def _default_bond(m: PerceivedMol, i: int, j: int) -> bool:
    return m.bond(i, j) in (1.0, 1.5)


class Smarts:
    """Compiled pattern graph: atom tests + bond tests + topology."""

    def __init__(self, pattern: str, atoms: List[AtomTest],
                 bonds: List[Tuple[int, int, BondTest]]):
        self.pattern = pattern
        self.atom_tests = atoms
        self.bond_tests = bonds
        self.adj: List[List[Tuple[int, BondTest]]] = \
            [[] for _ in atoms]
        for a, b, t in bonds:
            self.adj[a].append((b, t))
            self.adj[b].append((a, t))

    # -- matching -----------------------------------------------------
    def _extend(self, m: PerceivedMol, mapping: Dict[int, int],
                used: Set[int]) -> bool:
        if len(mapping) == len(self.atom_tests):
            return True
        # next pattern atom adjacent to the mapped frontier
        nxt = None
        anchor = None
        for pa in mapping:
            for (pb, _t) in self.adj[pa]:
                if pb not in mapping:
                    nxt, anchor = pb, pa
                    break
            if nxt is not None:
                break
        if nxt is None:  # disconnected pattern component
            nxt = next(k for k in range(len(self.atom_tests))
                       if k not in mapping)
            cands = [c for c in range(m.n) if c not in used]
        else:
            cands = [c for c in m.adj[mapping[anchor]]
                     if c not in used]
        for cand in cands:
            if not self.atom_tests[nxt](m, cand):
                continue
            ok = True
            for (pb, t) in self.adj[nxt]:
                if pb in mapping:
                    mb = mapping[pb]
                    if (min(cand, mb), max(cand, mb)) not in m.bonds \
                            or not t(m, cand, mb):
                        ok = False
                        break
            if not ok:
                continue
            mapping[nxt] = cand
            used.add(cand)
            if self._extend(m, mapping, used):
                return True
            del mapping[nxt]
            used.discard(cand)
        return False

    def matches_from(self, m: PerceivedMol, i: int) -> bool:
        """True when the pattern matches rooted with atom 0 at i."""
        if not self.atom_tests[0](m, i):
            return False
        return self._extend(m, {0: i}, {i})

    def match_atoms(self, m: PerceivedMol) -> List[int]:
        """Molecule atoms that can bind pattern atom 0."""
        return [i for i in range(m.n) if self.matches_from(m, i)]

    def count_unique_matches(self, m: PerceivedMol) -> int:
        """Distinct atom SETS matched (RDKit GetSubstructMatches with
        uniquify=True collapses automorphic images)."""
        found: Set[frozenset] = set()

        def extend(mapping, used):
            if len(mapping) == len(self.atom_tests):
                found.add(frozenset(mapping.values()))
                return
            nxt = None
            anchor = None
            for pa in mapping:
                for (pb, _t) in self.adj[pa]:
                    if pb not in mapping:
                        nxt, anchor = pb, pa
                        break
                if nxt is not None:
                    break
            if nxt is None:
                if not mapping:
                    cands = list(range(m.n))
                    nxt = 0
                else:
                    nxt = next(k for k in range(len(self.atom_tests))
                               if k not in mapping)
                    cands = [c for c in range(m.n) if c not in used]
            else:
                cands = [c for c in m.adj[mapping[anchor]]
                         if c not in used]
            for cand in cands:
                if not self.atom_tests[nxt](m, cand):
                    continue
                ok = True
                for (pb, t) in self.adj[nxt]:
                    if pb in mapping:
                        mb = mapping[pb]
                        if (min(cand, mb), max(cand, mb)) \
                                not in m.bonds or not t(m, cand, mb):
                            ok = False
                            break
                if not ok:
                    continue
                mapping[nxt] = cand
                used.add(cand)
                extend(mapping, used)
                del mapping[nxt]
                used.discard(cand)

        for i in range(m.n):
            if self.atom_tests[0](m, i):
                extend({0: i}, {i})
        return len(found)

    def has_match(self, m: PerceivedMol) -> bool:
        return any(self.matches_from(m, i) for i in range(m.n))


def compile_smarts(pattern: str) -> Smarts:
    """Parse a SMARTS string into a Smarts pattern graph."""
    p = _Parser(pattern)
    atoms: List[AtomTest] = []
    bonds: List[Tuple[int, int, BondTest]] = []
    prev: Optional[int] = None
    pending: Optional[BondTest] = None
    pending_set = False
    stack: List[Tuple[Optional[int], Optional[BondTest], bool]] = []
    rings: Dict[str, Tuple[int, Optional[BondTest], bool]] = {}

    def close_atom(idx: int):
        nonlocal prev, pending, pending_set
        if prev is not None:
            t = pending if pending_set else None
            bonds.append((prev, idx,
                          t if t is not None else _default_bond))
        prev = idx
        pending = None
        pending_set = False

    while p.i < len(p.s):
        c = p.peek()
        if c == '(':
            p.take()
            stack.append((prev, pending, pending_set))
            continue
        if c == ')':
            p.take()
            prev, pending, pending_set = stack.pop()
            continue
        if c.isdigit() or c == '%':
            if c == '%':
                p.take()
                label = p.s[p.i:p.i + 2]
                p.i += 2
            else:
                label = p.take()
            if prev is None:
                raise ValueError('ring bond before any atom')
            if label in rings:
                o, ot, oset = rings.pop(label)
                t = pending if pending_set else (ot if oset else None)
                bonds.append((o, prev,
                              t if t is not None else _default_bond))
            else:
                rings[label] = (prev, pending, pending_set)
            pending = None
            pending_set = False
            continue
        bt = _parse_bond_expr(p)
        if bt is not None:
            pending = bt
            pending_set = True
            continue
        if c == '[':
            p.take()
            t = _parse_atom_expr(p, stop=']')
            if p.take() != ']':
                raise ValueError(f'expected ] in {pattern!r}')
            atoms.append(t)
            close_atom(len(atoms) - 1)
            continue
        # bare atom outside brackets
        t = _parse_atom_primitive(p)
        atoms.append(t)
        close_atom(len(atoms) - 1)
    if rings:
        raise ValueError(f'unclosed ring bond in {pattern!r}')
    if not atoms:
        raise ValueError(f'empty pattern {pattern!r}')
    return Smarts(pattern, atoms, bonds)
