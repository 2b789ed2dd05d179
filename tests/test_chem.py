"""In-tree cheminformatics (guidance_eval/chem.py): SMILES validity
(valence + kekulization), canonicalization invariance, ring counts,
and the molecule_metrics integration used by the QM9 guidance eval
(reference qm9_eval.py:133-192 uses RDKit for all of this)."""

import numpy as np
import pytest

from ddg_tpu.guidance_eval import chem as C
from ddg_tpu.guidance_eval import metrics as gm

VALID = [
    'C', 'CCO', 'CC(C)(C)C', 'O=C=O', 'C#N', 'N#Cc1ccccc1',
    'c1ccccc1', 'Cc1ccccc1', 'c1ccc2ccccc2c1',       # aromatics
    'c1cc[nH]c1', 'c1ccncc1', 'c1ccoc1', 'c1ccsc1',  # heteroaromatics
    '[nH]1cccc1', 'c1ccccc1-c1ccccc1',               # explicit arom.
    'CC(=O)[O-]', 'C[N+](C)(C)C', '[NH4+]', '[O-]S(=O)(=O)[O-]',
    'FC(F)(F)F', 'S(=O)(=O)(O)O', 'ClCCl', 'BrCBr',  # halogens, S(VI)
    'C.C', 'CC(=O)OC',                               # dot, ester
    'C1CC1', 'C1CCCCC1', 'C%10CCCC%10',              # rings, %nn
    '[13CH4]', 'C[C@H](N)C(=O)O',                    # isotope, stereo
    'B(O)(O)O', 'CP(C)C', 'O=P(O)(O)O',              # B, P(III/V)
]

INVALID = [
    '',                       # empty
    'C(C)(C)(C)(C)C',         # pentavalent carbon
    'N(=O)(=O)=O',            # N with valence 6
    'FF(F)',                  # divalent fluorine
    'O=C(=O)=O',              # C valence 6
    '[NH5+]',                 # N+ valence 5 (max 4)
    'c1cccc1',                # 5-ring all-carbon aromatic: odd number
                              # of pi-needing atoms, unkekulizable
    'n1cccc1',                # bare-n 5-ring, all six... 5 must-atoms
    'C1CC',                   # unclosed ring
    '1CC1',                   # ring digit before any atom
    'C((C)C',                 # unmatched paren
    'C)',                     # stray paren
    '[C',                     # unclosed bracket
    'CC=',                    # dangling bond
    'C=#C',                   # two bond symbols
    'C11',                    # self ring bond
    'Xx',                     # unknown atom
]


def test_validity():
    for s in VALID:
        assert C.is_valid_smiles(s), f'should be valid: {s!r}'
    for s in INVALID:
        assert not C.is_valid_smiles(s), f'should be invalid: {s!r}'


def test_canonical_invariance_and_idempotency():
    groups = [
        ['OCC', 'CCO', 'C(O)C', 'C(C)O'],
        ['c1ccccc1C', 'Cc1ccccc1', 'c1ccc(C)cc1', 'c1cc(C)ccc1'],
        ['C1CCCCC1', 'C2CCCCC2', 'C%12CCCCC%12'],
        ['CC(N)O', 'CC(O)N', 'OC(N)C', 'NC(O)C', 'C(C)(O)N'],
        ['c1ccc2ccccc2c1', 'c1ccc2c(c1)cccc2', 'c2ccc1ccccc1c2'],
        ['CC(=O)[O-]', '[O-]C(=O)C', 'CC([O-])=O'],
        ['c1cc[nH]c1', '[nH]1cccc1'],
        ['ClC(Br)F', 'FC(Cl)Br', 'BrC(F)Cl'],
        ['C[C@H](N)C(=O)O', 'C[C@@H](N)C(=O)O'],  # stereo merged
        ['[13CH4]', 'C'],                          # isotope dropped
    ]
    for g in groups:
        forms = {C.canonical_smiles(s) for s in g}
        assert len(forms) == 1 and None not in forms, (g, forms)
        c = forms.pop()
        assert C.canonical_smiles(c) == c, ('not idempotent', g, c)


def test_aromaticity_perception_merges_spellings():
    """Kekulé-form and lowercase spellings of the same aromatic ring
    must canonicalize identically (RDKit parity via simplified Hückel
    perception); non-aromatic rings must stay distinct."""
    pairs = [
        ('C1=CC=CC=C1', 'c1ccccc1'),
        ('CC1=CC=CC=C1', 'Cc1ccccc1'),
        ('C1=CC=NC=C1', 'c1ccncc1'),
        ('C1=CC=CO1', 'c1ccoc1'),
        ('C1=CC=CN1', 'c1cc[nH]c1'),        # pyrrole N-H inferred
        ('C1=CC2=CC=CC=C2C=C1', 'c1ccc2ccccc2c1'),
    ]
    for kek, arom in pairs:
        a, b = C.canonical_smiles(kek), C.canonical_smiles(arom)
        assert a == b and a is not None, (kek, arom, a, b)
    assert (C.canonical_smiles('C1CCCCC1')
            != C.canonical_smiles('c1ccccc1'))
    # cyclohexadienone ring stays non-aromatic (quinone-type)
    assert C.canonical_smiles('O=C1C=CC(=O)C=C1') is not None


def test_huckel_strictness():
    """Lowercase atoms outside a perceived aromatic ring are invalid
    (RDKit behavior): 4n-pi rings and acyclic aromatic atoms."""
    assert not C.is_valid_smiles('c1ccc1')    # cyclobutadiene, 4 pi
    assert not C.is_valid_smiles('[nH]C')     # acyclic aromatic atom
    assert not C.is_valid_smiles('cc')        # aromatic chain
    assert C.is_valid_smiles('C1=CC1')        # Kekulé ring: fine
    assert C.is_valid_smiles('C1=CC=CC=C1')   # Kekulé benzene: fine


def test_canonical_distinguishes_distinct_molecules():
    mols = ['CCO', 'CC=O', 'CCN', 'COC', 'c1ccccc1', 'C1CCCCC1',
            'CC(=O)O', 'CC(=O)[O-]', 'CCC', 'CC#N', 'CNC']
    forms = [C.canonical_smiles(s) for s in mols]
    assert None not in forms
    assert len(set(forms)) == len(mols)


def test_ring_count_matches_cycle_rank():
    expect = {'CCO': 0, 'C1CC1': 1, 'c1ccccc1': 1,
              'c1ccc2ccccc2c1': 2, 'C1CCCC1C1CCCC1': 2, 'C.C': 0,
              'C1CC2CCC1CC2': 2}
    for s, n in expect.items():
        assert C.ring_count(s) == n, (s, C.ring_count(s))
    assert C.ring_count('C(C)(C)(C)(C)C') is None  # invalid -> None


def test_fuzz_never_crashes():
    """Random token soup from the QM9 inventory must yield a clean
    bool/None, never an unhandled exception (model samples early in
    training are exactly this)."""
    from ddg_tpu.data.tokenizers import QM9_TOKENS
    rs = np.random.RandomState(0)
    toks = list(QM9_TOKENS)
    for _ in range(500):
        s = ''.join(rs.choice(toks)
                    for _ in range(rs.randint(1, 24)))
        v = C.is_valid_smiles(s)
        assert v in (True, False)
        c = C.canonical_smiles(s)
        assert c is None or isinstance(c, str)
        if c is not None:
            # anything we emit must re-parse to the same form
            assert C.canonical_smiles(c) == c, (s, c)


def test_canonical_invariant_under_atom_permutation():
    """The canonical form must not depend on input atom order: parse a
    valid molecule, permute its atom indices, and canonicalize the
    permuted graph directly."""
    def permute(mol, perm):
        inv = {old: new for new, old in enumerate(perm)}
        atoms = [mol.atoms[i] for i in perm]
        bonds = {}
        for (a, b), o in mol.bonds.items():
            x, y = inv[a], inv[b]
            bonds[(min(x, y), max(x, y))] = o
        return C.Mol(atoms, bonds)

    rs = np.random.RandomState(7)
    toks = ['C', 'c', 'N', 'n', 'O', 'o', 'S', 'F', '(', ')', '=',
            '#', '1', '2', '[nH]', '[N+]', '[O-]', 'Cl']
    checked = 0
    for _ in range(6000):
        s = ''.join(rs.choice(toks) for _ in range(rs.randint(2, 26)))
        c = C.canonical_smiles(s)
        if c is None:
            continue
        mol = C.parse_smiles(s)
        for _ in range(3):
            perm = rs.permutation(len(mol.atoms)).tolist()
            assert C.canonicalize_mol(permute(mol, perm)) == c, (s, c)
            checked += 1
    assert checked > 100  # the soup must yield enough valid molecules


def test_molecule_metrics_native_path():
    if gm.rdkit_available():
        pytest.skip('rdkit present; native path not exercised')
    samples = ['CCO', 'OCC',            # same molecule, 2 spellings
               'c1ccccc1',
               'C(C)(C)(C)(C)C',        # invalid (valence)
               'C1CC',                  # invalid (grammar)
               'CC=O']
    train = ['OCC']                     # ethanol, spelled differently
    out = gm.molecule_metrics(samples, train_set=train)
    assert out['validity_checker'] == 'native-valence'
    assert out['valid_frac'] == pytest.approx(4 / 6)
    assert out['unique_frac'] == pytest.approx(3 / 4)  # CCO==OCC
    # ethanol is in train (under canonicalization) -> 2/3 novel
    assert out['novel_frac'] == pytest.approx(2 / 3)
    stats = gm.qed_stats(out['novel'])
    # QED is now computed in-tree when RDKit is absent
    # (guidance_eval/qed.py)
    assert stats['qed_method'] == 'native-bickerton'
    assert 0.0 < stats['qed']['mean'] < 1.0
    assert stats['ring_count']['mean'] >= 0.0