"""Domain metrics for guidance evaluation, host-side numpy.

Parity with the reference guidance_eval suites:
  * QM9 (guidance_eval/qm9_eval.py:88-204): validity / uniqueness /
    novelty and property stats on the novel subset. RDKit is optional
    in this environment; without it, validity/canonicalization/ring
    counts come from the in-tree valence+kekulization checker
    (guidance_eval/chem.py, flagged `native-valence` in the result);
    QED stays RDKit-only.
  * Amazon-Polarity (amazon_polarity_eval.py:66-124): n-gram diversity
    + classifier accuracy.
  * Species10 (ten_species_eval.py:298-523): classifier accuracy / F1
    / MCC, k-mer Jensen-Shannon divergence, discriminator AUROC.
"""

from __future__ import annotations

import itertools
from collections import Counter
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# Molecules (QM9)
# ---------------------------------------------------------------------------

def _rdkit_mol(smiles: str):
    try:
        from rdkit import Chem
        from rdkit import RDLogger
        RDLogger.DisableLog('rdApp.*')
        return Chem.MolFromSmiles(smiles)
    except ImportError:
        return None


def rdkit_available() -> bool:
    try:
        import rdkit  # noqa: F401
        return True
    except ImportError:
        return False


def molecule_metrics(samples: List[str],
                     train_set: Optional[Sequence[str]] = None) -> Dict:
    """Valid / unique / novel fractions (qm9_eval.py:133-160).

    With RDKit absent, validity and canonicalization come from the
    in-tree valence/kekulization checker (guidance_eval/chem.py);
    uniqueness and novelty compare OUR canonical forms on both sides
    (train set re-canonicalized with the same function), so the
    metrics stay internally consistent. Divergence from RDKit: no
    Hückel anti-aromaticity check and no stereo — flagged via
    `validity_checker: native-valence`."""
    use_rdkit = rdkit_available()
    if use_rdkit:
        from rdkit import Chem
        canon = lambda s: (lambda m: Chem.MolToSmiles(m)
                           if m is not None else None)(_rdkit_mol(s))
    else:
        from ddg_tpu.guidance_eval.chem import canonical_smiles as canon
    valid = [c for c in (canon(s) for s in samples) if c is not None]
    n = max(len(samples), 1)
    unique = set(valid)
    out = {
        'num_samples': len(samples),
        'validity_checker': 'rdkit' if use_rdkit else 'native-valence',
        'valid_frac': len(valid) / n,
        'unique_frac': (len(unique) / len(valid)) if valid else 0.0,
    }
    if train_set is not None:
        train = {c for c in (canon(s) for s in train_set)
                 if c is not None}
        novel = [s for s in unique if s not in train]
        out['novel_frac'] = (len(novel) / len(unique)) if unique else 0.0
        out['novel'] = novel
    return out


def qed_stats(smiles: List[str]) -> Dict:
    """QED + ring-count mean/percentiles on molecules
    (qm9_eval.py:160-192). Ring counts are pure graph math (cycle
    rank == RDKit SSSR size). QED uses RDKit when installed; offline
    it comes from the in-tree implementation of the published method
    (guidance_eval/qed.py — Bickerton ADS over Wildman-Crippen logP,
    Ertl TPSA, etc.; validated against RDKit reference values,
    structural alerts a documented subset), flagged via
    `qed_method`."""
    def stats(v):
        v = np.asarray(v, np.float64)
        if not len(v):
            return {}
        return {'mean': float(v.mean()),
                'p25': float(np.percentile(v, 25)),
                'p50': float(np.percentile(v, 50)),
                'p75': float(np.percentile(v, 75))}

    if rdkit_available():
        from rdkit import Chem
        from rdkit.Chem import QED
        qeds, rings = [], []
        for s in smiles:
            mol = Chem.MolFromSmiles(s)
            if mol is None:
                continue
            qeds.append(QED.qed(mol))
            rings.append(mol.GetRingInfo().NumRings())
        return {'qed': stats(qeds), 'ring_count': stats(rings),
                'qed_method': 'rdkit'}
    from ddg_tpu.guidance_eval.chem import ring_count
    from ddg_tpu.guidance_eval.qed import qed as native_qed
    qeds = [q for q in (native_qed(s) for s in smiles)
            if q is not None]
    rings = [r for r in (ring_count(s) for s in smiles)
             if r is not None]
    return {'qed': stats(qeds) or None, 'ring_count': stats(rings),
            'qed_method': 'native-bickerton'}


# ---------------------------------------------------------------------------
# Text (Amazon Polarity)
# ---------------------------------------------------------------------------

def ngram_diversity(texts: List[str], max_n: int = 4) -> Dict[str, float]:
    """distinct-n ratios over whitespace tokens
    (amazon_polarity_eval.py:66-89)."""
    out = {}
    for n in range(1, max_n + 1):
        grams = []
        for t in texts:
            toks = t.split()
            grams.extend(tuple(toks[i:i + n])
                         for i in range(len(toks) - n + 1))
        out[f'distinct_{n}'] = (len(set(grams)) / len(grams)
                                if grams else 0.0)
    return out


# ---------------------------------------------------------------------------
# Classification metrics (Species10 / Amazon)
# ---------------------------------------------------------------------------

def classification_metrics(y_true, y_pred, num_classes: int) -> Dict:
    """Accuracy, macro-F1, Matthews correlation
    (ten_species_eval.py:298-353)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    acc = float((y_true == y_pred).mean())
    f1s = []
    for c in range(num_classes):
        tp = int(((y_pred == c) & (y_true == c)).sum())
        fp = int(((y_pred == c) & (y_true != c)).sum())
        fn = int(((y_pred != c) & (y_true == c)).sum())
        denom = 2 * tp + fp + fn
        f1s.append(2 * tp / denom if denom else 0.0)
    # MCC (multiclass, Gorodkin)
    conf = np.zeros((num_classes, num_classes), np.float64)
    for t, p in zip(y_true, y_pred):
        conf[t, p] += 1
    t_sum = conf.sum(1)
    p_sum = conf.sum(0)
    n = conf.sum()
    cov_tp = n * np.trace(conf) - t_sum @ p_sum
    cov_tt = n ** 2 - (t_sum ** 2).sum()
    cov_pp = n ** 2 - (p_sum ** 2).sum()
    mcc = (cov_tp / np.sqrt(cov_tt * cov_pp)
           if cov_tt > 0 and cov_pp > 0 else 0.0)
    return {'accuracy': acc, 'macro_f1': float(np.mean(f1s)),
            'mcc': float(mcc)}


# ---------------------------------------------------------------------------
# Genomics (Species10)
# ---------------------------------------------------------------------------

def kmer_counts(seqs: Iterable[str], k: int) -> Counter:
    counts = Counter()
    for s in seqs:
        for i in range(len(s) - k + 1):
            counts[s[i:i + k]] += 1
    return counts


def kmer_js_divergence(samples: List[str], reference: List[str],
                       k: int, alphabet: str = 'ACGT') -> float:
    """Jensen-Shannon divergence between k-mer distributions
    (ten_species_eval.py:355-406)."""
    kmers = [''.join(p) for p in itertools.product(alphabet, repeat=k)]
    cs = kmer_counts(samples, k)
    cr = kmer_counts(reference, k)
    p = np.asarray([cs.get(m, 0) for m in kmers], np.float64) + 1e-10
    q = np.asarray([cr.get(m, 0) for m in kmers], np.float64) + 1e-10
    p /= p.sum()
    q /= q.sum()
    m = (p + q) / 2
    kl = lambda a, b: float((a * np.log(a / b)).sum())
    return 0.5 * kl(p, m) + 0.5 * kl(q, m)


def discriminator_auroc(scores_real, scores_fake) -> float:
    """AUROC of a real-vs-generated discriminator
    (ten_species_eval.py:408-523). Rank-based (Mann-Whitney)."""
    from scipy.stats import rankdata
    scores = np.concatenate([scores_real, scores_fake])
    labels = np.concatenate([np.ones(len(scores_real)),
                             np.zeros(len(scores_fake))])
    ranks = rankdata(scores)
    n1 = labels.sum()
    n0 = len(labels) - n1
    if n0 == 0 or n1 == 0:
        return 0.5
    u = ranks[labels == 1].sum() - n1 * (n1 + 1) / 2
    return float(u / (n0 * n1))
