"""LCSC: Linear Combination of Saved Checkpoints (arXiv 2404.02241),
via evolutionary search.

Parity with the reference's `lcsc.py` (/root/reference/lcsc.py:39-195):
  * `combine_checkpoints_diff`: theta_0 + sum_i alpha_i (theta_i -
    theta_0), as a pure pytree transform over parameter pytrees;
  * evolutionary search: EMA-rate-seeded population + zero vector,
    uniform crossover, Gaussian mutation, sum-normalization, L2 clip
    at 5, elitist truncation to population size;
  * fitness = a user-supplied callable (ppl / gen-ppl / entropy in the
    orchestration layer), lower is better; memoized per-alpha.
"""

from __future__ import annotations

import math
import random
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp


def combine_checkpoints_diff(param_trees: Sequence, alphas:
                             Sequence[float]):
    """theta_0 + sum_i alpha_i (theta_i - theta_0) over pytrees
    (reference lcsc.py:39-59). len(alphas) == len(param_trees) - 1."""
    assert len(alphas) == len(param_trees) - 1
    base = param_trees[0]

    def combine(*leaves):
        b = leaves[0]
        out = b
        for a, v in zip(alphas, leaves[1:]):
            out = out + a * (v - b)
        return out

    return jax.tree.map(combine, base, *param_trees[1:])


def _clip_extreme(a: List[float], max_l2: float = 5.0) -> List[float]:
    norm = math.sqrt(sum(x * x for x in a))
    if norm > max_l2:
        a = [x * max_l2 / norm for x in a]
    return a


def _init_population(K: int, pop_size: int,
                     rng: random.Random) -> List[List[float]]:
    """EMA-rate-seeded geometric weightings + random fill
    (reference lcsc.py:128-142)."""
    population = []
    for gamma in [0.9, 0.95, 0.97, 0.99, 0.995]:
        raw = [gamma ** (K - 1 - i) for i in range(1, K)]
        population.append(_clip_extreme(raw))
    while len(population) < pop_size:
        raw = [rng.gauss(0, 1) for _ in range(K - 1)]
        population.append(_clip_extreme(raw))
    return population[:pop_size]


def run_lcsc(*, num_checkpoints: int,
             fitness: Callable[[List[float]], float],
             population_size: int = 8, top_k: int = 0,
             iterations: int = 10, mutation_sigma: float = 0.05,
             offspring_per_iter: int = 8, seed: int = 0,
             log=print) -> Tuple[List[float], float]:
    """Evolutionary search over combination weights
    (reference lcsc.py:144-195). `fitness(alphas) -> score`, lower
    better. Returns (best_alphas, best_score)."""
    rng = random.Random(seed)
    K = num_checkpoints
    POP = population_size
    TOP = max(2, top_k or int(0.3 * POP))

    population = _init_population(K, POP, rng)
    population.insert(0, [0.0] * (K - 1))
    cache = {}

    def eval_alpha(alphas):
        key = tuple(round(a, 6) for a in alphas)
        if key not in cache:
            cache[key] = fitness(list(alphas))
        return cache[key]

    scored = [(a, eval_alpha(a)) for a in population]

    for it in range(iterations):
        scored.sort(key=lambda x: x[1])
        parents = [a for a, _ in scored[:TOP]]
        log(f'LCSC iter {it:03d}: best={scored[0][1]:.4f}')

        offspring = []
        for _ in range(offspring_per_iter):
            p1, p2 = rng.sample(parents, 2)
            child = [(x if rng.random() < 0.5 else y)
                     for x, y in zip(p1, p2)]
            child = [a + rng.gauss(0, mutation_sigma) for a in child]
            s = sum(child)
            if s != 0:
                child = [a / s for a in child]
            offspring.append(_clip_extreme(child))

        scored.extend((a, eval_alpha(a)) for a in offspring)
        scored.sort(key=lambda x: x[1])
        scored = scored[:POP]

    scored.sort(key=lambda x: x[1])
    best_alpha, best_score = scored[0]
    log(f'LCSC finished: best score {best_score:.4f}')
    return best_alpha, best_score
