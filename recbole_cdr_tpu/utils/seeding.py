"""Deterministic seeding for host-side RNG (numpy / python) and JAX keys.

The host RNG drives data shuffling / splitting; device randomness (init, negative
sampling) threads explicit ``jax.random`` keys derived from the same seed.
"""

import random

import numpy as np


def init_seed(seed: int, reproducibility: bool = True) -> None:
    random.seed(seed)
    np.random.seed(seed)


def jax_key(seed: int):
    import jax

    return jax.random.PRNGKey(seed)
