"""Global seeding (host RNGs; device RNG is explicit jax.random keys)."""

import random

import numpy as np


def seed_everything(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
