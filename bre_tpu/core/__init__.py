from . import math, rng, lowdiscrepancy, sampling, spectrum  # noqa: F401
