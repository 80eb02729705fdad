from .brute import brute_force_cosine_topk  # noqa: F401
from .ivf import IvfIndex  # noqa: F401
