"""Small shared utilities (MLP building block, pytree helpers)."""

from .mlp import MLP
from .pytree import unstack

__all__ = ["MLP", "unstack"]
