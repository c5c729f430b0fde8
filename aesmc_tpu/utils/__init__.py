"""Small shared utilities (MLP building block, pytree helpers)."""

from .mlp import MLP, mixed_dot
from .pytree import unstack

__all__ = ["MLP", "mixed_dot", "unstack"]
