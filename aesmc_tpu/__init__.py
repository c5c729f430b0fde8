"""aesmc_tpu: TPU-native auto-encoding sequential Monte Carlo.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
reference `aesmc` package (/root/reference/aesmc/__init__.py:1-7 re-exports
losses, inference, statistics, train; state and math are importable).
Extras beyond the reference: a native distribution library, pluggable
resampling variants, mesh parallelism, checkpointing, and benchmarks.
"""

__version__ = "0.3.0"

from . import blockpf
from . import checkpoint
from . import csmc
from . import distributions
from . import enkf
from . import forecast
from . import gradients
from . import if2
from . import inference
from . import losses
from . import math
from . import models
from . import online
from . import ot
from . import parallel
from . import profiling
from . import proposals
from . import rbpf
from . import resample_move
from . import resampling
from . import samplers
from . import smc2
from . import sqmc
from . import state
from . import smoothing
from . import tmc
from . import twisted
from . import statistics
from . import train
from . import utils
from . import variance

__all__ = [
    "blockpf", "checkpoint", "csmc", "distributions", "enkf",
    "forecast", "gradients",
    "if2", "inference",
    "losses", "math", "models", "online", "ot", "parallel", "profiling",
    "proposals", "rbpf", "resample_move", "resampling", "samplers", "smc2", "smoothing",
    "sqmc",
    "state", "statistics", "tmc", "train", "twisted", "utils", "variance",
    "__version__",
]
