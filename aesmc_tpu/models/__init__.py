"""Reference model families (test exemplars + flagship workloads).

Mirrors /root/reference/test/models/ (gaussian, lgssm) and adds the
BASELINE.json config families (stochastic volatility, bouncing ball) plus
the exact Kalman oracle.
"""

from . import gaussian
from . import kalman
from . import lgssm

__all__ = ["gaussian", "kalman", "lgssm"]
