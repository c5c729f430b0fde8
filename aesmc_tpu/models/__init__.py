"""Reference model families (test exemplars + flagship workloads).

Mirrors /root/reference/test/models/ (gaussian, lgssm) and adds the
BASELINE.json config families (stochastic volatility, bouncing ball) plus
the exact Kalman oracle.
"""

from . import bouncing_ball
from . import gaussian
from . import hmm
from . import kalman
from . import kalman_nd
from . import lgssm
from . import lgssm_nd
from . import lorenz
from . import stochastic_volatility
from . import vrnn

__all__ = ["bouncing_ball", "gaussian", "hmm", "kalman", "kalman_nd",
           "lgssm", "lgssm_nd", "lorenz", "stochastic_volatility",
           "vrnn"]
