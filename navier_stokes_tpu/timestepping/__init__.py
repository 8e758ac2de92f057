from .runge_kutta import (
    RungeKuttaWeights,
    implicit_runge_kutta_weights,
    linear_implicit_runge_kutta_step,
)
from .orthonormalization import orthonormalize
from .exponential import krylov_exponential_step
