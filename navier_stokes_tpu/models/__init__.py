from .heat import (
    HeatEquation,
    heat_convergence_study,
    sum_of_unit_square_laplace_eigenfunctions,
    exact_solution,
)
from .navier_stokes import NavierStokes
from .navier_stokes_mcs import NavierStokesMCS
