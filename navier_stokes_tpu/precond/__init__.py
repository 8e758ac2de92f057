from .jacobi import jacobi, block_jacobi, extract_blocks_from_local
from .twolevel import two_level_preconditioner, p1_embedding, coarse_p1_solver
from .chebyshev import chebyshev_preconditioner
