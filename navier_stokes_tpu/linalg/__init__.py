from .pytree import tdot, tadd, tsub, tscale, taxpy, tzeros_like, tnorm, tmask
from .lanczos import lanczos_eigenvalues, condition_estimate
from .dense import dense_solve
