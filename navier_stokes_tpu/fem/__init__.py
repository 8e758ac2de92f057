from .spaces import (
    H1,
    H1_with_bubble,
    L2,
    Nonconforming,
    FunctionSpace,
    VectorSpace,
    VectorH1,
)
from .quadrature import simplex_rule
