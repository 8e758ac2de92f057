from .cg import cg, cg_solve, SolverResult
from .minres import minres
from .bpcg import bramble_pasciak_cg, bramble_pasciak_cg_opt, bp_scale_factor
from .refinement import (
    equilibrated_f32_ops,
    mixed_precision_minres_refinement,
    mixed_precision_saddle_solve,
    mixed_precision_saddle_solve_scaled,
    solve_initial_refined,
)
