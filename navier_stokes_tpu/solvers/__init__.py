from .cg import cg, cg_solve, SolverResult
from .minres import minres
from .bpcg import bramble_pasciak_cg, bramble_pasciak_cg_opt, bp_scale_factor
from .refinement import mixed_precision_saddle_solve, solve_initial_refined
