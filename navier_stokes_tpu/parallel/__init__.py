from .sharding import (
    device_mesh,
    sharded_local_operator,
    sharded_batch_step,
    pad_elements,
)
from .sweep import make_viscosity_step, run_reynolds_ensemble
