"""Multi-device scale-out: meshes, sharded ensembles, element-sharded DG."""

from adjoint_ode_adaptivity_tpu.parallel.dg_shard import (
    advec_fwd_adj_estimate_sharded,
    advec_march_sharded,
    advec_rhs_local,
)
from adjoint_ode_adaptivity_tpu.parallel.ensemble import (
    ensemble_batched,
    ensemble_mean,
    ensemble_refinement_signal,
    ensemble_vmap,
)
from adjoint_ode_adaptivity_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_along,
)
from adjoint_ode_adaptivity_tpu.parallel.pipeline import pipeline_march

__all__ = [
    "make_mesh",
    "shard_along",
    "replicate",
    "ensemble_vmap",
    "ensemble_batched",
    "ensemble_mean",
    "ensemble_refinement_signal",
    "advec_rhs_local",
    "advec_march_sharded",
    "advec_fwd_adj_estimate_sharded",
    "pipeline_march",
]
