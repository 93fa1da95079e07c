"""Adaptivity policies and the adaptive refinement loop (L3)."""

from adjoint_ode_adaptivity_tpu.adapt.fd_loop import (
    AdaptResult,
    AdaptState,
    FDPerMemberAdaptResult,
    adapt_iteration,
    backtrack_iteration,
    run_adaptive_fd,
    run_adaptive_fd_backtrack,
    run_adaptive_fd_backtrack_padded,
    run_adaptive_fd_per_member,
)
from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
    DGAdaptResult,
    DGPerMemberAdaptResult,
    run_adaptive_dg,
    run_adaptive_dg_ensemble,
    run_adaptive_dg_per_member,
)
from adjoint_ode_adaptivity_tpu.adapt.hp_loop import (
    HPAdaptResult,
    HPPerMemberAdaptResult,
    run_adaptive_dg_hp,
    run_adaptive_dg_hp_per_member,
)
from adjoint_ode_adaptivity_tpu.adapt.policy import (
    bisect_refine,
    bisect_refine_masked,
    bisect_refine_padded,
    bisect_refine_padded_masked,
    coarsen_merge,
    coarsen_merge_padded,
    pad_times,
    plateau_detect,
    should_refine_depth,
)

__all__ = [
    "DGAdaptResult",
    "DGPerMemberAdaptResult",
    "run_adaptive_dg",
    "run_adaptive_dg_ensemble",
    "run_adaptive_dg_per_member",
    "HPAdaptResult",
    "HPPerMemberAdaptResult",
    "run_adaptive_dg_hp",
    "run_adaptive_dg_hp_per_member",
    "AdaptState",
    "AdaptResult",
    "FDPerMemberAdaptResult",
    "adapt_iteration",
    "run_adaptive_fd",
    "run_adaptive_fd_backtrack",
    "run_adaptive_fd_backtrack_padded",
    "run_adaptive_fd_per_member",
    "backtrack_iteration",
    "bisect_refine_padded_masked",
    "coarsen_merge_padded",
    "bisect_refine_masked",
    "coarsen_merge",
    "pad_times",
    "bisect_refine",
    "bisect_refine_padded",
    "plateau_detect",
    "should_refine_depth",
]
