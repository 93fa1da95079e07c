"""Training through the differentiable solver (L4/L5)."""

from adjoint_ode_adaptivity_tpu.train.adaptive import (
    PaddedAdaptiveState,
    make_padded_adaptive_trainer,
)
from adjoint_ode_adaptivity_tpu.train.data import make_batches, rk4_truth, train_test_split
from adjoint_ode_adaptivity_tpu.train.loop import (
    TrainState,
    create_train_state,
    evaluate,
    evaluate_masked,
    make_mixed_loss_train_step,
    make_mixed_loss_train_step_fused,
    make_per_step_masked_train_step,
    make_per_step_train_step,
    make_per_step_masked_train_step_fused,
    make_per_step_train_step_fused,
    make_shared_train_step,
    make_shared_train_step_fused,
)
from adjoint_ode_adaptivity_tpu.train.losses import (
    mixed_ramp_weight,
    terminal_mse,
    trajectory_mse,
    trajectory_trapezoid,
)
from adjoint_ode_adaptivity_tpu.train.metrics import MetricsLogger, StepTimer

__all__ = [
    "TrainState",
    "PaddedAdaptiveState",
    "make_padded_adaptive_trainer",
    "create_train_state",
    "make_shared_train_step",
    "make_shared_train_step_fused",
    "make_per_step_train_step",
    "make_per_step_train_step_fused",
    "make_per_step_masked_train_step_fused",
    "make_per_step_masked_train_step",
    "make_mixed_loss_train_step",
    "make_mixed_loss_train_step_fused",
    "evaluate",
    "evaluate_masked",
    "rk4_truth",
    "make_batches",
    "train_test_split",
    "terminal_mse",
    "trajectory_trapezoid",
    "trajectory_mse",
    "mixed_ramp_weight",
    "MetricsLogger",
    "StepTimer",
]
