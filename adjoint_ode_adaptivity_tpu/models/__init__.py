"""NN models (L4): residual blocks as ODE update rules + surgery."""

from adjoint_ode_adaptivity_tpu.models.blocks import (
    ResBlock,
    ResBlockSimple,
    ResNetBlock,
    ResNetODE,
    SingleNeuronLayers,
    resnet_ode_apply,
    sorted_bias_init,
)
from adjoint_ode_adaptivity_tpu.models.surgery import (
    bin_losses,
    grow_width,
    insert_neuron,
    insert_step_params,
    insert_step_params_padded,
)

__all__ = [
    "SingleNeuronLayers",
    "ResBlockSimple",
    "ResBlock",
    "ResNetBlock",
    "ResNetODE",
    "resnet_ode_apply",
    "sorted_bias_init",
    "insert_step_params",
    "insert_step_params_padded",
    "bin_losses",
    "insert_neuron",
    "grow_width",
]
