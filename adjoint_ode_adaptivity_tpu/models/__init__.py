"""NN models (L4): residual blocks as ODE update rules + surgery."""

from adjoint_ode_adaptivity_tpu.models.blocks import (
    ResBlock,
    ResBlockSimple,
    ResBlockSimpleMasked,
    ResNetBlock,
    ResNetODE,
    SingleNeuronLayers,
    resnet_ode_apply,
    sorted_bias_init,
)
from adjoint_ode_adaptivity_tpu.models.surgery import (
    bin_losses,
    bin_losses_padded,
    grow_width,
    grow_width_all_steps,
    grow_width_padded,
    insert_neuron,
    insert_neuron_padded,
    insert_step_params,
    insert_step_params_padded,
    layer_knot_losses,
    sort_neurons_padded,
    zero_step_moments,
)

__all__ = [
    "SingleNeuronLayers",
    "ResBlockSimple",
    "ResBlockSimpleMasked",
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
    "sort_neurons_padded",
    "layer_knot_losses",
    "bin_losses_padded",
    "insert_neuron_padded",
    "grow_width_padded",
    "grow_width_all_steps",
    "zero_step_moments",
]
