"""Experiment drivers (L5): the reference's Main_* scripts as CLI modules.

| driver                | reference experiment                         |
|-----------------------|----------------------------------------------|
| fd_adaptive           | python/Main_finite_difference.py             |
| dg_adaptive           | matlab/MAIN.m                                |
| advec_dg              | utils/One_code.mlx (Advec1D)                 |
| train_resnet_ode      | Main_FD_with_net / Main_variable_params /    |
|                       | Main_new_loss / Main_no_matrix_detect_complex|
|                       | / Main_width_ref (via --method)              |
| sweep                 | python/Submit_schedule_frontera job farm     |
"""
