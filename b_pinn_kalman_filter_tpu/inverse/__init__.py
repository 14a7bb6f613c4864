from b_pinn_kalman_filter_tpu.inverse.operators import (
    GaussianFilter, InpaintOperator, LinearOperator, MatrixMult, ScalerMult,
    get_operator, observe)
from b_pinn_kalman_filter_tpu.inverse.obsv_sde import (
    LOBSVSDE, OBSVSDE, get_obsvsde)
from b_pinn_kalman_filter_tpu.inverse.conditional_sampling import (
    get_controlled_sampler, get_dps_sampler, get_sampler)
