from b_pinn_kalman_filter_tpu.kalman.patching import patch, unpatch
from b_pinn_kalman_filter_tpu.kalman.ukf import (
    MerweWeights, UKFBelief, initialize_beliefs, merwe_weights, sigma_points,
    ukf_step)
from b_pinn_kalman_filter_tpu.kalman.dynamics import (
    IdentityKFMeasure, InpaintKFMeasure, NSDynamics)
from b_pinn_kalman_filter_tpu.kalman.ukf_lib import PINN_KF, UKF
