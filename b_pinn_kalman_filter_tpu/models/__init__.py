from b_pinn_kalman_filter_tpu.models import registry
from b_pinn_kalman_filter_tpu.models import ddpm    # registers 'ddpm', 'mlp'
from b_pinn_kalman_filter_tpu.models import ncsnpp  # registers 'ncsnpp'
from b_pinn_kalman_filter_tpu.models import ncsnv2  # registers ncsnv2 family
from b_pinn_kalman_filter_tpu.models.registry import (
    register_model, get_model, create_model, init_model, get_model_fn,
    get_score_fn, get_sigmas, get_ddpm_params)
