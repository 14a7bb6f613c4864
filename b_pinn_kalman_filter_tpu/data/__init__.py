from b_pinn_kalman_filter_tpu.data.datasets import (
    get_dataset, get_data_scaler, get_data_inverse_scaler, get_mask_dataset)
