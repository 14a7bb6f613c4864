from b_pinn_kalman_filter_tpu.utils.misc import (
    Clock, make_grid, save_image_grid, show_memory_usage)
from b_pinn_kalman_filter_tpu.utils.profiling import (
    enable_nan_debugging, check_for_nans, trace, timed)
