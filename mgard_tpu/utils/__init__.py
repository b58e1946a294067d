from .log import Timer, log  # noqa: F401
from .error_calculator import (  # noqa: F401
    L_2_error,
    L_2_norm,
    L_inf_error,
    L_inf_norm,
    MSE,
    PSNR,
)
