from .auto import (
    value_and_jacfwd,
    residual_jacobian,
    make_nlls_system,
    make_cost_system,
    make_acc_system,
)
from .num_diff import (
    Method,
    kForward,
    kCentral,
    kFastCentral,
    default_step,
    num_eval,
    estimate_num_jac,
    make_num_diff_system,
)
from .gradient_check import (
    GradientCheck,
    check_gradient,
    check_residuals_gradient,
)

__all__ = [
    "value_and_jacfwd",
    "residual_jacobian",
    "make_nlls_system",
    "make_cost_system",
    "make_acc_system",
    "Method",
    "kForward",
    "kCentral",
    "kFastCentral",
    "default_step",
    "num_eval",
    "estimate_num_jac",
    "make_num_diff_system",
    "GradientCheck",
    "check_gradient",
    "check_residuals_gradient",
]
