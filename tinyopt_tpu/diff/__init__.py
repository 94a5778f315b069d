from .auto import (
    value_and_jacfwd,
    residual_jacobian,
    make_nlls_system,
    make_cost_system,
    make_acc_system,
)

__all__ = [
    "value_and_jacfwd",
    "residual_jacobian",
    "make_nlls_system",
    "make_cost_system",
    "make_acc_system",
]
