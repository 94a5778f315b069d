from . import activations, classif, distances, mahalanobis, norms, robust_norms
from .norms import squared_l2, l1, l2, linf
from .robust_norms import (
    truncated, huber, tukey, arctan, cauchy, geman_mcclure, blake_zisserman,
    robust_cost,
    truncated_loss, huber_loss, tukey_loss, arctan_loss, cauchy_loss,
    geman_mcclure_loss, blake_zisserman_loss, robust_whiten,
    gnc_anneal, gnc_schedule,
)
from .mahalanobis import (
    maha_squared_norm, maha_norm, maha_whitened, maha_whitened_info_u,
)
from .activations import sigmoid, tanh, relu, leaky_relu
from .classif import softmax, safe_softmax

__all__ = [
    "activations", "classif", "distances", "mahalanobis", "norms",
    "robust_norms",
    "squared_l2", "l1", "l2", "linf",
    "truncated", "huber", "tukey", "arctan", "cauchy", "geman_mcclure",
    "blake_zisserman",
    "robust_cost",
    "truncated_loss", "huber_loss", "tukey_loss", "arctan_loss",
    "cauchy_loss", "geman_mcclure_loss", "blake_zisserman_loss",
    "robust_whiten",
    "gnc_anneal", "gnc_schedule",
    "maha_squared_norm", "maha_norm", "maha_whitened",
    "maha_whitened_info_u",
    "sigmoid", "tanh", "relu", "leaky_relu",
    "softmax", "safe_softmax",
]
