from .vector import (
    avg_vec,
    cosine_sim,
    dot,
    l2_norm,
    point_is_above,
    sq_euc_dist,
    sub_vec,
    vec_f64,
)

__all__ = [
    "avg_vec",
    "cosine_sim",
    "dot",
    "l2_norm",
    "point_is_above",
    "sq_euc_dist",
    "sub_vec",
    "vec_f64",
]
