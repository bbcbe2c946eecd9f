from sow_tpu.utils.numerics import (
    closest_factorization,
    generate_rank_k,
    left_unfolding,
    pad_matrix,
    qr_weight,
    right_unfolding,
    svd_weight,
    unfolding,
    unpad_matrix,
)

__all__ = [
    "closest_factorization",
    "generate_rank_k",
    "left_unfolding",
    "pad_matrix",
    "qr_weight",
    "right_unfolding",
    "svd_weight",
    "unfolding",
    "unpad_matrix",
]
