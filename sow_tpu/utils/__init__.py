from sow_tpu.utils.numerics import (
    perturbe_random,
    randhaar,
    randuptri,
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
    "perturbe_random",
    "randhaar",
    "randuptri",
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
