from .zorder import (
    hilbert_key_py,
    hilbert_key_udf,
    norm31_hash,
    norm31_scale,
    zorder_key_col,
    zorder_key_py,
)

__all__ = [
    "zorder_key_col",
    "zorder_key_py",
    "hilbert_key_udf",
    "hilbert_key_py",
    "norm31_hash",
    "norm31_scale",
]
