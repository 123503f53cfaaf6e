from stormx.ops.math import safe_divide, safe_inverse, sign, sym_ortho
from stormx.ops import vector
from stormx.ops.segment import segment_max, segment_min, segment_sum

__all__ = [
    "safe_divide",
    "safe_inverse",
    "sign",
    "sym_ortho",
    "vector",
    "segment_sum",
    "segment_min",
    "segment_max",
]
