from .scalar import (
    deterministic_order_key,
    null_safe_ratio,
    pct_of_total,
    safe_int_expr,
    sentinel_to_null,
)

__all__ = [
    "deterministic_order_key",
    "null_safe_ratio",
    "pct_of_total",
    "safe_int_expr",
    "sentinel_to_null",
]
