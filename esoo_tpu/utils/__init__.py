from .config import complex_dtype, real_dtype, set_precision

__all__ = ["complex_dtype", "real_dtype", "set_precision"]
