from .safe_math import safe_div, dec, dec_sum  # noqa: F401
