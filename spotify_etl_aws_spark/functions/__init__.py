from .casts import bool_from_string, lenient_cast
from .dates import normalize_partial_date

__all__ = ["bool_from_string", "lenient_cast", "normalize_partial_date"]
