from .medallion import run_medallion

__all__ = ["run_medallion"]
