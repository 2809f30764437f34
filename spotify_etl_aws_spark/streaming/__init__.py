from .pipeline import read_table_stream, run_available_now

__all__ = ["read_table_stream", "run_available_now"]
