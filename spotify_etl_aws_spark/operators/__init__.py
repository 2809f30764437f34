from . import core, shred, staging

__all__ = ["core", "shred", "staging"]
