"""Coding-layer errors (ref rec/coding/utils.py)."""


class CodingError(Exception):
    """Raised on codec misconfiguration (KL overflow, bad buffers, ...)."""
