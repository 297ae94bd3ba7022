from .engine import OracleIndex

__all__ = ["OracleIndex"]
