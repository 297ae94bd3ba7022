from .manifest import PhaseManifest, atomic_write_json, read_json

__all__ = ["PhaseManifest", "atomic_write_json", "read_json"]
