"""Version of cavmd_tpu (parity: reference src/version.py)."""

__version__ = "0.1.0"
