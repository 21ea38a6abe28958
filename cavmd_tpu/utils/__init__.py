from cavmd_tpu.utils.minimize import fire_minimize

__all__ = ["fire_minimize"]
