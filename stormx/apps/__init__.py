from stormx.apps import cahn_hilliard, euler

__all__ = ["cahn_hilliard", "euler"]
