from . import shardings

__all__ = ["shardings"]
