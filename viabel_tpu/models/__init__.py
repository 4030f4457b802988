from .base import Model, TemperedModel
from . import zoo

__all__ = ["Model", "TemperedModel", "zoo"]
