from .base import Model, SubsampledModel, TemperedModel
from . import zoo

__all__ = ["Model", "SubsampledModel", "TemperedModel", "zoo"]
