"""Model families.

The (s)GDML model is the flagship (and, as in the reference, only) model
family: :class:`sgdml_tpu.models.gdml.GDMLModel`.
"""

from .gdml import GDMLModel

__all__ = ['GDMLModel']
