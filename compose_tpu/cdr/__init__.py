from . import caas, qlt, tree  # noqa: F401
from .qlt import (  # noqa: F401
    CONSERVE, CONSISTENT, NONNEGATIVE, SHAPEPRESERVE, QLT)
