from . import dp, mesh, multihost, seq_attention  # noqa: F401
from .mesh import make_mesh  # noqa: F401
