from . import loss, optim, awn, initializers  # noqa: F401
