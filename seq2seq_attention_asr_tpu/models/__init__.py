from . import chorowski, conv_bilstm, vgg  # noqa: F401
