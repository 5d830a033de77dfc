from . import audio, batching, features, librispeech, timit  # noqa: F401
