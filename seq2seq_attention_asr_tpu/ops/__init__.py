from . import cells, rnn, attention, monotonic, readout, masking  # noqa: F401
