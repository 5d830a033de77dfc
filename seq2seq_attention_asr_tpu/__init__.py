"""TPU-native attention-based sequence-to-sequence ASR framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Ajay-Wong/seq2seq-attention-asr (Torch7/Lua, Chorowski-et-al.-2015-style
attention ASR): log-mel front end, BiGRU/BiLSTM/VGG encoders,
location-aware hybrid attention with a monotonic-alignment penalty,
GRU/LSTM decoder with maxout readout, adaptive weight noise, adadelta
training recipe, and on-device beam-search decoding — plus the
capabilities the reference lacks: batched padded execution, a test
suite, data/sequence parallelism over a TPU mesh, and Pallas kernels
for the hot paths.

Reference layer map: /root/reference (see SURVEY.md). This package is
NOT a port; recurrence is `lax.scan`, not per-timestep clones
(reference RNN.lua/RNNAttention.lua), and beam state lives on device
(reference round-trips to CPU at Attention.lua:370,406).
"""

__version__ = "0.1.0"
