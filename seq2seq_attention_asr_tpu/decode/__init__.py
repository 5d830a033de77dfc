from .beam import BeamResult, beam_search  # noqa: F401
from .greedy import GreedyResult, greedy_decode  # noqa: F401
from .metrics import edit_distance, edit_distance_np, error_rate  # noqa: F401
