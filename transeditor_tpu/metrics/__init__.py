from transeditor_tpu.metrics.fid import frechet_distance, compute_stats
from transeditor_tpu.metrics.prdc import compute_prdc
