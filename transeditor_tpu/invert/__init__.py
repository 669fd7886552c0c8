from transeditor_tpu.invert.projector import (
    ProjectorConfig,
    estimate_latent_stats,
    project,
)
