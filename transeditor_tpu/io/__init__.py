from transeditor_tpu.io.torch_port import (
    discriminator_params_from_torch,
    generator_params_from_torch,
    load_torch_checkpoint,
)
