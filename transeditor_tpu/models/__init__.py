from transeditor_tpu.models.generator import Generator, GeneratorOutput
from transeditor_tpu.models.discriminator import Discriminator
