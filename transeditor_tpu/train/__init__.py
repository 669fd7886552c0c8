from transeditor_tpu.train.losses import (
    d_logistic_loss,
    g_nonsaturating_loss,
)
from transeditor_tpu.train.gan import GANTrainState, make_train_step
