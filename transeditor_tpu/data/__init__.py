from transeditor_tpu.data.dataset import (
    ArraySource,
    ImageFolderSource,
    make_train_iterator,
)
