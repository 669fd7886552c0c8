from transeditor_tpu.edit.boundary import linear_interpolate, train_boundary
