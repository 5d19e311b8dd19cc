from unscene3d_tpu.train.loop import TrainState, Trainer, make_optimizer
