from ode_rl_tpu.train.metrics import mse, psnr, ssim, per_frame_metrics
from ode_rl_tpu.train.step import TrainState, create_train_state, make_train_step, make_eval_step
